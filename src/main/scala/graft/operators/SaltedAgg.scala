package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew-aware two-phase ("salted") aggregation (SURVEY F3).
  *
  * A plain `groupBy(key)` sends every row of a hot key to ONE reducer; at
  * 100 TB a single skewed key (the null user, the default tenant…)
  * stalls the stage. Salting splits each key across `numSalts` reducers:
  *
  *   phase 1: groupBy(key, salt)  → partial aggregates  (parallel S-ways)
  *   phase 2: groupBy(key)        → merge partials      (S rows per key)
  *
  * Works for any algebraic aggregate (sum/count/min/max, avg as
  * sum+count). The salt is `spark_partition_id mod numSalts`, so phase 1
  * never moves a row between executors beyond the normal shuffle, and
  * the assignment is deterministic for a fixed input partitioning.
  *
  * AQE's skew-join handling covers JOIN skew at runtime; this helper is
  * for aggregation skew, which AQE does not re-split.
  */
object SaltedAgg {

  /** @param partialAggs aliased aggregates over the raw rows, e.g.
    *                    `sum("v").as("p_sum")`
    * @param finalAggs   aliased merges over the partial columns, e.g.
    *                    `sum("p_sum").as("total")`
    */
  def apply(
      df: DataFrame,
      keys: Seq[Column],
      numSalts: Int,
      partialAggs: Seq[Column],
      finalAggs: Seq[Column]): DataFrame = {
    require(numSalts >= 1, s"numSalts must be >= 1, got $numSalts")
    val salted = df.withColumn("__salt",
      pmod(spark_partition_id(), lit(numSalts)))
    val phase1 = salted
      .groupBy(keys :+ col("__salt"): _*)
      .agg(partialAggs.head, partialAggs.tail: _*)
    phase1
      .groupBy(keys: _*)
      .agg(finalAggs.head, finalAggs.tail: _*)
  }

  /** Common case: skew-safe sums + count per key. */
  def sumCount(df: DataFrame, keys: Seq[Column], numSalts: Int,
      valueCols: Seq[String]): DataFrame =
    apply(df, keys, numSalts,
      partialAggs = valueCols.map(c => sum(c).as(s"__p_$c")) :+
        count(lit(1)).as("__p_cnt"),
      finalAggs = valueCols.map(c => sum(s"__p_$c").as(s"sum_$c")) :+
        sum("__p_cnt").as("n"))
}
