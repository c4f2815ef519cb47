package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

import graft.TestSpark

class SaltedAggSpec extends AnyFunSuite with Matchers {

  private lazy val spark = TestSpark.spark

  test("salted aggregation equals plain aggregation (F3)") {
    import spark.implicits._
    // heavy skew: 90% of rows share one key
    val df = spark.range(0, 100000).map { i =>
      (if (i % 10 == 0) s"k${i % 7}" else "hot", i.toLong)
    }.toDF("k", "v").repartition(8)

    val plain = df.groupBy("k")
      .agg(sum("v").as("total"), count(lit(1)).as("n"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet

    val salted = SaltedAgg(df, Seq(col("k")), numSalts = 8,
      partialAggs = Seq(sum("v").as("p_sum"), count(lit(1)).as("p_n")),
      finalAggs = Seq(sum("p_sum").as("total"), sum("p_n").as("n")))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet

    salted shouldBe plain

    // the salted plan really has the two-phase shape: an intermediate
    // grouping on (key, salt) before the final grouping on key
    val plan = SaltedAgg(df, Seq(col("k")), 8,
      Seq(sum("v").as("p")), Seq(sum("p").as("t")))
      .queryExecution.optimizedPlan.toString
    plan should include("__salt")
  }

  test("sumCount convenience matches direct sums") {
    import spark.implicits._
    val df = Seq(("a", 1.0, 2L), ("a", 3.0, 4L), ("b", 5.0, 6L))
      .toDF("k", "x", "y")
    val out = SaltedAgg.sumCount(df, Seq(col("k")), 4, Seq("x", "y"))
      .collect().map(r => (r.getString(0), r.getDouble(1), r.getLong(2),
        r.getLong(3))).toSet
    out shouldBe Set(("a", 4.0, 6L, 2L), ("b", 5.0, 6L, 1L))
  }
}
