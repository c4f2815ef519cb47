package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Reusable time-series operators (the library form of the q27–q29
  * query demos). Both are single-shuffle plans: one hash partition on
  * the key, then window arithmetic — never a pair-wise join, so there is
  * no N×M blowup to contain at any scale.
  */
object TimeOps {

  /** Gap-based session assignment: a new session starts when the gap
    * from the previous event of the same key exceeds `gapMs`. Adds
    * `outCol` = dense per-key session index (starting at 1), ordered by
    * (tsMs, tiebreak...).
    */
  def sessionize(df: DataFrame, key: Column, tsMs: Column, gapMs: Long,
      outCol: String = "session_id", tiebreak: Seq[Column] = Nil): DataFrame = {
    val w = Window.partitionBy(key).orderBy(tsMs +: tiebreak: _*)
    val newSession = when(
      tsMs - lag(tsMs, 1).over(w) > gapMs || lag(tsMs, 1).over(w).isNull, 1L)
      .otherwise(0L)
    df.withColumn(outCol,
      sum(newSession).over(w.rowsBetween(Window.unboundedPreceding, 0)))
  }

  /** As-of join: for every left row, attach the most recent right-side
    * payload at-or-before the left row's time, per key. Implemented as
    * union + running `last(_, ignoreNulls)` window — ONE shuffle on the
    * key over |L|+|R| rows. Right rows at exactly the left timestamp
    * count as "before" (at-or-before semantics).
    *
    * @param payload right-side columns to attach (null when no right row
    *                precedes the left row)
    */
  def asOfJoin(left: DataFrame, right: DataFrame, key: String,
      leftTsMs: String, rightTsMs: String,
      payload: Seq[String]): DataFrame = {
    val leftCols = left.columns.toSeq
    require(!payload.exists(leftCols.contains),
      s"payload columns ${payload.filter(leftCols.contains)} clash with left side")
    val reserved = Seq("__ts", "__src")
    require(!reserved.exists(c => leftCols.contains(c) || payload.contains(c)),
      s"columns $reserved are reserved by asOfJoin; rename them first")

    val l = payload.foldLeft(
      left.withColumn("__ts", col(leftTsMs)).withColumn("__src", lit(1))) {
      (df, c) => df.withColumn(c, lit(null).cast(
        right.schema(c).dataType))
    }
    val r0 = right.select((key +: rightTsMs +: payload).distinct.map(col): _*)
      .withColumn("__ts", col(rightTsMs)).withColumn("__src", lit(0))
    // align column sets (left-only columns become null on the right)
    val r = leftCols.filterNot(r0.columns.contains).foldLeft(r0) {
      (df, c) => df.withColumn(c, lit(null).cast(left.schema(c).dataType))
    }.select(l.columns.toIndexedSeq.map(col): _*)

    // at equal __ts the right row sorts first (__src 0 < 1) ⇒ visible to
    // the left row's running window: at-or-before. Payload columns extend
    // the ordering so right rows tied on (key, ts) resolve to the same
    // winner (greatest payload tuple) on every run — `last` over an
    // order-ambiguous window would otherwise be nondeterministic.
    val w = Window.partitionBy(col(key))
      .orderBy(col("__ts") +: col("__src") +: payload.map(col): _*)
      .rowsBetween(Window.unboundedPreceding, 0)
    val attached = payload.foldLeft(l.unionByName(r)) { (df, c) =>
      df.withColumn(c,
        last(when(col("__src") === 0, col(c)), ignoreNulls = true).over(w))
    }
    attached.filter(col("__src") === 1).drop("__ts", "__src")
  }
}
