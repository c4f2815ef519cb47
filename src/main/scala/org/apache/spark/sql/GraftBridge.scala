package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression

/** Column ⇄ Expression bridge for graft's native Catalyst expressions.
  *
  * `classic.ExpressionUtils` is `private[sql]`, so — like other Spark
  * extension libraries — we expose the two conversions from inside the
  * `org.apache.spark.sql` package rather than copying their logic.
  */
object GraftBridge {

  def column(e: Expression): Column = classic.ExpressionUtils.column(e)

  def expression(c: Column): Expression =
    classic.ExpressionUtils.expression(c)

  /** The materialized RDD behind a checkpointed Dataset (`LogicalRDD`
    * leaf) — lets iterative operators explicitly release a superseded
    * round's storage instead of letting every round's blocks pile up
    * until the query ends.
    */
  def materializedRdd(df: Dataset[_]): Option[org.apache.spark.rdd.RDD[_]] =
    df.queryExecution.analyzed match {
      case l: org.apache.spark.sql.execution.LogicalRDD => Some(l.rdd)
      case _ => None
    }

  /** Rebase a frame onto its own execution output as a fresh
    * `LogicalRDD` leaf — fresh attribute ids (iterative self-join
    * safety, the ConnectedComponents rebase) WITHOUT the
    * `createDataFrame(df.rdd, schema)` round-trip, which deserializes
    * every row to an external `Row` and re-encodes it. The internal-row
    * RDD evaluates lazily: on a persisted frame it reads the cached
    * blocks (`InMemoryTableScan`), so rebasing costs no job of its own.
    */
  def rebase(df: Dataset[_]): DataFrame =
    df.sparkSession.asInstanceOf[classic.SparkSession]
      .internalCreateDataFrame(df.queryExecution.toRdd, df.schema)

  /** Append a 1-based contiguous global index over `df`'s CURRENT
    * partition order as a non-null LONG column — `zipWithIndex` on the
    * INTERNAL row stream (r21). The previous `df.rdd.zipWithIndex`
    * route deserialized every row to an external `Row` and re-encoded
    * it through `createDataFrame` — a per-row codec pass paid by every
    * GlobalOrder rank/cumsum (a dozen queries), the same cost the CC
    * round rebase shed in r21's first commit. zipWithIndex still runs
    * its partition-count job; the map stays streaming (no buffering),
    * so the reused UnsafeRow each scan yields is consumed before the
    * next arrives, exactly as RDDScanExec's own projection expects.
    */
  def zipWithGlobalIndex(df: Dataset[_], outCol: String): DataFrame = {
    import org.apache.spark.sql.catalyst.InternalRow
    import org.apache.spark.sql.catalyst.expressions.{GenericInternalRow, JoinedRow}
    val indexed: org.apache.spark.rdd.RDD[InternalRow] =
      df.queryExecution.toRdd.zipWithIndex().mapPartitions { it =>
        val extra = new GenericInternalRow(1)
        val joined = new JoinedRow
        it.map { case (r, i) =>
          extra.update(0, i + 1L)
          joined(r, extra)
        }
      }
    df.sparkSession.asInstanceOf[classic.SparkSession]
      .internalCreateDataFrame(indexed,
        df.schema.add(outCol, org.apache.spark.sql.types.LongType,
          nullable = false))
  }

  /** Wrap an internal-row RDD as a DataFrame (the private
    * `internalCreateDataFrame`, exposed for operators that transform
    * the internal stream directly — GlobalOrder's prefix sum). */
  def internalFrame(spark: SparkSession,
      rdd: org.apache.spark.rdd.RDD[catalyst.InternalRow],
      schema: types.StructType): DataFrame =
    spark.asInstanceOf[classic.SparkSession]
      .internalCreateDataFrame(rdd, schema)

  /** The internal row stream behind a frame (`queryExecution.toRdd`),
    * typed for callers outside the sql package. */
  def internalRdd(df: Dataset[_])
      : org.apache.spark.rdd.RDD[catalyst.InternalRow] =
    df.queryExecution.toRdd

  /** The optimizer's size-in-bytes estimate for a frame — the same
    * statistic the planner itself consults when auto-selecting a
    * broadcast join. Lets operators gate an explicit `broadcast()` hint
    * on "would the planner have broadcast this anyway", instead of
    * forcing a collect of a side whose size they can't know statically.
    */
  def planSizeBytes(df: Dataset[_]): BigInt =
    df.queryExecution.optimizedPlan.stats.sizeInBytes

  /** The session's `spark.sql.autoBroadcastJoinThreshold` in bytes
    * (-1 = auto-broadcast disabled). `sessionState` is `private[sql]`,
    * hence the bridge. */
  def autoBroadcastThreshold(df: Dataset[_]): Long =
    df.sparkSession.sessionState.conf.autoBroadcastJoinThreshold
}
