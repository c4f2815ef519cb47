package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.types.LongType

/** Exact global ranking without `Window.orderBy(...)` over no partition
  * — Spark's unpartitioned window moves EVERY row to one executor
  * ("Moving all data to a single partition"), which is a hard wall at
  * scale: a 100 TB rank would need one machine to hold 100 TB.
  *
  * Instead: range-repartition on the sort key (each partition holds a
  * contiguous key range), sort within partitions, then assign the global
  * index with `zipWithIndex` — partition sizes are counted once and each
  * row's rank is its partition's cumulative offset plus its local
  * position. Two jobs over the data; the range-shuffle files are reused
  * by the second job (skipped stage), and no executor ever sees more
  * than one partition's worth.
  *
  * This is one of the rare justified RDD drops: the DataFrame API has no
  * shuffle-free "index within an existing partitioning" (a
  * `Window.partitionBy(spark_partition_id())` would re-shuffle by pid).
  *
  * The sort columns MUST form a total order (include a unique
  * tiebreak). This is a correctness requirement, not just determinism
  * hygiene: [[withGroupedRank]] persists the ranked frame lazily
  * (MEMORY_AND_DISK), so on cache eviction a branch may RECOMPUTE its
  * ranks — under a non-total order `zipWithIndex` could then number
  * tied rows differently between the bounds aggregate and the join
  * branches, producing inconsistent ranks. Every in-repo caller sorts
  * on a unique key (doc_id / (source, doc_id)); a new caller must too.
  */
object GlobalOrder {

  /** Append 1-based global rank by `sortCols` as column `outCol`.
    * The index rides the INTERNAL row stream (r21 —
    * [[org.apache.spark.sql.GraftBridge.zipWithGlobalIndex]]): the old
    * `.rdd.zipWithIndex` + `createDataFrame` route deserialized every
    * ranked row to an external `Row` and re-encoded it, a per-row codec
    * pass paid by every rank/mixture/budget/shard query in the suite.
    */
  def withGlobalRank(df: DataFrame, sortCols: Seq[Column],
      outCol: String = "rank"): DataFrame =
    org.apache.spark.sql.GraftBridge.zipWithGlobalIndex(
      df.repartitionByRange(sortCols: _*)
        .sortWithinPartitions(sortCols: _*), outCol)

  /** Append a per-GROUP 1-based rank by `sortCols` within each distinct
    * value of `groupCols` (as `rankCol`), plus the group's row count
    * (as `countCol`) — the scale-safe replacement for
    * `row_number()/count(*) OVER (PARTITION BY group)` when groups are
    * FEW and HUGE (mixture-sampling sources: ~10 groups over the whole
    * corpus). That window funnels each group's entire row set through
    * ONE reducer; here a huge group instead spans many range
    * partitions: compute the GLOBAL rank over (groupCols, sortCols) via
    * [[withGlobalRank]], then convert to per-group rank with each
    * group's first global rank — rank_in_group = global − first + 1 —
    * where (first, count) is a G-row partial aggregate broadcast back.
    * Exactly the window's semantics, never a per-group reducer wall.
    *
    * Groups must be broadcast-few (the mixture-sampling regime); the
    * sort must be total within a group (unique tiebreak), as with
    * [[withGlobalRank]].
    */
  def withGroupedRank(df: DataFrame, groupCols: Seq[String],
      sortCols: Seq[Column], rankCol: String = "rank",
      countCol: String = "n_in_group"): DataFrame = {
    import org.apache.spark.sql.functions.{broadcast, col, count, lit, min}
    import org.apache.spark.storage.StorageLevel
    // share the ranked frame: it feeds the bounds aggregate AND the
    // main join (and consumers like q36 branch it again) — without
    // sharing each branch re-executes the range shuffle + sort +
    // zipWithIndex pipeline per action. LAZY persist, not
    // localCheckpoint: a checkpoint materializes a job at CONSTRUCTION
    // time and its blocks are unevictable and unreleasable until
    // driver GC (they piled up across Verify's 68 query builds), while
    // cache blocks are LRU-evictable, recompute-safe (the ranked sort
    // is deterministic under the required total order), and freed by
    // catalog.clearCache()/Dataset.unpersist.
    val g = withGlobalRank(df, groupCols.map(col) ++ sortCols, rankCol)
      .persist(StorageLevel.MEMORY_AND_DISK)
    val bounds = g.groupBy(groupCols.map(col): _*)
      .agg(min(col(rankCol)).as("__first"), count(lit(1)).as(countCol))
    g.join(broadcast(bounds), groupCols)
      .withColumn(rankCol, col(rankCol) - col("__first") + lit(1L))
      .drop("__first")
  }

  /** Append the INCLUSIVE running sum of `valueCol` (a long column) in
    * `sortCols` order as `outCol` — the distributed prefix sum. Same
    * two-job shape as [[withGlobalRank]]: per-partition sums are
    * collected (one long per partition), their cumulative offsets are
    * broadcast back, and each partition adds its offset to a local
    * running sum. Equivalent to `SUM(v) OVER (ORDER BY ... ROWS
    * UNBOUNDED PRECEDING)` but with no single-partition window wall.
    */
  def withGlobalCumSum(df: DataFrame, sortCols: Seq[Column],
      valueCol: String, outCol: String = "cumsum"): DataFrame = {
    val spark = df.sparkSession
    val sorted = df.repartitionByRange(sortCols: _*)
      .sortWithinPartitions(sortCols: _*)
    val vIdx = sorted.schema.fieldIndex(valueCol)
    // fail-fast contract (ADVICE r21): the internal-row getLong returns
    // garbage/0 on a mistyped or null cell where the old external-Row
    // path threw — so the type is checked at plan time and nulls per
    // row (one branch per row; the codec pass this path removed cost
    // orders of magnitude more)
    require(sorted.schema(vIdx).dataType == LongType,
      s"withGlobalCumSum: value column '$valueCol' must be LONG, " +
        s"got ${sorted.schema(vIdx).dataType}")
    def checked(r: org.apache.spark.sql.catalyst.InternalRow): Long = {
      require(!r.isNullAt(vIdx),
        s"withGlobalCumSum: null in value column '$valueCol'")
      r.getLong(vIdx)
    }
    // INTERNAL row stream (r21, same rationale as withGlobalRank): the
    // external `.rdd` route decoded and re-encoded every row
    val rdd = org.apache.spark.sql.GraftBridge.internalRdd(sorted)
    // job 1: one long per partition. Runs at the STAGE FLOOR (r22 —
    // the pre-sort shuffle-read rows): sums are order-free and the
    // sort is row-preserving, so the offsets job no longer re-executes
    // the within-partition sort it used to pay a second time; the
    // shuffle files it materializes are reused by job 2 as before.
    val partSums = org.apache.spark.sql.GraftBridge
      .perPartitionLongSums(sorted, vIdx, checked)
    val offsets = partSums.scanLeft(0L)(_ + _) // offsets(pid) = sum before pid
    val bcast = spark.sparkContext.broadcast(offsets)
    // job 2: partition-local running sum + broadcast offset (streaming
    // map — the reused scan row is consumed before the next arrives)
    val summed = rdd.mapPartitionsWithIndex { (pid, it) =>
      var run = bcast.value(pid)
      val extra =
        new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(1)
      val joined = new org.apache.spark.sql.catalyst.expressions.JoinedRow
      it.map { r =>
        run += checked(r)
        extra.update(0, run)
        joined(r, extra)
          : org.apache.spark.sql.catalyst.InternalRow
      }
    }
    org.apache.spark.sql.GraftBridge.internalFrame(spark, summed,
      sorted.schema.add(outCol, LongType, nullable = false))
  }
}
