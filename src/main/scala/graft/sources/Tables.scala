package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Registry/loaders for the graft star schema (see TESTDATA.md).
  *
  * At 100 TB the big tables (`lineitem`, `events`, `documents`) arrive as
  * many-file partitioned parquet; `spark.read.parquet` on a directory
  * scales transparently. Dimension tables stay broadcast-size.
  */
object Tables {
  val names: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  /** Dimensions small enough to always broadcast, at any scale factor. */
  val broadcastDims: Set[String] = Set("region", "nation", "supplier")

  def load(spark: SparkSession, dir: String, name: String): DataFrame =
    if (name == "events") {
      // events.ts is parquet TIMESTAMP(NANOS), which Spark's vectorized
      // reader rejects. Read the raw int64 nanos and surface:
      //   ts_ms — epoch millis (matches DuckDB epoch_ms(ts) exactly, so
      //           oracle comparisons never hit the ns-vs-us truncation gap)
      //   ts    — microsecond TimestampType for window()/streaming uses
      spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
      import org.apache.spark.sql.functions._
      spark.read.parquet(s"$dir/events.parquet")
        // integer `div`, NOT `/`: epoch-nanos overflow double's 53-bit
        // mantissa, so floating division is off by ±1ms on some rows
        .withColumn("ts_ms", expr("ts div 1000000"))
        .withColumn("ts", timestamp_millis(col("ts_ms")))
    } else if (name == "embeddings") {
      // parquet declares array elements nullable even when no element is
      // null; re-declare containsNull = false (asserted, once per row)
      // so the native vector kernels emit their branch-free loops — the
      // per-PAIR element null checks they'd otherwise need cost ~1.6×
      // on the n² similarity joins
      import org.apache.spark.sql.functions.col
      spark.read.parquet(s"$dir/$name.parquet")
        .withColumn("embedding", org.apache.spark.sql.GraftBridge.column(
          graft.functions.KnownNonNullElements(
            org.apache.spark.sql.GraftBridge.expression(col("embedding")))))
    } else spark.read.parquet(s"$dir/$name.parquet")

  /** Register every table as a temp view so `spark.sql` works directly. */
  def registerAll(spark: SparkSession, dir: String): Unit =
    names.foreach(n => load(spark, dir, n).createOrReplaceTempView(n))
}
