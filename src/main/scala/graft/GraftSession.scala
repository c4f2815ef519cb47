package graft

import org.apache.spark.sql.SparkSession

/** Session factory carrying the engine's scale configuration profile
  * (SURVEY F4). One place owns the knobs; local test sessions and a real
  * cluster submit differ only in `master` / partition count.
  */
object GraftSession {

  /** The 100 TB profile, applied to any builder:
    *  - AQE on, with coalescing (small shuffle partitions merge at
    *    runtime) and skew-join splitting (a straggler partition is
    *    re-split without a manual salt).
    *  - Broadcast threshold generous (dims through `customer` at test
    *    SF; on a real cluster executors have the memory for 64 MB dims).
    *  - Partition sizing: 128 MB scan splits — the parquet sweet spot.
    */
  def tune(b: SparkSession.Builder, shufflePartitions: Int): SparkSession.Builder =
    b.config("spark.sql.shuffle.partitions", shufflePartitions.toString)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
      .config("spark.sql.adaptive.skewJoin.enabled", "true")
      .config("spark.sql.autoBroadcastJoinThreshold", (64 * 1024 * 1024).toString)
      .config("spark.sql.files.maxPartitionBytes", (128 * 1024 * 1024).toString)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")

  /** Local session with the profile applied (used by Bench/Verify). */
  def local(cores: Int, appName: String = "graft"): SparkSession = {
    val s = tune(SparkSession.builder().master(s"local[$cores]")
      .appName(appName), shufflePartitions = cores)
      .getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s
  }
}
