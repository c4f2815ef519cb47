package graft

import org.apache.spark.sql.DataFrame

/** Dev benchmark: the media dedup operators' SCALE AXIS (BASELINE §sf1
  * mm rows). mm3/mm4's driver-oracled corpus is a fixed 240-base-asset
  * synthesis, so their per-round bench rows prove sfDir-independence,
  * not scaling; this main times the same pipelines over
  * [[graft.queries.MultimodalOps.scaleAssets]] corpora at the given
  * factors (default `1 10`) — factor-n base assets with the designed
  * recode/perturbation near-dup structure, which grows linearly by
  * construction (melodic audio keeps spurious hash collisions
  * negligible; the steady-tone driver corpus would go quadratic).
  *
  * Prints, per factor: asset count, synthesis+phash+pair time, pair
  * count, cluster (CC) time — the mm3/mm4 ratio evidence. Assets are
  * synthesized on the executors inside the timed region (the synthesis
  * is itself linear map-side work, like a decode pass over a real
  * corpus would be).
  */
object MediaScaleBench {
  def main(args: Array[String]): Unit = {
    val factors =
      if (args.nonEmpty) args.toSeq.map(_.toInt) else Seq(1, 10)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt
    val spark = GraftSession.local(cpus, "graft-media-scale")
    spark.sparkContext.setLogLevel("WARN")

    def sink(df: DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()
    def time(f: => Unit): Double = {
      val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
    }

    factors.foreach { f =>
      val assets = graft.queries.MultimodalOps.scaleAssets(spark, f)
      val n = assets.count()
      def sig = graft.multimodal.BinaryPipeline.phashes(assets).toDF()
      def pairs = graft.operators.HammingNearDup
        .pairs(sig, "assetId", "phash", graft.queries.MultimodalOps.mmMaxHam)
      // warm codegen paths untimed at the smallest factor only
      if (f == factors.head) sink(pairs)
      val nPairs = pairs.count()
      val tPairs = time(sink(pairs))
      val tClusters = time(sink(
        graft.operators.ConnectedComponents.run(
          sig.select(org.apache.spark.sql.functions.col("assetId").as("id")),
          pairs.select(
            org.apache.spark.sql.functions.col("i").as("src"),
            org.apache.spark.sql.functions.col("j").as("dst")))))
      println(f"[mmscale] factor=$f assets=$n pairs=$nPairs " +
        f"mm3_sec=$tPairs%.2f mm4_sec=$tClusters%.2f")
      spark.catalog.clearCache()
      spark.sparkContext.getPersistentRDDs.values
        .foreach(_.unpersist(blocking = false))
    }
    spark.stop()
  }
}
