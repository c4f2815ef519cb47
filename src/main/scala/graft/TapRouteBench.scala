package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.queries.{DedupOps, SimilarityOps}
import graft.sources.Tables

/** Dev benchmark (r19): the same-window evidence pair for the r18
  * scored-tap rework of the kNN-graph build (SURVEY S9). r17's oracle
  * tap was a SIDE EFFECT — write the candidate ids, then let the
  * returned plan be consumed again — so the n^1.75 candidate join ran
  * TWICE per build. r18 ROUTES the build through the tap: the tap
  * write is the single execution of the join+cosine codegen stage and
  * the top-k heap reads 24 B/row back. This bench reconstructs the
  * r17 arm faithfully (side-effect ids tap + second consumption) and
  * times both arms for s9 (the raw build) and d15 (the SemDeDup
  * keep-rule whose pin consumed the build a second time), with s11 as
  * the untouched same-window control, one BenchSlice-procedure window
  * (untimed warmup, cache/scratch clears, min-of-2).
  *
  * Run: `SPARK_GRAFT_SF_DIR=/tmp/graft_sf10 SPARK_DRIVER_MEM=96g
  * SPARK_GRAFT_INITIAL_PARTS=256 sbt "runMain graft.TapRouteBench"`;
  * rows recorded in BASELINE §sf10 r19.
  */
object TapRouteBench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/tmp/graft_sf1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt
    val spark = GraftSession.local(cpus, "graft-tap-route-bench")
    spark.sparkContext.setLogLevel("WARN")

    // the r17 side-effect arm, reconstructed: ids written as a side
    // effect, the ORIGINAL scored plan consumed again by the heap
    def knnEdgesR17(tap: String): DataFrame = {
      val scored = SimilarityOps.knnGraphScored(spark, sfDir)
      graft.sources.VerifyTap(
        scored.select(col("qid"), col("vec_id")), tap, coalesce = false)
      SimilarityOps.topKAgg(scored, SimilarityOps.KG, ordered = false)
    }
    // d15's r17 shape: the keep-rule pin (ScratchCache) consumes the
    // side-effect arm's build a second time. CC machinery identical to
    // the shipped semanticKeepOver — only the edge SOURCE differs.
    def d15R17(): DataFrame = {
      val cosT = 0.4
      val edges = graft.operators.ScratchCache.scratch(
        knnEdgesR17("taproute_d15_cand")
          .filter(col("cosine") >= cosT)
          .select(col("qid").as("src"), col("neighbor_id").as("dst")))
      val touched = graft.operators.ScratchCache.scratch(
        edges.select(col("src").as("id"))
          .unionByName(edges.select(col("dst").as("id"))).distinct())
      val nodes = Tables.load(spark, sfDir, "embeddings")
        .select(col("vec_id").as("id"))
      val clustered = graft.operators.ConnectedComponents
        .run(touched, edges)
        .filter(col("id") === col("component"))
        .select(col("id").as("vec_id"))
      val singletons = nodes.join(touched, Seq("id"), "left_anti")
        .select(col("id").as("vec_id"))
      clustered.unionByName(singletons).orderBy("vec_id")
    }

    // arms FORCED through forceTapRoute so the pair stays meaningful
    // under the size-keyed default this bench decided (tapRouteMaxN)
    val arms: Seq[(String, () => DataFrame)] = Seq(
      "s11_control" ->
        (() => SparkEntry.queries("s11_knn_descent")(spark, sfDir)),
      "s9_tap_route" ->
        (() => SimilarityOps.knnGraphEdges(spark, sfDir,
          Some("taproute_s9r_cand"), forceTapRoute = Some(true))
          .orderBy("qid", "rank")),
      "s9_r17_side_effect" ->
        (() => knnEdgesR17("taproute_s9_cand").orderBy("qid", "rank")),
      "d15_tap_route" ->
        (() => SparkEntry.queries("d15_semantic_keep")(spark, sfDir)),
      "d15_r17_side_effect" -> (() => d15R17()))

    // BenchSlice's procedure: shared warmup, then per arm an untimed
    // run + clears + min-of-2 timed runs
    Tables.load(spark, sfDir, "lineitem")
      .groupBy("l_returnflag").count().write
      .format("noop").mode("overwrite").save()
    def clear(): Unit = {
      graft.operators.ScratchCache.releaseAll()
      spark.catalog.clearCache()
      spark.sparkContext.getPersistentRDDs.values
        .foreach(_.unpersist(blocking = false))
    }
    arms.foreach { case (label, run) =>
      def once(): Unit =
        run().write.format("noop").mode("overwrite").save()
      try once() catch { case e: Throwable =>
        println(s"[taproute] $label warmup FAILED: ${e.getMessage}") }
      clear()
      val best = (1 to 2).map { _ =>
        val t0 = System.nanoTime()
        once()
        val sec = (System.nanoTime() - t0) / 1e9
        clear()
        sec
      }.min
      println(f"[taproute] $label $best%.2f s sf=$sfDir")
    }
    spark.stop()
  }
}
