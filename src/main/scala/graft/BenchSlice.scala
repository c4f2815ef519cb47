package graft

/** Dev tool: run a subset of queries with EXACTLY Bench.main's
  * measurement procedure (untimed warmup, cache/checkpoint clearing
  * before the timed run) — for chasing flaky per-query times without a
  * full bench pass. Args: query names; prints one line per timed run.
  */
object BenchSlice {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt
    val spark = GraftSession.local(cpus, "graft-bench-slice")
    graft.sources.Tables.load(spark, sfDir, "lineitem")
      .groupBy("l_returnflag").count().write
      .format("noop").mode("overwrite").save()
    args.foreach { name =>
      def once(): Unit = SparkEntry.queries(name)(spark, sfDir)
        .write.format("noop").mode("overwrite").save()
      def clear(): Unit = {
        operators.ScratchCache.releaseAll()
        spark.catalog.clearCache()
        spark.sparkContext.getPersistentRDDs.values
          .foreach(_.unpersist(blocking = false))
      }
      try once() catch { case _: Throwable => () }
      clear()
      // min of N isolated timed runs (Bench's procedure): the host
      // shows intermittent multi-second stalls (BASELINE §noise) that
      // poison any single measurement
      val reps = math.max(1,
        sys.env.get("SPARK_GRAFT_SLICE_REPS")
          .flatMap(v => scala.util.Try(v.toInt).toOption).getOrElse(2))
      val best = (1 to reps).map { _ =>
        val t0 = System.nanoTime()
        once()
        val sec = (System.nanoTime() - t0) / 1e9
        clear()
        sec
      }.min
      println(f"[slice] $name $best%.2f s")
    }
    spark.stop()
  }
}
