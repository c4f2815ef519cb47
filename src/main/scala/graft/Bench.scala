package graft

/** Driver-run benchmark: every registered query at SPARK_GRAFT_SF_DIR,
  * full materialization via the noop sink (a bare count() would let
  * Catalyst prune the projections being measured), one JSON line out.
  */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4").toInt
    val spark = GraftSession.local(cpus, "graft-bench")
    // warm up scan/codegen/shuffle machinery so the first timed query
    // doesn't absorb one-time session initialization
    graft.sources.Tables.load(spark, sfDir, "lineitem")
      .groupBy("l_returnflag").count().write
      .format("noop").mode("overwrite").save()
    val results = SparkEntry.queries.toSeq.sortBy(_._1).map { case (name, fn) =>
      def once(): Unit =
        fn(spark, sfDir).write.format("noop").mode("overwrite").save()
      // drop cached/checkpointed blocks between runs — queries must not
      // interfere, and a prior run's blocks otherwise pile into the next
      // run's memory budget and show up as GC, not as the query's cost
      def clear(): Unit = {
        spark.catalog.clearCache()
        // localCheckpoint blocks (d6/d7) are not catalog-cached
        spark.sparkContext.getPersistentRDDs.values
          .foreach(_.unpersist(blocking = false))
      }
      // steady-state measurement: one untimed warmup (codegen compile,
      // JIT, page cache), then UNCONDITIONAL min-of-2 timed runs —
      // host stalls (GC pause, CPU steal) poisoned single-run numbers
      // by 5-10× three rounds running; queries over 5 s get a third
      // run so one stall can't poison both samples of the queries that
      // dominate the headline total
      def timed(): Double = {
        clear()
        val t0 = System.nanoTime()
        try once()
        catch { case e: Throwable =>
          System.err.println(s"[bench] $name failed: ${e.getMessage}")
        }
        (System.nanoTime() - t0) / 1e9
      }
      try once() catch { case _: Throwable => () }
      val dt2 = math.min(timed(), timed())
      val dt = if (dt2 > 5.0) math.min(dt2, timed()) else dt2
      clear()
      name -> dt
    }
    val qs = results.map { case (k, v) => "\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    val total = results.map(_._2).sum
    println(s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"sf":"$sfDir"}""")
    spark.stop()
  }
}
