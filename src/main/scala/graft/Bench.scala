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
      // JIT, page cache), then a timed run; queries over 1 s get a
      // second timed run and report the min — a single host stall (GC
      // pause, CPU steal) poisoned a multi-second query's number by
      // 5-10× twice, while sub-second queries are stable and re-timing
      // all of them would double the bench's wall time
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
      val dt1 = timed()
      val dt = if (dt1 > 1.0) math.min(dt1, timed()) else dt1
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
