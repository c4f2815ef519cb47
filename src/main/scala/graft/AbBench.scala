package graft

/** Dev A/B harness (r21): times each query under two arms INTERLEAVED
  * in one JVM — arm A and arm B alternate rep by rep, so host-window
  * drift (BASELINE §noise: same-code spreads of 1.5-2× across minutes)
  * hits both arms equally instead of poisoning a sequential compare.
  * Arms are system-property toggles read at query-CONSTRUCTION time
  * (e.g. graft.widen). Prints min-of-reps per arm per query.
  *
  * Usage: runMain graft.AbBench <prop> <valA> <valB> <query> [query...]
  */
object AbBench {
  def main(args: Array[String]): Unit = {
    val Array(prop, valA, valB) = args.take(3)
    val names = args.drop(3)
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt
    val reps = sys.env.getOrElse("SPARK_GRAFT_AB_REPS", "3").toInt
    val spark = GraftSession.local(cpus, "graft-ab-bench")
    graft.sources.Tables.load(spark, sfDir, "lineitem")
      .groupBy("l_returnflag").count().write
      .format("noop").mode("overwrite").save()
    def clear(): Unit = {
      operators.ScratchCache.releaseAll()
      spark.catalog.clearCache()
      spark.sparkContext.getPersistentRDDs.values
        .foreach(_.unpersist(blocking = false))
    }
    names.foreach { name =>
      def once(v: String): Double = {
        // "spark.*" props toggle the RUNTIME session conf; anything
        // else is a JVM system property read at query construction
        if (prop.startsWith("spark.")) spark.conf.set(prop, v)
        else sys.props(prop) = v
        try {
          val t0 = System.nanoTime()
          SparkEntry.queries(name)(spark, sfDir)
            .write.format("noop").mode("overwrite").save()
          (System.nanoTime() - t0) / 1e9
        } finally {
          if (!prop.startsWith("spark.")) sys.props.remove(prop)
          clear()
        }
      }
      once(valA); once(valB) // warm both arms (codegen differs per arm)
      val samples = (1 to reps).flatMap { _ =>
        Seq(valA -> once(valA), valB -> once(valB))
      }
      val a = samples.collect { case (`valA`, t) => t }
      val b = samples.collect { case (`valB`, t) => t }
      println(f"[ab] $name $prop=$valA min=${a.min}%.2f med=${a.sorted.apply(a.size / 2)}%.2f | " +
        f"$prop=$valB min=${b.min}%.2f med=${b.sorted.apply(b.size / 2)}%.2f")
    }
    spark.stop()
  }
}
