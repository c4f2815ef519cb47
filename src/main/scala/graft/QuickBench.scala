package graft
object QuickBench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("QB_SF", "/root/testdata/sf0.1")
    val spark = GraftSession.local(32, "quick-bench")
    args.foreach { name =>
      val t0 = System.nanoTime()
      SparkEntry.queries(name)(spark, sfDir).write.format("noop").mode("overwrite").save()
      println(f"[qb] $name ${(System.nanoTime()-t0)/1e9}%.2f s")
    }
    spark.stop()
  }
}
