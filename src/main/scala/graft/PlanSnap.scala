package graft

/** Writes the FULL `explain("formatted")` output of the named queries
  * to `<outDir>/<query>_<tag>.txt` — the r21 optimization round's
  * before/after plan evidence (plans/r21/). Unlike [[PlanDump]] (stdout,
  * first 40 lines), this captures whole plans so Exchange counts, join
  * strategies, PushedFilters and ReadSchema are all on record.
  *
  * Usage: runMain graft.PlanSnap <outDir> <tag> <query> [query...]
  */
object PlanSnap {
  def main(args: Array[String]): Unit = {
    val outDir = args(0)
    val tag = args(1)
    val names = args.drop(2)
    val spark = GraftSession.local(8, "plan-snap")
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.001")
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(outDir))
    names.foreach { n =>
      val plan = SparkEntry.queries(n)(spark, dir).queryExecution
        .explainString(org.apache.spark.sql.execution.FormattedMode)
      java.nio.file.Files.write(
        java.nio.file.Paths.get(s"$outDir/${n}_$tag.txt"),
        plan.getBytes("UTF-8"))
      println(s"[plansnap] wrote $outDir/${n}_$tag.txt")
    }
    spark.stop()
  }
}
