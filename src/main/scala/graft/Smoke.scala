package graft

import org.apache.spark.sql.SparkSession

/** Mirrors the driver's t1 smoke check: entry() on sf0.001 must return
  * rows. Prints the row count and first rows.
  */
object Smoke {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val df = SparkEntry.entry(spark)
    val n = df.count()
    println(s"[smoke] entry rows=$n")
    df.show(5, truncate = false)
    require(n > 0, "entry() returned no rows")
    spark.stop()
  }
}
