package graft

import java.nio.file.Files

import org.apache.spark.sql.SparkSession

/** One shared local session for the whole test run (suites reuse it via
  * getOrCreate — starting a SparkContext per suite would dominate test
  * time). Warehouse lives in a temp dir so catalog tests are hermetic.
  */
object TestSpark {
  lazy val spark: SparkSession = {
    val wh = Files.createTempDirectory("graft-warehouse")
    SparkSession.builder()
      .master("local[4]")
      .appName("graft-test")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.warehouse.dir", wh.toString)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
  }

  /** sf0.001 test tables (smallest driver-generated scale factor). */
  val sfDir = "/root/testdata/sf0.001"

  /** A 10× embeddings corpus (n = 20 000) synthesized once per host
    * from sf0.1 via [[ScaleUp.scaleEmbeddings]] — the scale-regime
    * input for the ANN/dedup 10× gates (AnnRecallSpec,
    * DedupConsistencySpec). Only `embeddings.parquet` exists here.
    */
  lazy val sf1EmbeddingsDir: String = {
    val dir = "/tmp/graft_ann_sf1"
    if (!new java.io.File(s"$dir/embeddings.parquet").exists())
      ScaleUp.scaleEmbeddings(
        graft.sources.Tables.load(spark, "/root/testdata/sf0.1",
          "embeddings"), 10)
        .write.mode("overwrite").parquet(s"$dir/embeddings.parquet")
    dir
  }
}
