package graft.queries

import java.nio.file.Files

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

import graft.TestSpark

/** Cluster-balanced curation twins (SURVEY C1–C2L): the ledger arm
  * (stored s8 quantizer) must reproduce the retrain arm row for row
  * when the ledger was bootstrapped on the same corpus — the
  * deterministic-training + fixed-centroid-assignment contract (s8's)
  * that makes reading the stored quantizer a pure perf/semantics win,
  * never a correctness trade.
  */
class CurationSpec extends AnyFunSuite with Matchers {

  private lazy val spark = TestSpark.spark

  /** A copy of the sf0.001 corpus under a fresh path, so its s8
    * ledger (path-keyed) starts absent and bootstraps HERE on the
    * full corpus — the only regime where twin ≡ retrain is defined.
    */
  private lazy val freshDir: String = {
    val dir = Files.createTempDirectory("graft-curation").toString
    Seq("embeddings", "documents").foreach { t =>
      graft.sources.Tables.load(spark, TestSpark.sfDir, t)
        .write.mode("overwrite").parquet(s"$dir/$t.parquet")
    }
    dir
  }

  private def emb: DataFrame =
    graft.sources.Tables.load(spark, freshDir, "embeddings")
      .select(col("vec_id"), col("embedding"))

  private lazy val storedCents: DataFrame = {
    val path = SimilarityOps.s8LedgerPath(freshDir)
    SimilarityOps.refreshIvfLedger(spark, path, emb)
    spark.read.parquet(s"$path/centroids")
  }

  private lazy val trainedCents: DataFrame =
    SimilarityOps.quantizerCentroids(spark, freshDir,
      SimilarityOps.TrainQuantizer)

  test("c1l ledger twin ≡ c1 retrain on a fresh same-corpus ledger") {
    val retrain = CurationOps.mixtureOver(spark, freshDir, trainedCents)
      .collect()
    val ledger = CurationOps.mixtureOver(spark, freshDir, storedCents)
      .collect()
    ledger should contain theSameElementsInOrderAs retrain
    retrain.length should be > 0
  }

  test("c2l ledger twin ≡ c2 retrain on a fresh same-corpus ledger") {
    val retrain = CurationOps.tokenBudgetOver(spark, freshDir,
      trainedCents).collect()
    val ledger = CurationOps.tokenBudgetOver(spark, freshDir,
      storedCents).collect()
    ledger should contain theSameElementsInOrderAs retrain
    retrain.length should be > 0
  }

  test("the stored arm READS the quantizer — its centroid frame scans " +
      "the ledger's centroids dir and runs no Lloyd iteration") {
    storedCents.count() should be > 0L
    val cents = SimilarityOps.quantizerCentroids(spark, freshDir,
      SimilarityOps.StoredQuantizer(SimilarityOps.s8LedgerPath(freshDir)))
    // scan-node inspection, not plan-string matching — the printed
    // Location truncates paths (the PlanSpec convention)
    val roots = cents.queryExecution.executedPlan.collect {
      case f: org.apache.spark.sql.execution.FileSourceScanExec =>
        f.relation.location.rootPaths.map(_.toString)
    }.flatten
    roots.exists(_.contains("/centroids")) shouldBe true
    // a retrained frame ends at a localCheckpoint (ScanExistingRDD),
    // never a parquet read — the two arms are structurally distinct
    cents.queryExecution.executedPlan.toString should include("FileScan")
  }

  test("c3: no near-dup pair straddles a split; the doc-keyed split " +
      "WOULD leak on this corpus; assignment deterministic and total") {
    val out = graft.SparkEntry.queries("c3_leakage_split")(
      spark, TestSpark.sfDir).collect()
    val split = out.map(r => r.getLong(0) -> r.getString(2)).toMap
    val cluster = out.map(r => r.getLong(0) -> r.getLong(1)).toMap
    val pairs = graft.SparkEntry.queries("d2_dedup_ngram_jaccard")(
      spark, TestSpark.sfDir).select("i", "j").collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    pairs should not be empty
    // the leakage-freedom guarantee: near-dups share cluster AND split
    pairs.foreach { case (i, j) =>
      withClue(s"pair ($i,$j): ") {
        cluster(i) shouldBe cluster(j)
        split(i) shouldBe split(j)
      }
    }
    // the motivating defect: t10's DOC-keyed rule splits at least one
    // near-dup family across sides on this corpus (else c3 would be
    // vacuous here)
    def t10Split(id: Long): String = {
      val md = java.security.MessageDigest.getInstance("MD5")
      val b = md.digest(id.toString.getBytes("UTF-8"))
        .map("%02x".format(_)).mkString.take(2)
      if (b < "e6") "train" else if (b < "f3") "val" else "test"
    }
    pairs.exists { case (i, j) => t10Split(i) != t10Split(j) } shouldBe true
    // total + deterministic
    val n = graft.sources.Tables.load(spark, TestSpark.sfDir,
      "documents").count()
    out.length.toLong shouldBe n
    out.map(_.getString(2)).toSet.subsetOf(
      Set("train", "val", "test")) shouldBe true
    graft.SparkEntry.queries("c3_leakage_split")(spark, TestSpark.sfDir)
      .collect().map(_.toSeq).toSeq shouldBe out.map(_.toSeq).toSeq
  }
}
