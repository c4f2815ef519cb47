package graft

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

/** A failing query must be LOUD in both driver artifacts: an `.err`
  * file from Verify (not a silently missing parquet) and an `errors`
  * entry from Bench (not a bogus time-to-exception folded into the
  * headline total) — r5 shipped both failure modes for the d9 crash.
  */
class FailureSurfacingSpec extends AnyFunSuite with Matchers {

  private lazy val spark = TestSpark.spark

  private val good: (SparkSession, String) => DataFrame =
    (s, _) => s.range(5).toDF("n")
  private val bad: (SparkSession, String) => DataFrame =
    (_, _) => throw new IllegalStateException("intentional boom")
  // fails only at execution (analysis passes) — the shape of most real
  // operator failures, which Verify only sees when the write runs
  private val badLazy: (SparkSession, String) => DataFrame =
    (s, _) => {
      import org.apache.spark.sql.functions._
      s.range(1).select((element_at(array(lit(1)), 5) + lit(1)).as("n"))
    }

  test("Verify writes an .err artifact for a failing query, parquet for the rest") {
    val out = Files.createTempDirectory("graft_verify_fail").toString
    val res = Verify.runQueries(spark,
      Seq("ok_q" -> good, "boom_q" -> bad, "lazy_boom_q" -> badLazy),
      TestSpark.sfDir, out)
    res("ok_q") shouldBe None
    res("boom_q").get should include("intentional boom")
    res("lazy_boom_q") should not be None
    Files.exists(Paths.get(s"$out/ok_q")) shouldBe true
    Files.readString(Paths.get(s"$out/boom_q.err")) should
      include("intentional boom")
    Files.exists(Paths.get(s"$out/lazy_boom_q.err")) shouldBe true
    // a failing query must leave NO stale result dir for the driver
    Files.exists(Paths.get(s"$out/boom_q")) shouldBe false
    // recovery: a now-passing query clears its previous .err marker
    Verify.runQueries(spark, Seq("boom_q" -> good), TestSpark.sfDir, out)
    Files.exists(Paths.get(s"$out/boom_q.err")) shouldBe false
    Files.exists(Paths.get(s"$out/boom_q")) shouldBe true
  }

  test("Bench reports a failing query as an error, not a fast bogus time") {
    Bench.benchOne(spark, "boom_q", bad, TestSpark.sfDir).left
      .getOrElse("") should include("intentional boom")
    Bench.benchOne(spark, "lazy_boom_q", badLazy, TestSpark.sfDir)
      .isLeft shouldBe true
    val t = Bench.benchOne(spark, "ok_q", good, TestSpark.sfDir)
    t.isRight shouldBe true
    val (minSec, samples) = t.toOption.get
    minSec should be > 0.0
    // r21: every timed sample is surfaced for the BENCH_FULL artifact,
    // and the recorded number is their min (unchanged methodology)
    samples should not be empty
    samples.min shouldBe minSec
    val (times, errors) = Bench.run(spark,
      Seq("ok_q" -> good, "boom_q" -> bad), TestSpark.sfDir)
    times.map(_._1) shouldBe Seq("ok_q")
    errors.map(_._1) shouldBe Seq("boom_q")
  }
}
