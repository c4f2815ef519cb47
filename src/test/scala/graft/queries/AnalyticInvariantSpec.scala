package graft.queries

import java.sql.Date

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

import graft.SparkEntry
import graft.TestSpark

/** Result invariants for the time-series analytics (q38 gap fill, q39
  * cohort retention) — properties the oracle hash can't state directly.
  */
class AnalyticInvariantSpec extends AnyFunSuite with Matchers {

  private lazy val spark = TestSpark.spark
  private def run(name: String) =
    SparkEntry.queries(name)(spark, TestSpark.sfDir)

  test("q38: spine is gap-free per customer; fill is last-known value") {
    val rows = run("q38_gap_fill").collect()
      .map(r => (r.getLong(0), r.getDate(1), r.getLong(2),
        if (r.isNullAt(3)) null else r.get(3)))
      .groupBy(_._1)
    rows should not be empty
    rows.foreach { case (_, series) =>
      val sorted = series.sortBy(_._2.getTime)
      // consecutive days, no holes in the generated spine
      sorted.sliding(2).foreach {
        case Array((_, d0, _, _), (_, d1, _, _)) =>
          d1.toLocalDate shouldBe d0.toLocalDate.plusDays(1)
        case _ => ()
      }
      // first day of each series is a real order day (spine starts at
      // min(d)), so the forward fill never leaves a leading null
      sorted.head._3 should be > 0L
      sorted.foreach { case (_, _, _, filled) =>
        assert(filled != null, "forward fill left a null")
      }
      // gap days (n_orders = 0) carry the previous day's filled value
      sorted.sliding(2).foreach {
        case Array((_, _, _, prevFill), (_, _, 0L, fill)) =>
          fill shouldBe prevFill
        case _ => ()
      }
    }
  }

  test("q36: both pairing regimes produce identical adjacent pairs") {
    // the size-keyed switch (lag window vs grouped range rank) must be
    // plan-only — same (source, doc_id, prev_id, prev_text) set
    val docs = graft.sources.Tables.load(spark, TestSpark.sfDir, "documents")
      .select(col("source"), col("doc_id"), col("text"))
    def pairs(large: Boolean) =
      Analytic.adjacentPairs(docs, large)
        .select("source", "doc_id", "prev_id", "prev_text")
        .collect()
        .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getString(3)))
        .toSet
    val small = pairs(large = false)
    val big = pairs(large = true)
    small shouldBe big
    small.size should be > 100
  }

  test("q39: offset 0 is the full cohort; retention bounded and exact") {
    val out = run("q39_cohort_retention").collect()
      .map(r => (r.getDate(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getDouble(4)))
    out should not be empty
    out.foreach { case (_, off, nActive, cohortN, retention) =>
      off should be >= 0L
      nActive should be <= cohortN
      retention shouldBe nActive.toDouble / cohortN.toDouble
      // every cohort member's FIRST order lands at offset 0
      if (off == 0L) nActive shouldBe cohortN
    }
    // cohort sizes partition the customer base: Σ cohort_n (offset 0)
    // = distinct ordering customers
    val totalCustomers = graft.sources.Tables
      .load(spark, TestSpark.sfDir, "orders")
      .select(count_distinct(col("o_custkey"))).collect()(0).getLong(0)
    out.filter(_._2 == 0L).map(_._4).sum shouldBe totalCustomers
    // one row per (cohort, offset)
    out.map(t => (t._1: Date, t._2)).distinct.length shouldBe out.length
  }

  test("q39: plan is join + two-phase distinct agg — no window, " +
    "no cartesian") {
    val p = run("q39_cohort_retention")
      .queryExecution.executedPlan.toString
    p should not include "Window"
    p should not include "CartesianProduct"
    p.linesIterator.count(_.contains("HashAggregate")) should be >= 2
  }
}
