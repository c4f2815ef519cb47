package graft.queries

import java.math.{BigDecimal => JBD, MathContext, RoundingMode}

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

import graft.SparkEntry
import graft.TestSpark

/** Result invariants for the round-11 additions — the moment-sketch
  * statistics (q40), the event-time RANGE frame (q41), deterministic
  * stratified sampling (q42), and TF-IDF keyword extraction (t17):
  * each checked against an independent single-node reference computed
  * here, plus the plan properties that make them scale.
  */
class StatsSamplingSpec extends AnyFunSuite with Matchers {

  private lazy val spark = TestSpark.spark
  private def run(name: String) =
    SparkEntry.queries(name)(spark, TestSpark.sfDir)
  private def plan(name: String): String =
    run(name).queryExecution.executedPlan.toString

  // ------------------------------------------------------------- q40
  test("q40: moments match an exact single-node BigDecimal reference") {
    val rows = graft.sources.Tables.load(spark, TestSpark.sfDir, "lineitem")
      .select("l_returnflag", "l_quantity", "l_extendedprice").collect()
      .map(r => (r.getString(0), r.getDouble(1), r.getDouble(2)))
    def d2(x: Double) = new JBD(x).setScale(2, RoundingMode.HALF_UP)
    val ref = rows.groupBy(_._1).map { case (flag, rs) =>
      val q = rs.map(t => d2(t._2))
      val p = rs.map(t => d2(t._3))
      val n = rs.length.toDouble
      def s(xs: Seq[JBD]) = xs.reduce(_.add(_)).doubleValue()
      def s2(xs: Seq[JBD], ys: Seq[JBD]) =
        xs.zip(ys).map { case (a, b) => a.multiply(b) }
          .reduce(_.add(_)).doubleValue()
      val (sq, sp) = (s(q.toSeq), s(p.toSeq))
      val (sqq, spp, sqp) =
        (s2(q.toSeq, q.toSeq), s2(p.toSeq, p.toSeq), s2(q.toSeq, p.toSeq))
      flag -> (sq / n,
        (sqq - sq * sq / n) / (n - 1),
        (sqp - sq * sp / n) / (n - 1),
        (n * sqp - sq * sp) /
          (math.sqrt(n * sqq - sq * sq) * math.sqrt(n * spp - sp * sp)))
    }
    val out = run("q40_stats_moments").collect()
    out.length shouldBe ref.size
    out.foreach { r =>
      val (m, v, cv, cr) = ref(r.getString(0))
      r.getDouble(2) shouldBe m +- 1e-6
      r.getDouble(3) shouldBe v +- 1e-6
      r.getDouble(4) shouldBe math.sqrt(v) +- 1e-6
      r.getDouble(5) shouldBe cv +- 1e-6
      r.getDouble(6) shouldBe cr +- 1e-6
      r.getDouble(6) should (be >= -1.0 and be <= 1.0)
      r.getDouble(3) should be >= 0.0
    }
  }

  test("q40: one partial-agg shuffle carries 6 numbers per group — " +
      "no window, no second scan") {
    val p = plan("q40_stats_moments")
    p.linesIterator.count(_.contains("HashAggregate")) should be >= 2
    p should include("partial_sum")
    p should not include "Window"
    p.linesIterator.count(_.contains("Scan parquet")) shouldBe 1
  }

  // ------------------------------------------------------------- q41
  test("q41: trailing-7d frame matches a brute-force reference") {
    val events = graft.sources.Tables.load(spark, TestSpark.sfDir, "events")
      .select("event_id", "user_id", "ts_ms", "value").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
    def d6(x: Double) = new JBD(x).setScale(6, RoundingMode.HALF_UP)
    val week = 7L * 24 * 3600 * 1000
    val byUser = events.groupBy(_._2)
    val out = run("q41_range_frame").collect()
    out.length shouldBe events.length
    out.foreach { r =>
      val (id, u, ts) = (r.getLong(0), r.getLong(1), r.getLong(2))
      val frame = byUser(u).filter(e => e._3 >= ts - week && e._3 <= ts)
      r.getLong(3) shouldBe frame.length.toLong
      r.getDouble(4) shouldBe
        frame.map(e => d6(e._4)).reduce(_.add(_)).doubleValue() +- 1e-9
      id should be >= 0L
    }
  }

  test("q41: window partitions on user_id (high-cardinality), never " +
      "a single-partition window") {
    val p = plan("q41_range_frame")
    p should include("Window")
    p should include("hashpartitioning(user_id")
    p should not include "SinglePartition"
  }

  // ------------------------------------------------------------- q42
  test("q42: sample is deterministic, stratified at the configured " +
      "rates, and a subset of the corpus") {
    val docs = graft.sources.Tables.load(spark, TestSpark.sfDir, "documents")
      .select("doc_id", "lang").collect()
      .map(r => (r.getLong(0), r.getString(1)))
    val a = run("q42_stratified_sample").collect()
      .map(r => (r.getLong(0), r.getString(1))).toSeq
    val b = run("q42_stratified_sample").collect()
      .map(r => (r.getLong(0), r.getString(1))).toSeq
    a shouldBe b // pure key-hash projection: bit-identical on re-run
    val ids = docs.map(_._1).toSet
    a.foreach { case (id, _) => ids should contain(id) }
    // per-stratum empirical rate within binomial noise of the target
    val rates = Map("en" -> 0.5, "zh" -> 13.0 / 256)
    val byLang = docs.groupBy(_._2)
    a.groupBy(_._2).foreach { case (lang, hits) =>
      val n = byLang(lang).length.toDouble
      val target = rates.getOrElse(lang, 51.0 / 256)
      val sd = math.sqrt(target * (1 - target) / n)
      (hits.length / n) shouldBe target +- (4 * sd + 1 / n)
    }
  }

  test("q42: pure map-side filter — zero exchanges before the output " +
      "order") {
    // the only allowed exchange is the final presentation orderBy
    val p = plan("q42_stratified_sample")
    p.linesIterator.count(_.contains("Exchange")) should be <= 1
    p should not include "Window"
    p.linesIterator.count(_.contains("Scan parquet")) shouldBe 1
  }

  // ------------------------------------------------------------- t17
  test("t17: top-3 terms match the tf·ln(N/df) definition exactly") {
    val docs = graft.sources.Tables.load(spark, TestSpark.sfDir, "documents")
      .select("doc_id", "text").collect()
      .map(r => (r.getLong(0), r.getString(1)))
    val n = docs.length.toDouble
    val tf = docs.flatMap { case (id, text) =>
      // limit -1: keep trailing empty tokens, matching both engines'
      // split/string_split semantics (Java's default limit 0 drops them)
      text.split(" ", -1).map(w => (id, w))
    }.groupBy(identity).view.mapValues(_.length.toLong).toMap
    val df = tf.keys.groupBy(_._2).view.mapValues(_.size.toLong).toMap
    def score(id: Long, w: String): JBD =
      new JBD(tf((id, w))).multiply(
        new JBD(math.log(n / df(w)), MathContext.DECIMAL128)
          .setScale(9, RoundingMode.HALF_UP))
    val refTop = docs.map { case (id, text) =>
      val terms = text.split(" ", -1).distinct
      id -> terms.map(w => (score(id, w).negate, w)).sorted.take(3)
        .map { case (negS, w) => (w, negS.negate) }.toSeq
    }.toMap
    val out = run("t17_tfidf_keywords").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2), r.getLong(3),
        r.getLong(4), r.getDouble(5)))
    out.groupBy(_._1).foreach { case (id, rs) =>
      val got = rs.sortBy(_._2).map(r => (r._3, r._6)).toSeq
      val want = refTop(id)
      got.map(_._1) shouldBe want.map(_._1)
      got.zip(want).foreach { case ((_, g), (_, w)) =>
        g shouldBe w.doubleValue() +- 1e-9
      }
      rs.foreach { r =>
        r._4 should be >= 1L // tf
        r._5 should be >= 1L // df
      }
    }
  }

  test("t17: candidate generation is equi-joins + a broadcast corpus " +
      "count — no cartesian blowup") {
    val p = plan("t17_tfidf_keywords")
    p should not include "CartesianProduct"
    p.linesIterator.count(_.contains("BroadcastNestedLoopJoin")) should be <= 1
    p should include("hashpartitioning(doc_id") // the top-k window key
  }

  test("t18: zipf/type-token stats match an exact single-node reference") {
    val docs = graft.sources.Tables.load(spark, TestSpark.sfDir, "documents")
      .select("lang", "text").collect()
      .map(r => (r.getString(0), r.getString(1)))
    def q9(x: Double) = new JBD(x).setScale(9, RoundingMode.HALF_UP)
    val ref = docs.groupBy(_._1).map { case (lang, ds) =>
      val freq = ds.flatMap(_._2.split(" ", -1))
        .groupBy(identity).map { case (w, ws) => w -> ws.length.toLong }
      val vocab = freq.size.toLong
      val nTokens = freq.values.sum
      val hapax = freq.values.count(_ == 1L).toLong
      // rank under (count desc, word asc) — the engines' window order
      val ranked = freq.toSeq.sortBy { case (w, c) => (-c, w) }.zipWithIndex
      val xs = ranked.map { case (_, i) => q9(math.log((i + 1).toDouble)) }
      val ys = ranked.map { case ((_, c), _) => q9(math.log(c.toDouble)) }
      def s(z: Seq[JBD]) = z.reduce(_.add(_)).doubleValue()
      def s2(a: Seq[JBD], b: Seq[JBD]) = a.zip(b)
        .map { case (p, q) => p.multiply(q) }.reduce(_.add(_)).doubleValue()
      val (sx, sy, sxy, sxx) = (s(xs), s(ys), s2(xs, ys), s2(xs, xs))
      val n = vocab.toDouble
      lang -> ((nTokens, vocab, hapax, vocab.toDouble / nTokens,
        hapax.toDouble / n, (n * sxy - sx * sy) / (n * sxx - sx * sx)))
    }
    val out = run("t18_corpus_zipf").collect()
    out.length shouldBe ref.size
    out.foreach { r =>
      val (nt, v, h, ttr, hf, slope) = ref(r.getString(0))
      withClue(s"lang ${r.getString(0)}: ") {
        r.getLong(1) shouldBe nt
        r.getLong(2) shouldBe v
        r.getLong(3) shouldBe h
        r.getDouble(4) shouldBe ttr +- 1e-6
        r.getDouble(5) shouldBe hf +- 1e-6
        r.getDouble(6) shouldBe slope +- 1e-6
        // a natural-ish corpus sits on a falling rank-frequency curve
        r.getDouble(6) should be < 0.0
      }
    }
  }

  test("q43: exact quantiles match a single-node sorted reference") {
    val rows = graft.sources.Tables.load(spark, TestSpark.sfDir, "lineitem")
      .select("l_returnflag", "l_extendedprice").collect()
      .map(r => (r.getString(0), r.getDouble(1)))
    val ref = rows.groupBy(_._1).map { case (flag, rs) =>
      val v = rs.map(_._2).sorted
      val n = v.length
      def q(k: Int) = v((((n.toLong * k + 3) / 4) - 1).toInt) // ⌈q·n⌉, 0-based
      flag -> ((n.toLong, q(1), q(2), q(3)))
    }
    val out = run("q43_exact_quantiles").collect()
    out.length shouldBe ref.size
    out.foreach { r =>
      val (n, p25, p50, p75) = ref(r.getString(0))
      withClue(s"flag ${r.getString(0)}: ") {
        r.getLong(1) shouldBe n
        r.getDouble(2) shouldBe p25 // bit-exact: passthrough values
        r.getDouble(3) shouldBe p50
        r.getDouble(4) shouldBe p75
        p25 should be <= p50
        p50 should be <= p75
      }
    }
  }

  test("q43: no per-group window funnel, no whole-group aggregation " +
      "buffer, and the range sort ranks only the sketch-narrowed band") {
    val p = plan("q43_exact_quantiles")
    p should not include "Window"              // no per-group sort window
    // no EXACT percentile (unbounded per-group buffer) anywhere
    p.linesIterator.filterNot(_.contains("percentile_approx"))
      .count(_.contains("percentile")) shouldBe 0
    // the GK sketch is PINNED (r14): evaluated once in a checkpoint
    // job, consumed as an ExistingRDD scan by every downstream use —
    // an unpinned sketch re-evaluates per consumer and GK's
    // fetch-order-dependent merge could hand `below` and the band
    // tagging DIFFERENT [lo,hi] boundaries (a silently wrong result,
    // the r13-advice hazard). So the final plan must NOT contain the
    // sketch agg, and the pinned band columns must flow from an RDD
    // scan instead.
    p should not include "percentile_approx"
    p should include ("Scan ExistingRDD")
    p should include ("t_p25")
    // ...while the sketch itself (bounded-buffer partial agg) is still
    // the narrowing plan that RUNS, in the checkpoint job:
    val bandsPlan = graft.operators.SketchNarrowedQuantiles
      .bandsPlanForTest(
        graft.sources.Tables.load(spark, TestSpark.sfDir, "lineitem")
          .select(org.apache.spark.sql.functions.col("l_returnflag"),
            org.apache.spark.sql.functions.col("l_extendedprice").as("v")),
        "l_returnflag", "v", Seq(("p25", 1), ("p50", 2), ("p75", 3)),
        den = 4)
      .queryExecution.executedPlan.toString
    bandsPlan should include ("percentile_approx")
    bandsPlan should include ("partial_percentile_approx")
    // the bands/below sides broadcast back onto the ranked band slice —
    // the narrowing itself never shuffles the corpus
    p.linesIterator.count(_.contains("BroadcastExchange")) should be >= 2
    // the corpus-sized side reaches GlobalOrder's range sort only AFTER
    // the band-tag explode: the slice subplan (below the RDD boundary
    // the final plan cuts at) filters + explodes in-band tags with the
    // bands broadcast onto the scan — no corpus-wide exchange anywhere
    val slice = graft.operators.SketchNarrowedQuantiles
      .bandSliceForTest(
        graft.sources.Tables.load(spark, TestSpark.sfDir, "lineitem")
          .select(org.apache.spark.sql.functions.col("l_returnflag"),
            org.apache.spark.sql.functions.col("l_extendedprice").as("v")),
        "l_returnflag", "v", Seq(("p25", 1), ("p50", 2), ("p75", 3)),
        den = 4)
      .queryExecution.executedPlan.toString
    slice should include ("Generate explode")  // the band-tag explode
    slice should include ("BroadcastExchange") // bands broadcast to scan
    slice should not include "Exchange rangepartitioning"
    slice should not include "Window"
  }

  test("q43: the band slice entering the exact rank is a vanishing " +
      "fraction of the corpus (the sketch does the narrowing)") {
    val l = graft.sources.Tables.load(spark, TestSpark.sfDir, "lineitem")
      .select(org.apache.spark.sql.functions.col("l_returnflag"),
        org.apache.spark.sql.functions.col("l_extendedprice").as("v"))
    val n = l.count()
    val bandRows = graft.operators.SketchNarrowedQuantiles
      .bandSliceForTest(l, "l_returnflag", "v",
        Seq(("p25", 1), ("p50", 2), ("p75", 3)), den = 4)
      .count()
    // 3 bands × 2·margin/accuracy each = ≤ 0.48% of rows, plus slack
    // for tiny driver corpora where the sketch keeps everything exact
    assert(bandRows <= math.max(60L, (n * 0.02).toLong),
      s"band slice $bandRows of $n rows — the sketch is not narrowing")
  }

  test("t19: source-profile cosines match an exact single-node " +
      "reference; self-similarity structure is sane") {
    val docs = graft.sources.Tables.load(spark, TestSpark.sfDir, "documents")
      .select("source", "text").collect()
      .map(r => (r.getString(0), r.getString(1)))
    val freq = docs.flatMap { case (src, t) =>
      t.split(" ", -1).map(w => (src, w))
    }.groupBy(identity).map { case (k, v) => k -> v.length.toLong }
    val bySrc = freq.groupBy(_._1._1)
      .map { case (s, m) => s -> m.map { case ((_, w), c) => w -> c } }
    def cos(a: Map[String, Long], b: Map[String, Long]): (Long, Double) = {
      val shared = a.keySet & b.keySet
      val dot = shared.toSeq.map(w => a(w) * b(w)).sum
      val na = math.sqrt(a.values.map(c => c * c).sum.toDouble)
      val nb = math.sqrt(b.values.map(c => c * c).sum.toDouble)
      (shared.size.toLong, dot.toDouble / (na * nb))
    }
    val out = run("t19_source_drift").collect()
      .map(r => (r.getString(0), r.getString(1)) ->
        ((r.getLong(2), r.getDouble(3)))).toMap
    val srcs = bySrc.keys.toSeq.sorted
    val pairs = for (a <- srcs; b <- srcs if a < b) yield (a, b)
    out.keySet shouldBe pairs.toSet
    pairs.foreach { case (a, b) =>
      val (sw, c) = cos(bySrc(a), bySrc(b))
      withClue(s"($a,$b): ") {
        out((a, b))._1 shouldBe sw
        out((a, b))._2 shouldBe c +- 1e-6
        out((a, b))._2 should (be >= 0.0 and be <= 1.0)
      }
    }
  }

  test("t18: one corpus scan; windows and regression run on the " +
      "vocabulary-bounded frequency table") {
    val p = plan("t18_corpus_zipf")
    // exactly one documents scan — everything downstream is model-sized
    p.linesIterator.count(_.contains("Scan parquet")) shouldBe 1
    p should not include "CartesianProduct"
  }
}
