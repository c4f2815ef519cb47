package graft.queries

import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

import graft.SparkEntry
import graft.TestSpark

/** Quality gate for the approximate similarity operators: recall@k
  * against the exact brute-force baseline (s1) on sf0.001. LSH/IVF trade
  * recall for bounded candidate sets; these bounds catch a silently
  * broken bucketing (recall ≈ random) without demanding exactness.
  */
class AnnRecallSpec extends AnyFunSuite with Matchers {

  private lazy val spark = TestSpark.spark

  private def neighborSets(name: String): Map[Long, Set[Long]] =
    SparkEntry.queries(name)(spark, TestSpark.sfDir)
      .select("qid", "neighbor_id").collect()
      .groupBy(_.getLong(0))
      .view.mapValues(_.map(_.getLong(1)).toSet).toMap

  private def recall(approx: Map[Long, Set[Long]],
      exact: Map[Long, Set[Long]]): Double = {
    val hits = exact.keys.toSeq.map { q =>
      val a = approx.getOrElse(q, Set.empty)
      a.intersect(exact(q)).size.toDouble / exact(q).size
    }
    hits.sum / hits.size
  }

  test("S4 int8 quantization: range bound and reconstruction error bound") {
    val e = graft.sources.Tables.load(spark, TestSpark.sfDir, "embeddings")
      .select("vec_id", "embedding").collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](1)).toMap
    val rows = SparkEntry.queries("s4_quantize_int8")(spark, TestSpark.sfDir)
      .collect()
    rows.length shouldBe e.size * e.head._2.length
    rows.foreach { r =>
      val (id, pos, q, scale) =
        (r.getLong(0), r.getLong(1), r.getInt(2), r.getDouble(3))
      math.abs(q) should be <= 127
      // symmetric round-to-nearest: |x − q·scale| ≤ scale/2
      val x = e(id)(pos.toInt - 1).toDouble
      math.abs(x - q * scale) should be <= scale / 2 + 1e-12
    }
  }

  test("IVF (nprobe=4) recall@10 vs brute force beats its scan fraction") {
    // 50 vectors over 16 cells is far out of the quantizer's regime
    // (cells of ~3); the floor here only guards against a broken
    // bucketing. Measured 0.462 (2026-08, trained quantizer).
    val exact = neighborSets("s1_ann_bruteforce")
    val ivf = neighborSets("s3_ann_ivf")
    val r = recall(ivf, exact)
    info(f"IVF recall@10 at sf0.001 = $r%.3f")
    r should be >= 0.4
  }

  test("IVF recall@10 at sf0.1: trained quantizer meets the measured floor") {
    // Measured 0.513 while scoring ~25% of the corpus per query (the
    // nprobe/cells = 4/16 candidate budget, tap-counted) — the
    // selectivity/recall trade of the trained quantizer. Floor set
    // just under the measurement.
    val dir = "/root/testdata/sf0.1"
    def sets(name: String): Map[Long, Set[Long]] =
      SparkEntry.queries(name)(spark, dir)
        .select("qid", "neighbor_id").collect()
        .groupBy(_.getLong(0))
        .view.mapValues(_.map(_.getLong(1)).toSet).toMap
    val r = recall(sets("s3_ann_ivf"), sets("s1_ann_bruteforce"))
    info(f"IVF recall@10 at sf0.1 = $r%.3f")
    r should be >= 0.45
  }

  test("LSH recall@10 vs brute force beats random") {
    val exact = neighborSets("s1_ann_bruteforce")
    val lsh = neighborSets("s2_ann_lsh")
    // random top-10 of ~50 vectors would land ≈0.2; the bucketed search
    // must do meaningfully better
    recall(lsh, exact) should be >= 0.3
  }
}
