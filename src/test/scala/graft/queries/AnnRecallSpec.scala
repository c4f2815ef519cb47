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

  test("IVF (nprobe=2) recall@10 vs brute force is high") {
    val exact = neighborSets("s1_ann_bruteforce")
    val ivf = neighborSets("s3_ann_ivf")
    recall(ivf, exact) should be >= 0.5
  }

  test("LSH recall@10 vs brute force beats random") {
    val exact = neighborSets("s1_ann_bruteforce")
    val lsh = neighborSets("s2_ann_lsh")
    // random top-10 of ~50 vectors would land ≈0.2; the bucketed search
    // must do meaningfully better
    recall(lsh, exact) should be >= 0.3
  }
}
