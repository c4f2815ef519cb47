package graft.functions

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

import graft.TestSpark

/** Misra–Gries heavy-hitter sketch (SURVEY F15). The driver corpus is
  * deliberately uniform (31-word vocabulary, uniform keys — no natural
  * heavy hitter anywhere), so the sketch's claims are proven on a
  * deterministic SYNTHETIC Zipf stream instead of an oracled query:
  * coverage (every item over the n/k threshold survives), the additive
  * error bound, exactness below capacity, partitioning-independence of
  * the GUARANTEES (estimates may differ — the documented MG property),
  * and the SQL registration.
  */
class MisraGriesSpec extends AnyFunSuite with Matchers {

  private lazy val spark = TestSpark.spark

  // deterministic Zipf-ish stream: item i ∈ [0, 40) appears
  // ⌈2000/(i+1)⌉ times → n ≈ 8578; with k = 10 the heavy threshold
  // n/k ≈ 858 is crossed by items 0 (2000), 1 (1000) — and item 2
  // (667) sits just under it, probing the boundary
  private val freqs: Seq[(Long, Long)] =
    (0 until 40).map(i => i.toLong -> math.ceil(2000.0 / (i + 1)).toLong)
  private val n: Long = freqs.map(_._2).sum
  private val k = 10
  // interleave items (worst case for MG's decrement) deterministically
  private val stream: Seq[Long] = {
    val remaining = scala.collection.mutable.Map(freqs: _*)
    val out = scala.collection.mutable.Buffer.empty[Long]
    var alive = freqs.map(_._1)
    while (alive.nonEmpty) {
      alive.foreach { i => out += i; remaining(i) -= 1 }
      alive = alive.filter(remaining(_) > 0)
    }
    out.toSeq
  }

  private def sketch(parts: Int): Map[Long, Long] = {
    import spark.implicits._
    val df = stream.toDF("item").repartition(parts)
    val row = df.agg(MisraGriesTopK.mgTopK(col("item"), k).as("hh"))
      .collect().head
    row.getSeq[org.apache.spark.sql.Row](0)
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
  }

  test("coverage + error bound hold at any parallelism") {
    val exact = freqs.toMap
    val heavy = freqs.filter { case (_, c) => c * k > n }.map(_._1).toSet
    heavy should not be empty
    for (parts <- Seq(1, 3, 8, 32)) {
      val got = sketch(parts)
      withClue(s"parts=$parts: ") {
        got.size should be <= (k - 1)
        // every true heavy hitter survives the sketch + every merge
        heavy.subsetOf(got.keySet) shouldBe true
        // additive error: true − n/k ≤ est ≤ true
        got.foreach { case (i, est) =>
          withClue(s"item $i: ") {
            est should be <= exact(i)
            est should be >= exact(i) - n / k
          }
        }
      }
    }
  }

  test("below capacity the sketch is exact") {
    import spark.implicits._
    val small = Seq.tabulate(30)(i => (i % 5).toLong).toDF("item")
      .repartition(4)
    val got = small.agg(MisraGriesTopK.mgTopK(col("item"), 10).as("hh"))
      .collect().head.getSeq[org.apache.spark.sql.Row](0)
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    got shouldBe (0L until 5L).map(_ -> 6L).toMap
  }

  test("string items + SQL registration + grouped sketches") {
    import spark.implicits._
    graft.GraftExtensions.register(spark)
    val words = Seq.fill(60)("hot") ++ (1 to 50).map(i => s"w$i")
    words.zipWithIndex.map { case (w, i) => (i % 2, w) }
      .toDF("g", "w").createOrReplaceTempView("mg_words")
    val rows = spark.sql(
      "SELECT g, mg_topk(w, 5) AS hh FROM mg_words GROUP BY g ORDER BY g")
      .collect()
    rows.length shouldBe 2
    rows.foreach { r =>
      val items = r.getSeq[org.apache.spark.sql.Row](1).map(_.getString(0))
      // 'hot' is 30 of ~55 per group — far over n/5, must survive
      items should contain("hot")
      items.length should be <= 4
    }
  }

  test("the shuffle payload is O(k), not O(cardinality): partial agg " +
      "planned") {
    import spark.implicits._
    val df = stream.toDF("item").repartition(8)
    val plan = df.agg(MisraGriesTopK.mgTopK(col("item"), k))
      .queryExecution.executedPlan.toString
    // ObjectHashAggregate partial → exchange → final: two agg phases
    plan.linesIterator.count(
      _.contains("ObjectHashAggregate")) should be >= 2
  }
}
