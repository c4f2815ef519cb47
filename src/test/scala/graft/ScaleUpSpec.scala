package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

/** ScaleUp's linear-growth contract for factors BEYOND the embedding
  * dimension: every replica transform must stay orthogonal (within-
  * replica pair structure preserved exactly) while no two replicas of
  * the same base vector may coincide (a coincidence would grow dedup
  * pair counts quadratically in the factor — the very artifact ScaleUp
  * exists to avoid).
  */
class ScaleUpSpec extends AnyFunSuite with Matchers {

  private lazy val spark = TestSpark.spark

  private val dim = 8
  private val factor = 20 // spans sign levels 0, 1, 2 at dim 8

  private def base = {
    import spark.implicits._
    // deterministic, irregular values; no symmetry a rotation could map
    (0L until 4L).map { id =>
      (id, Array.tabulate(dim)(i =>
        (math.sin(id * 37.0 + i * 13.0) * 10).toFloat))
    }.toDF("vec_id", "embedding")
  }

  private def scaled =
    ScaleUp.scaleEmbeddings(base, factor).collect()
      .map(r => r.getLong(0) ->
        r.getSeq[Float](1).toArray)

  test("every replica of a vector is distinct — no rotation reuse " +
    "past factor = dim") {
    val byBase = scaled.groupBy(_._1 % 1000000000L)
    byBase.values.foreach { replicas =>
      replicas.length shouldBe factor
      replicas.map(_._2.toSeq).distinct.length shouldBe factor
    }
  }

  test("replica transforms are orthogonal: dot products inside a " +
    "replica match the base") {
    def dot(a: Array[Float], b: Array[Float]): Double =
      a.zip(b).foldLeft(0.0) { case (acc, (x, y)) =>
        acc + x.toDouble * y.toDouble
      }
    val vecs = scaled.toMap
    val ids = base.collect().map(_.getLong(0))
    for (r <- 0L until factor.toLong; a <- ids; b <- ids if a < b) {
      val off = r * 1000000000L
      // rotation permutes the additive fold (ulp-level associativity
      // drift allowed); the products themselves are exact
      dot(vecs(a + off), vecs(b + off)) shouldBe
        (dot(vecs(a), vecs(b)) +- 1e-9)
      ()
    }
    // a pure sign-flip replica (rot 0, level 1) is BIT-exact: negation
    // flips a sign bit, products are unchanged doubles in unchanged order
    for (a <- ids; b <- ids if a < b) {
      val off = dim.toLong * 1000000000L
      dot(vecs(a + off), vecs(b + off)) shouldBe dot(vecs(a), vecs(b))
      ()
    }
  }

  test("factors up to dim keep the historical pure-rotation output") {
    val small = ScaleUp.scaleEmbeddings(base, dim).collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](1).toArray).toMap
    val orig = base.collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](1).toArray).toMap
    for (r <- 1 until dim; id <- orig.keys) {
      val expect = orig(id).drop(r) ++ orig(id).take(r)
      small(id + r * 1000000000L).toSeq shouldBe expect.toSeq
      ()
    }
  }
}
