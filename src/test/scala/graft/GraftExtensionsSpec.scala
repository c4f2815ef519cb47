package graft

import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

class GraftExtensionsSpec extends AnyFunSuite with Matchers {

  private lazy val spark = TestSpark.spark

  test("vec_dot is callable from SQL after registration") {
    GraftExtensions.register(spark)
    val r = spark.sql(
      """SELECT vec_dot(
        |  array(cast(1.0 as float), cast(2.0 as float)),
        |  array(cast(3.0 as float), cast(4.0 as float))) AS d""".stripMargin)
      .collect()(0).getDouble(0)
    r shouldBe 11.0
  }

  test("vec_cosine matches the DataFrame-side cosine bit for bit") {
    GraftExtensions.register(spark)
    val viaSql = spark.sql(
      """SELECT vec_cosine(
        |  array(cast(1.0 as float), cast(2.0 as float), cast(0.5 as float)),
        |  array(cast(3.0 as float), cast(4.0 as float), cast(1.5 as float))) AS c""".stripMargin)
      .collect()(0).getDouble(0)
    import org.apache.spark.sql.functions._
    val viaDf = spark.range(1).select(
      graft.functions.VectorFunctions.cosine(
        array(lit(1.0f), lit(2.0f), lit(0.5f)),
        array(lit(3.0f), lit(4.0f), lit(1.5f))).as("c"))
      .collect()(0).getDouble(0)
    viaSql shouldBe viaDf
    viaSql should be(0.985 +- 0.02)
  }

  test("topk_by_score is callable from SQL after registration") {
    GraftExtensions.register(spark)
    val top = spark.sql(
      """SELECT topk_by_score(score, id, 2) AS t FROM VALUES
        |  (1.0D, 9L), (3.0D, 2L), (2.0D, 5L), (3.0D, 1L) AS v(score, id)
        |""".stripMargin).collect()(0)
      .getSeq[org.apache.spark.sql.Row](0)
    top.map(r => (r.getDouble(0), r.getLong(1))) shouldBe
      Seq((3.0, 1L), (3.0, 2L))
  }

  test("round-6 natives are callable from SQL and match their twins") {
    GraftExtensions.register(spark)
    // one row exercising all four against their built-in/HOF twins
    val r = spark.sql(
      """SELECT
        |  word_gram_hashes('a b c d', 3, true)  AS g,
        |  rolling_hash('abc', 7, 31, 1000000007) AS rh,
        |  hyperplane_signature(array(CAST(1.0 AS FLOAT), CAST(-2.0 AS FLOAT)), 4, 1492) AS hs,
        |  sorted_intersect_count(array(1L, 3L, 9L), array(3L, 4L, 9L)) AS ic
        |""".stripMargin).collect()(0)
    r.getSeq[Long](0).length shouldBe 2 // 4 words -> 2 trigrams
    // (7*31+97 -> *31+98 -> *31+99) % 1000000007
    r.getLong(1) shouldBe ((((7L * 31 + 97) * 31 + 98) * 31 + 99) % 1000000007L)
    r.getLong(2) should (be >= 0L and be <= 15L)
    r.getInt(3) shouldBe 2
  }

  test("extensions class wires the same registry entries at session build") {
    // a child session built with the extensions object applied
    val ext = new org.apache.spark.sql.SparkSessionExtensions
    new GraftExtensions()(ext)
    // the description list is non-empty and names are unique
    GraftExtensions.functions.map(_._1.funcName).distinct.size shouldBe
      GraftExtensions.functions.size
  }
}
