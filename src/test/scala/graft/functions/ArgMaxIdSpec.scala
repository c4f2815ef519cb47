package graft.functions

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

import graft.TestSpark

/** [[ArgMaxId.argMaxIdByScore]] — the fixed-width HashAggregate
  * replacement for `max_by(id, struct(score, -id))` (SURVEY F20):
  * identical results under the shared (score desc, id asc) rank rule,
  * including ties and nulls, and the plan upgrade that motivates it.
  */
class ArgMaxIdSpec extends AnyFunSuite with Matchers {

  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def agg = ArgMaxId.argMaxIdByScore(col("s"), col("id"))

  test("argmax matches the struct-max_by formulation on random data, " +
      "including planted exact ties") {
    val rng = new scala.util.Random(7)
    // scores drawn from a SMALL discrete set so exact-double ties
    // across different ids occur constantly — the tie-break is the
    // part a wrong buffer order silently breaks
    val rows = (0 until 5000).map { i =>
      (i.toLong % 97, rng.nextInt(11).toDouble / 7.0, i.toLong)
    }
    val df = rows.toDF("g", "s", "id")
    val ours = df.groupBy("g").agg(agg.as("best"))
    val ref = df.groupBy("g")
      .agg(max_by(col("id"),
        struct(col("s"), (-col("id")).as("nc"))).as("best"))
    ours.exceptAll(ref).count() shouldBe 0
    ref.exceptAll(ours).count() shouldBe 0
  }

  test("null scores and null ids are skipped; all-null group is null") {
    val df = spark.createDataFrame(
      spark.sparkContext.parallelize(Seq(
        Row(1L, null, 10L), Row(1L, java.lang.Double.valueOf(0.5), 11L),
        Row(1L, java.lang.Double.valueOf(0.9), null),
        Row(2L, null, 20L), Row(2L, java.lang.Double.valueOf(1.0), null))),
      StructType(Seq(StructField("g", LongType, nullable = false),
        StructField("s", DoubleType, nullable = true),
        StructField("id", LongType, nullable = true))))
    val out = df.groupBy("g").agg(agg.as("best"))
      .collect().map(r => r.getLong(0) -> (if (r.isNullAt(1)) None
        else Some(r.getLong(1)))).toMap
    out(1L) shouldBe Some(11L) // the only (non-null, non-null) row
    out(2L) shouldBe None      // no valid row at all
  }

  test("plans as a HashAggregate pair with a partial stage — never " +
      "SortAggregate (the struct-buffer max_by fallback)") {
    val df = (0 until 100).map(i => (i.toLong % 5, i / 3.0, i.toLong))
      .toDF("g", "s", "id")
    val p = df.groupBy("g").agg(agg.as("best"))
      .queryExecution.executedPlan.toString
    p should include("HashAggregate")
    p should not include "SortAggregate"
    p should not include "ObjectHashAggregate"
    p should include("partial_argmax_id_by_score")
  }

  test("assignNearest keeps its contract under the argmax: one row per " +
      "vec_id, nearest centroid by (sim desc, cid asc), embedding intact") {
    val e = graft.sources.Tables.load(spark, TestSpark.sfDir, "embeddings")
      .select(col("vec_id"), col("embedding")).limit(200)
    val cents = e.filter(col("vec_id") < 8)
      .select(col("vec_id").as("cid"), col("embedding").as("cv"))
    val got = graft.queries.SimilarityOps.assignNearest(e, cents)
    // reference: windowed rank over the same scored cross join
    import org.apache.spark.sql.expressions.Window
    val scored = e.crossJoin(broadcast(cents))
      .withColumn("sim", graft.functions.VectorFunctions.cosine(
        col("embedding"), col("cv")))
    val w = Window.partitionBy("vec_id")
      .orderBy(col("sim").desc, col("cid"))
    val ref = scored.withColumn("r", row_number().over(w))
      .filter(col("r") === 1).select("vec_id", "embedding", "cid")
    got.count() shouldBe e.count()
    got.select("vec_id", "cid").exceptAll(ref.select("vec_id", "cid"))
      .count() shouldBe 0
    // and the slim variant agrees with the full one
    graft.queries.SimilarityOps.assignCids(e, cents)
      .exceptAll(got.select("vec_id", "cid")).count() shouldBe 0
  }

  test("assignNearest's physical plan is hash-aggregated with no sort " +
      "and no window on the corpus side") {
    val e = graft.sources.Tables.load(spark, TestSpark.sfDir, "embeddings")
      .select(col("vec_id"), col("embedding"))
    val cents = e.filter(col("vec_id") < 4)
      .select(col("vec_id").as("cid"), col("embedding").as("cv"))
    val p = graft.queries.SimilarityOps.assignNearest(e, cents)
      .queryExecution.executedPlan.toString
    p should include("HashAggregate")
    p should not include "SortAggregate"
    p should not include "Window"
  }
}
