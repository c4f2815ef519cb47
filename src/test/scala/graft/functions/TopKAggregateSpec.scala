package graft.functions

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

import graft.TestSpark
import TopKAggregate.topKByScore

class TopKAggregateSpec extends AnyFunSuite with Matchers {

  private lazy val spark = TestSpark.spark

  test("aggregate top-k equals the window top-k on real data") {
    val orders = spark.read.parquet(s"${TestSpark.sfDir}/orders.parquet")
      .select(col("o_orderpriority").as("g"),
        col("o_totalprice").as("score"), col("o_orderkey").as("id"))

    val viaAgg = orders.groupBy("g")
      .agg(topKByScore(col("score"), col("id"), 5).as("top"))
      .select(col("g"), posexplode(col("top")))
      .select(col("g"), (col("pos") + 1).cast("long").as("rank"),
        col("col.score").as("score"), col("col.id").as("id"))

    val w = Window.partitionBy("g").orderBy(col("score").desc, col("id"))
    val viaWindow = orders
      .withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= 5)
      .select("g", "rank", "score", "id")

    val a = viaAgg.collect().map(r =>
      (r.getString(0), r.getLong(1), r.getDouble(2), r.getLong(3))).toSet
    val b = viaWindow.collect().map(r =>
      (r.getString(0), r.getLong(1), r.getDouble(2), r.getLong(3))).toSet
    a shouldBe b
    a.size should be > 0
  }

  test("partial aggregation: plan shows two-phase agg, heap caps at k") {
    val df = spark.range(0, 10000).toDF("id")
      .withColumn("g", col("id") % 3)
      .withColumn("score", (col("id") * 37 % 1001).cast("double"))
    val agg = df.groupBy("g").agg(topKByScore(col("score"), col("id"), 4).as("top"))
    agg.queryExecution.executedPlan.toString should include("partial_topk")
    val rows = agg.select(col("g"), col("top")).collect()
    rows.foreach(_.getSeq[Any](1).size shouldBe 4)
  }

  test("wrong input types fail at analysis time, not mid-execution") {
    import spark.implicits._
    graft.GraftExtensions.register(spark)
    val df = Seq((1.0f, 1), (2.0f, 2)).toDF("fscore", "iid")
    df.createOrReplaceTempView("topk_typecheck")
    // float score / int id: must be an AnalysisException (plan time), not
    // a ClassCastException from an executor
    val e = intercept[Exception] {
      spark.sql(
        "SELECT topk_by_score(fscore, CAST(iid AS BIGINT), 2) FROM topk_typecheck")
        .collect()
    }
    e.getClass.getName should include("AnalysisException")
    e.getMessage should include("DOUBLE")
    val e2 = intercept[Exception] {
      spark.sql(
        "SELECT topk_by_score(CAST(fscore AS DOUBLE), iid, 2) FROM topk_typecheck")
        .collect()
    }
    e2.getClass.getName should include("AnalysisException")
  }

  test("string-id arm matches the window top-k (cnt desc, word asc)") {
    val docs = spark.read.parquet(s"${TestSpark.sfDir}/documents.parquet")
      .select(col("lang"), explode(split(col("text"), " ")).as("word"))
      .groupBy("lang", "word").agg(count(lit(1)).as("cnt"))

    val viaAgg = docs.groupBy("lang")
      .agg(topKByScore(col("cnt").cast("double"), col("word"), 5).as("top"))
      .select(col("lang"), posexplode(col("top")))
      .select(col("lang"), (col("pos") + 1).cast("long").as("rank"),
        col("col.id").as("word"), col("col.score").cast("long").as("cnt"))

    val w = Window.partitionBy("lang").orderBy(col("cnt").desc, col("word"))
    val viaWindow = docs
      .withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= 5)
      .select("lang", "rank", "word", "cnt")

    val a = viaAgg.collect().map(r =>
      (r.getString(0), r.getLong(1), r.getString(2), r.getLong(3))).toSet
    val b = viaWindow.collect().map(r =>
      (r.getString(0), r.getLong(1), r.getString(2), r.getLong(3))).toSet
    a shouldBe b
    a.size should be > 0
  }

  test("string ids survive serialize/merge across many partitions") {
    // enough rows + partitions to force partial-buffer serialization and
    // heap merges; every id is a string that would be corrupted if the
    // UnsafeRow-aliased UTF8String weren't copied in update()
    val df = spark.range(0, 20000).toDF("id")
      .repartition(8)
      .withColumn("g", col("id") % 4)
      .withColumn("word", concat(lit("w"), format_string("%05d", col("id") % 777)))
      .withColumn("score", (col("id") % 101).cast("double"))
    val top = df.groupBy("g")
      .agg(topKByScore(col("score"), col("word"), 3).as("t"))
      .select(col("g"), col("t")("id").as("words"), col("t")("score").as("scores"))
      .collect()
    top.length shouldBe 4
    top.foreach { r =>
      val words = r.getSeq[String](1)
      words.length shouldBe 3
      all(words) should fullyMatch regex "w\\d{5}"
      val scores = r.getSeq[Double](2)
      scores shouldBe scores.sorted.reverse // rank order: score desc
    }
  }

  test("ties break toward the smaller id") {
    import spark.implicits._
    val df = Seq((1.0, 9L), (1.0, 2L), (1.0, 5L), (0.5, 1L))
      .toDF("score", "id")
    val top = df.agg(topKByScore(col("score"), col("id"), 2).as("t"))
      .select(col("t")("id")).collect()(0).getSeq[Long](0)
    top shouldBe Seq(2L, 5L)
  }
}
