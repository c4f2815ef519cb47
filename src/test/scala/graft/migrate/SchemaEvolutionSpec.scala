package graft.migrate

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, StringType}
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

import graft.TestSpark

class SchemaEvolutionSpec extends AnyFunSuite with Matchers {

  private lazy val spark = TestSpark.spark
  private var n = 0

  private def freshTable(): String = {
    n += 1
    val t = s"graft_evolve_$n"
    spark.sql(s"DROP TABLE IF EXISTS $t")
    spark.sql(s"CREATE TABLE $t (id INT, name STRING) USING PARQUET")
    spark.sql(s"INSERT INTO $t VALUES (1,'a'), (2,'b'), (3,'c')")
    t
  }

  test("addColumn is metadata-only and reads back as nulls") {
    val t = freshTable()
    SchemaEvolution.addColumn(spark, t, "score", "DOUBLE")
    val df = spark.table(t)
    df.schema.fieldNames should contain("score")
    df.filter(col("score").isNull).count() shouldBe 3
  }

  test("addColumnBackfill derives values for existing rows") {
    val t = freshTable()
    SchemaEvolution.addColumnBackfill(spark, t, "id2", col("id") * 10)
    spark.table(t).select(sum("id2")).collect()(0).getLong(0) shouldBe 60
  }

  test("dropColumn") {
    val t = freshTable()
    SchemaEvolution.dropColumn(spark, t, "name")
    spark.table(t).schema.fieldNames.toSeq shouldBe Seq("id")
    spark.table(t).count() shouldBe 3
  }

  test("renameColumn") {
    val t = freshTable()
    SchemaEvolution.renameColumn(spark, t, "name", "label")
    spark.table(t).schema.fieldNames.toSeq shouldBe Seq("id", "label")
    spark.table(t).filter(col("label") === "b").count() shouldBe 1
  }

  test("castColumn widens int to bigint") {
    val t = freshTable()
    SchemaEvolution.castColumn(spark, t, "id", "BIGINT")
    spark.table(t).schema("id").dataType shouldBe LongType
    spark.table(t).count() shouldBe 3
  }

  test("rewrite preserves a partitioned table's layout") {
    n += 1
    val t = s"graft_evolve_part_$n"
    spark.sql(s"DROP TABLE IF EXISTS $t")
    spark.sql(
      s"CREATE TABLE $t (id INT, name STRING) USING PARQUET PARTITIONED BY (region STRING)")
    spark.sql(s"INSERT INTO $t VALUES (1,'a','eu'), (2,'b','us'), (3,'c','eu')")
    SchemaEvolution.addColumnBackfill(spark, t, "id2", col("id") * 2)
    // partition column survives as a partition column
    spark.catalog.listColumns(t).collect()
      .filter(_.isPartition).map(_.name).toSeq shouldBe Seq("region")
    spark.table(t).filter(col("region") === "eu").count() shouldBe 2
    // dropping the partition column degrades gracefully to unpartitioned
    SchemaEvolution.dropColumn(spark, t, "region")
    spark.catalog.listColumns(t).collect()
      .filter(_.isPartition) shouldBe empty
    spark.table(t).count() shouldBe 3
  }

  test("rewrite preserves a bucketed table's bucket spec") {
    import spark.implicits._
    spark.sql("DROP TABLE IF EXISTS graft_evolve_bucketed")
    Seq((1L, "a"), (2L, "b"), (3L, "c")).toDF("id", "v")
      .write.bucketBy(4, "id").sortBy("id")
      .saveAsTable("graft_evolve_bucketed")
    SchemaEvolution.castColumn(spark, "graft_evolve_bucketed", "v", "STRING")
    SchemaEvolution.bucketSpec(spark, "graft_evolve_bucketed") shouldBe
      Some((4, Seq("id"), Seq("id")))
    spark.table("graft_evolve_bucketed").count() shouldBe 3
  }

  test("rewrite's swap leaves no staging or backup table behind") {
    val t = freshTable()
    SchemaEvolution.castColumn(spark, t, "id", "BIGINT")
    spark.catalog.tableExists(s"${t}__evolve_staging") shouldBe false
    spark.catalog.tableExists(s"${t}__evolve_backup") shouldBe false
    spark.table(t).count() shouldBe 3
  }

  test("backfill overwrites with an expression") {
    val t = freshTable()
    SchemaEvolution.backfill(spark, t, "name", upper(col("name")))
    spark.table(t).schema("name").dataType shouldBe StringType
    spark.table(t).select(collect_set("name")).collect()(0)
      .getSeq[String](0).sorted shouldBe Seq("A", "B", "C")
  }
}
