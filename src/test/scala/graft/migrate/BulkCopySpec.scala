package graft.migrate

import java.nio.file.Files

import org.apache.spark.sql.SaveMode
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

import graft.TestSpark

class BulkCopySpec extends AnyFunSuite with Matchers {

  private lazy val spark = TestSpark.spark

  test("copy with transforms + partitioned path write (M9)") {
    val src = spark.read.parquet(s"${TestSpark.sfDir}/orders.parquet")
    val out = Files.createTempDirectory("graft-copy").resolve("orders_out")
    BulkCopy.copy(
      src,
      BulkCopy.Sink(path = Some(out.toString),
        partitionBy = Seq("o_orderpriority")),
      transforms = Seq(
        "o_year" -> year(col("o_orderdate")),
        "o_totalprice" -> col("o_totalprice").cast("decimal(18,2)")),
      filter = Some(col("o_totalprice") > 0))

    val back = spark.read.parquet(out.toString)
    back.count() shouldBe src.count()
    back.schema.fieldNames should contain("o_year")
    // partition pruning works on the sink layout
    val pruned = back.filter(col("o_orderpriority") === "1-URGENT")
    pruned.count() should be > 0L
    // partition column directories exist on disk
    Files.list(out).iterator().hasNext shouldBe true
  }

  test("bucketed copy: co-located equi-join plans without a shuffle") {
    val orders = spark.read.parquet(s"${TestSpark.sfDir}/orders.parquet")
      .select("o_orderkey", "o_custkey", "o_totalprice")
    val li = spark.read.parquet(s"${TestSpark.sfDir}/lineitem.parquet")
      .select("l_orderkey", "l_quantity")
    spark.sql("DROP TABLE IF EXISTS graft_orders_b")
    spark.sql("DROP TABLE IF EXISTS graft_lineitem_b")
    BulkCopy.copy(orders, BulkCopy.Sink(table = Some("graft_orders_b"),
      bucketBy = Some((4, Seq("o_orderkey"))), sortBy = Seq("o_orderkey")))
    BulkCopy.copy(li, BulkCopy.Sink(table = Some("graft_lineitem_b"),
      bucketBy = Some((4, Seq("l_orderkey"))), sortBy = Seq("l_orderkey")))

    val prevThreshold = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val joined = spark.table("graft_orders_b").join(
        spark.table("graft_lineitem_b"),
        col("o_orderkey") === col("l_orderkey"))
      val plan = joined.queryExecution.executedPlan.toString
      plan should include("SortMergeJoin")
      // bucket co-location: the big-table sides join with NO shuffle
      plan should not include "Exchange hashpartitioning"
      joined.count() shouldBe li.count()
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold",
      prevThreshold)
  }

  test("upsertTable merges on key: updates replace, new keys insert") {
    import spark.implicits._
    spark.sql("DROP TABLE IF EXISTS graft_upsert_t")
    Seq((1L, "a", 10), (2L, "b", 20), (3L, "c", 30))
      .toDF("id", "name", "v").write.saveAsTable("graft_upsert_t")
    val updates = Seq((2L, "b2", 200), (4L, "d", 40)).toDF("id", "name", "v")
    BulkCopy.upsertTable(spark, "graft_upsert_t", updates, Seq("id"))
    val rows = spark.table("graft_upsert_t").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getInt(2))).toSet
    rows shouldBe Set((1L, "a", 10), (2L, "b2", 200), (3L, "c", 30),
      (4L, "d", 40))
  }

  test("incrementalCopy appends only past the high watermark, " +
    "bootstraps an absent target, and pushes the range filter down") {
    import spark.implicits._
    spark.sql("DROP TABLE IF EXISTS graft_incr_t")
    val batch1 = Seq((1L, "a"), (2L, "b"), (3L, "c")).toDF("ts", "v")
    BulkCopy.incrementalCopy(spark, batch1, "graft_incr_t", "ts") shouldBe 3

    // overlapping re-sync: only ts > 3 rows are new
    val batch2 = Seq((2L, "dup"), (3L, "dup"), (4L, "d"), (5L, "e"))
      .toDF("ts", "v")
    BulkCopy.incrementalCopy(spark, batch2, "graft_incr_t", "ts") shouldBe 2
    spark.table("graft_incr_t").count() shouldBe 5
    spark.table("graft_incr_t").filter(col("v") === "dup").count() shouldBe 0

    // idempotent: nothing new → nothing appended
    BulkCopy.incrementalCopy(spark, batch2, "graft_incr_t", "ts") shouldBe 0

    // the delta predicate reaches the source scan when reading files
    val dir = java.nio.file.Files
      .createTempDirectory("graft-incr-src").toString
    batch2.write.mode("overwrite").parquet(dir)
    val src = spark.read.parquet(dir)
    val hwm = spark.table("graft_incr_t").agg(max("ts")).collect()(0).getLong(0)
    val plan = src.filter(col("ts") > hwm)
      .queryExecution.executedPlan.toString
    plan should include("PushedFilters: [IsNotNull(ts), GreaterThan(ts")
  }

  test("copyTable table-to-table with append mode") {
    spark.sql("DROP TABLE IF EXISTS graft_copy_src")
    spark.sql("DROP TABLE IF EXISTS graft_copy_dst")
    spark.sql("CREATE TABLE graft_copy_src (id INT, v STRING) USING PARQUET")
    spark.sql("INSERT INTO graft_copy_src VALUES (1,'x'), (2,'y')")
    BulkCopy.copyTable(spark, "graft_copy_src", "graft_copy_dst",
      transforms = Seq("v" -> upper(col("v"))))
    BulkCopy.copyTable(spark, "graft_copy_src", "graft_copy_dst",
      transforms = Seq("v" -> upper(col("v"))), mode = SaveMode.Append)
    spark.table("graft_copy_dst").count() shouldBe 4
    spark.table("graft_copy_dst").filter(col("v") === "X").count() shouldBe 2
  }
}
