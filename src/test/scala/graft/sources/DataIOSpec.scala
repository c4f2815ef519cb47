package graft.sources

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

import graft.TestSpark

class DataIOSpec extends AnyFunSuite with Matchers {

  private lazy val spark = TestSpark.spark
  private lazy val nation =
    DataIO.parquet(spark, s"${TestSpark.sfDir}/nation.parquet")

  private def tmp(name: String): String =
    Files.createTempDirectory("graft-io").resolve(name).toString

  test("IO1 parquet roundtrip with partitioned write + pushdown in plan") {
    val out = tmp("nation_parquet")
    DataIO.write(nation, out, partitionBy = Seq("n_regionkey"))
    val back = DataIO.parquet(spark, out)
    back.count() shouldBe nation.count()

    val plan = back.filter(col("n_nationkey") === 3)
      .select("n_name").queryExecution.executedPlan.toString
    plan should include("PushedFilters")
    plan should include("n_nationkey")
    // partition pruning on the sink layout: the filter lands in
    // PartitionFilters, not as a data filter
    val pruned = back.filter(col("n_regionkey") === 0)
    val prunedPlan = pruned.queryExecution.executedPlan.toString
    prunedPlan should include("PartitionFilters")
    pruned.count() should be > 0L
  }

  test("IO2 csv roundtrip with header + explicit schema") {
    val out = tmp("nation_csv")
    DataIO.writeCsv(nation, out)
    val back = DataIO.csv(spark, out, nation.schema)
    back.schema shouldBe nation.schema
    back.count() shouldBe nation.count()
    back.filter(col("n_name") === "NATION_3").count() shouldBe 1
  }

  test("IO3 json-lines roundtrip with explicit schema") {
    val out = tmp("nation_json")
    DataIO.writeJsonLines(nation, out)
    val back = DataIO.jsonLines(spark, out, Some(nation.schema))
    back.count() shouldBe nation.count()
    back.select(sum("n_nationkey")).collect()(0).getLong(0) shouldBe
      nation.select(sum("n_nationkey")).collect()(0).getLong(0)
  }

  test("IO4 orc roundtrip") {
    val out = tmp("nation_orc")
    DataIO.writeOrc(nation, out)
    val back = DataIO.orc(spark, out)
    back.count() shouldBe nation.count()
    back.filter(col("n_nationkey") === 3).select("n_name")
      .queryExecution.executedPlan.toString should include("PushedFilters")
  }

  test("IO6 registry: every table is a queryable temp view") {
    Tables.registerAll(spark, TestSpark.sfDir)
    Tables.names.foreach { t =>
      spark.sql(s"SELECT * FROM $t LIMIT 1").count() shouldBe 1
    }
    spark.sql(
      """SELECT n_name FROM nation JOIN region ON n_regionkey = r_regionkey
        |WHERE r_name = 'ASIA'""".stripMargin).count() should be > 0L
  }
}
