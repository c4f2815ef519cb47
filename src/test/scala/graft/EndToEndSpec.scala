package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

import graft.migrate.Migrator

/** The reference's end-to-end story on Spark: create a warehouse
  * database from schema DDL, apply migrations that MOVE DATA (a bulk
  * copy with transforms via a runtime-compiled Scala step, then derived
  * DDL), re-run idempotently, and query the result — all through the
  * public library surface.
  */
class EndToEndSpec extends AnyFunSuite with Matchers {

  private lazy val spark = TestSpark.spark

  test("migrate a warehouse from raw parquet, then query it") {
    val db = "graft_e2e"
    spark.sql(s"DROP DATABASE IF EXISTS $db CASCADE")
    val tmp = Files.createTempDirectory("graft-e2e")
    val schema = tmp.resolve("schema.sql")
    Files.writeString(schema,
      "CREATE TABLE applied_migration (migration STRING) USING PARQUET")
    val migrations = Files.createDirectories(tmp.resolve("migrations"))

    // 01: bulk-load lineitem from the raw parquet landing zone with a
    // derived revenue column — a data migration, code step
    val m1 = Files.createDirectories(migrations.resolve("01-load-lineitem"))
    Files.writeString(m1.resolve("load.step"),
      s"""(m: graft.migrate.Migrator) => {
         |  import org.apache.spark.sql.functions._
         |  graft.migrate.BulkCopy.copy(
         |    m.spark.read.parquet("${TestSpark.sfDir}/lineitem.parquet"),
         |    graft.migrate.BulkCopy.Sink(
         |      table = Some(m.database + ".lineitem")),
         |    transforms = Seq("revenue" ->
         |      (col("l_extendedprice") * (lit(1) - col("l_discount")))),
         |    select = Seq("l_orderkey", "l_returnflag", "l_quantity",
         |      "revenue"))
         |  ()
         |}""".stripMargin)

    // 02: derived summary view, SQL step (multi-statement)
    val m2 = Files.createDirectories(migrations.resolve("02-summary"))
    Files.writeString(m2.resolve("01-views.sql"),
      s"""CREATE VIEW $db.flag_summary AS
         |  SELECT l_returnflag, SUM(l_quantity) AS qty, COUNT(*) AS n
         |  FROM $db.lineitem GROUP BY l_returnflag;
         |CREATE VIEW $db.big_orders AS
         |  SELECT l_orderkey, SUM(revenue) AS order_revenue
         |  FROM $db.lineitem GROUP BY l_orderkey HAVING SUM(revenue) > 0;
         |""".stripMargin)

    val migrator = Migrator(spark, db, migrations, Some(schema))
    migrator.createOrUpdate()
    migrator.appliedMigrations().sorted shouldBe
      Seq("01-load-lineitem", "02-summary")

    // the migrated warehouse answers queries
    val raw = spark.read.parquet(s"${TestSpark.sfDir}/lineitem.parquet")
    spark.table(s"$db.lineitem").count() shouldBe raw.count()
    val qty = spark.sql(s"SELECT SUM(qty) FROM $db.flag_summary")
      .collect()(0).getDouble(0)
    val expected = raw.agg(sum("l_quantity")).collect()(0).getDouble(0)
    qty shouldBe expected +- 1e-6
    spark.table(s"$db.big_orders").count() should be > 0L

    // idempotent re-run leaves everything intact
    noException should be thrownBy
      Migrator(spark, db, migrations, Some(schema)).createOrUpdate()
    spark.table(s"$db.lineitem").count() shouldBe raw.count()
  }
}
