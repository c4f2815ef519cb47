package graft.migrate

import java.nio.file.{Files, Path}

import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

import graft.TestSpark

/** Getopt-parity spec: a full create + migrate driven purely through
  * dashed argv, like the reference tool built on MooseX::Getopt::Dashes
  * (Core.pm:15-20), plus the `--user` alias and option-error contract.
  */
class MigratorCliSpec extends AnyFunSuite with Matchers {

  private lazy val spark = TestSpark.spark
  private var n = 0

  private def freshCase(): (String, Path, Path) = {
    n += 1
    val db = s"graft_cli_test_$n"
    val tmp = Files.createTempDirectory(s"graft-cli-$n")
    val migrations = Files.createDirectories(tmp.resolve("migrations"))
    val schema = tmp.resolve("schema.sql")
    Files.writeString(schema,
      """CREATE TABLE applied_migration (migration STRING) USING PARQUET;
        |CREATE TABLE foo (foo_id INT, foo_name STRING) USING PARQUET;
        |""".stripMargin)
    spark.sql(s"DROP DATABASE IF EXISTS $db CASCADE")
    (db, schema, migrations)
  }

  test("argv drives a full create + ordered migrations + ledger") {
    val (db, schema, migrations) = freshCase()
    val m1 = Files.createDirectories(migrations.resolve("01-first"))
    Files.writeString(m1.resolve("01-create.sql"),
      "CREATE TABLE bar (bar_id INT) USING PARQUET")
    Files.writeString(m1.resolve("02-fill.sql"),
      "INSERT INTO bar VALUES (1), (2), (3)")

    // mixed --opt value / --opt=value spellings, like getopt
    MigratorCli.build(spark, Seq(
      "--database", db,
      s"--migrations-dir=$migrations",
      "--schema-file", schema.toString,
      "--quiet")).createOrUpdate()

    spark.catalog.tableExists(s"$db.foo") shouldBe true
    spark.table(s"$db.bar").count() shouldBe 3
    spark.table(s"$db.applied_migration")
      .collect().map(_.getString(0)).toSeq shouldBe Seq("01-first")

    // re-run through argv is a no-op (ledger consulted)
    noException should be thrownBy MigratorCli.build(spark, Seq(
      "--database", db, s"--migrations-dir=$migrations",
      "--schema-file", schema.toString, "--quiet")).createOrUpdate()
  }

  test("--dry-run plans without executing; flags and aliases map through") {
    val (db, schema, migrations) = freshCase()
    val logs = scala.collection.mutable.ArrayBuffer.empty[String]
    val m = MigratorCli.build(spark, Seq(
      "--database", db, "--migrations-dir", migrations.toString,
      "--schema-file", schema.toString,
      "--user", "alice", "--port", "5432",
      "--migration-table", "my_ledger",
      "--dry-run", "--verbose"), logSink = logs.append(_))
    m.username shouldBe Some("alice") // --user → username (BUILDARGS alias)
    m.migrationTable shouldBe "my_ledger"
    m.dryRun shouldBe true
    m.createOrUpdate()
    spark.catalog.databaseExists(db) shouldBe false // nothing executed
    logs.exists(_.contains("Dry run")) shouldBe true
  }

  test("option errors fail fast with usage, like getopt") {
    val (db, schema, migrations) = freshCase()
    an[IllegalArgumentException] should be thrownBy
      MigratorCli.parse(Seq("--no-such-flag"))
    an[IllegalArgumentException] should be thrownBy
      MigratorCli.parse(Seq("--database")) // missing value
    an[IllegalArgumentException] should be thrownBy
      MigratorCli.parse(Seq("stray"))
    an[IllegalArgumentException] should be thrownBy
      MigratorCli.build(spark, Seq(s"--migrations-dir=$migrations")) // no db
    // constructor validation still applies through the CLI path
    an[IllegalArgumentException] should be thrownBy
      MigratorCli.build(spark, Seq("--database", db,
        s"--migrations-dir=$migrations", "--quiet", "--verbose"))
  }
}
