package graft.migrate

import java.nio.file.{Files, Path}
import java.nio.file.attribute.PosixFilePermissions

import scala.collection.mutable.ArrayBuffer

import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

import graft.TestSpark

/** Parity spec for the migration engine, following the reference's own
  * test harness flow (lib/Test/Database/Migrator.pm:103-188): initial
  * create, two ordered migrations, idempotent re-run, an eval'd code
  * migration, and a failing external-program migration that must leave
  * the ledger untouched.
  */
class MigratorSpec extends AnyFunSuite with Matchers {

  private lazy val spark = TestSpark.spark
  private var n = 0

  private def freshCase(): (String, Path, Path) = {
    n += 1
    val db = s"graft_mig_test_$n"
    val tmp = Files.createTempDirectory(s"graft-mig-$n")
    val migrations = Files.createDirectories(tmp.resolve("migrations"))
    val schema = tmp.resolve("schema.sql")
    // mirrors Test::Database::Migrator::_schema_ddl
    Files.writeString(schema,
      """CREATE TABLE applied_migration (migration STRING) USING PARQUET;
        |CREATE TABLE foo (foo_id INT, foo_name STRING) USING PARQUET;
        |""".stripMargin)
    spark.sql(s"DROP DATABASE IF EXISTS $db CASCADE")
    (db, schema, migrations)
  }

  private def mk(db: String, schema: Path, migrations: Path,
      dryRun: Boolean = false, verbose: Boolean = false,
      quiet: Boolean = false,
      sink: String => Unit = _ => ()): Migrator =
    new Migrator(spark, db, migrations, Some(schema),
      dryRun = dryRun, verbose = verbose, quiet = quiet, logSink = sink)

  private def writeFirstTwo(migrations: Path): Unit = {
    // 01-first has two files whose in-dir order matters (the INSERT
    // needs the CREATE), like the reference's two-file first migration
    val m1 = Files.createDirectories(migrations.resolve("01-first"))
    Files.writeString(m1.resolve("01-create-tables.sql"),
      """CREATE TABLE bar (bar_id INT, bar_name STRING) USING PARQUET;
        |CREATE TABLE baz (baz_id INT, baz_name STRING) USING PARQUET;
        |""".stripMargin)
    Files.writeString(m1.resolve("02-fill-bar.sql"),
      "INSERT INTO bar VALUES (1, 'one'), (2, 'two')")
    val m2 = Files.createDirectories(migrations.resolve("02-second"))
    Files.writeString(m2.resolve("01-baz-view.sql"),
      "CREATE VIEW baz_by_name AS SELECT baz_name, baz_id FROM baz")
  }

  private def applied(db: String): Seq[String] =
    spark.table(s"$db.applied_migration")
      .collect().map(_.getString(0)).toSeq.sorted

  test("create, ordered migrations, ledger, idempotent re-run, code step") {
    val (db, schema, migrations) = freshCase()
    mk(db, schema, migrations).databaseExists() shouldBe false

    mk(db, schema, migrations).createOrUpdate()
    mk(db, schema, migrations).databaseExists() shouldBe true
    spark.catalog.tableExists(s"$db.foo") shouldBe true

    writeFirstTwo(migrations)
    mk(db, schema, migrations).createOrUpdate()
    applied(db) shouldBe Seq("01-first", "02-second")
    spark.table(s"$db.bar").count() shouldBe 2
    spark.catalog.tableExists(s"$db.baz_by_name") shouldBe true

    noException should be thrownBy mk(db, schema, migrations).createOrUpdate()
    applied(db) shouldBe Seq("01-first", "02-second")

    // third migration: runtime-compiled Scala step, receives the migrator
    val m3 = Files.createDirectories(migrations.resolve("03-third"))
    Files.writeString(m3.resolve("migrate.step"),
      """(m: graft.migrate.Migrator) => {
        |  m.spark.sql("CREATE TABLE " + m.database +
        |    ".myscalasub (id INT) USING PARQUET")
        |  ()
        |}""".stripMargin)
    mk(db, schema, migrations).createOrUpdate()
    applied(db) shouldBe Seq("01-first", "02-second", "03-third")
    spark.catalog.tableExists(s"$db.myscalasub") shouldBe true

    // fourth: external program that writes to stderr → must fail and
    // NOT be recorded (Core.pm:183-190)
    val m4 = Files.createDirectories(migrations.resolve("04-fourth"))
    val prog = m4.resolve("01-noisy.sh")
    Files.writeString(prog, "#!/bin/sh\necho oops >&2\nexit 0\n")
    Files.setPosixFilePermissions(prog,
      PosixFilePermissions.fromString("rwxr-xr-x"))
    val ex = intercept[RuntimeException] {
      mk(db, schema, migrations).createOrUpdate()
    }
    ex.getMessage should include("failed")
    applied(db) shouldBe Seq("01-first", "02-second", "03-third")

    // nonzero exit also fails, even with silent stderr
    Files.writeString(prog, "#!/bin/sh\nexit 3\n")
    intercept[RuntimeException] {
      mk(db, schema, migrations).createOrUpdate()
    }
    applied(db) shouldBe Seq("01-first", "02-second", "03-third")

    // and once the program behaves, the migration applies
    Files.writeString(prog, "#!/bin/sh\nexit 0\n")
    mk(db, schema, migrations).createOrUpdate()
    applied(db) shouldBe
      Seq("01-first", "02-second", "03-third", "04-fourth")
  }

  test("a failing SQL step aborts the migration and is not recorded") {
    val (db, schema, migrations) = freshCase()
    writeFirstTwo(migrations)
    mk(db, schema, migrations).createOrUpdate()
    val m3 = Files.createDirectories(migrations.resolve("03-broken"))
    Files.writeString(m3.resolve("01-bad.sql"),
      "CREATE TABLE ok_first (id INT) USING PARQUET;\nSELECT FROM nonsense syntax;")
    intercept[Exception] {
      mk(db, schema, migrations).createOrUpdate()
    }
    applied(db) shouldBe Seq("01-first", "02-second")
    // statements before the failure did run (same as feeding the script
    // to a DBMS CLI: no cross-statement transaction on DDL)
    spark.catalog.tableExists(s"$db.ok_first") shouldBe true
  }

  test("dry run executes nothing and records nothing") {
    val (db, schema, migrations) = freshCase()
    writeFirstTwo(migrations)
    val lines = ArrayBuffer.empty[String]
    mk(db, schema, migrations, dryRun = true, verbose = true,
      sink = lines.append(_)).createOrUpdate()
    // nothing created: no database, no ledger, no tables
    spark.catalog.databaseExists(db) shouldBe false
    lines.exists(_.contains("would create database")) shouldBe true
    lines.exists(_.contains("Running migration - 01-first")) shouldBe true

    // dry run against an EXISTING database: pending stays pending
    mk(db, schema, migrations).createOrUpdate()
    val before = applied(db)
    val m3 = Files.createDirectories(migrations.resolve("03-later"))
    Files.writeString(m3.resolve("01-later.sql"),
      "CREATE TABLE later_t (id INT) USING PARQUET")
    mk(db, schema, migrations, dryRun = true).createOrUpdate()
    applied(db) shouldBe before
    spark.catalog.tableExists(s"$db.later_t") shouldBe false
    mk(db, schema, migrations).pendingMigrations()
      .map(_.getFileName.toString) shouldBe Seq("03-later")
  }

  test("bootstrap: missing ledger table means everything is pending") {
    val (db, schema, migrations) = freshCase()
    writeFirstTwo(migrations)
    // schema WITHOUT the ledger table → applied() sees none; migrations
    // still run; ledger insert then fails loudly (no silent success)
    val m = new Migrator(spark, db, migrations, None)
    m.appliedMigrations() shouldBe Seq.empty
    m.pendingMigrations().map(_.getFileName.toString) shouldBe
      Seq("01-first", "02-second")
  }

  test("quiet and verbose are mutually exclusive (Core.pm:134)") {
    val (db, schema, migrations) = freshCase()
    val ex = intercept[IllegalArgumentException] {
      mk(db, schema, migrations, quiet = true, verbose = true)
    }
    ex.getMessage should include("quiet and verbose")
  }

  test("user aliases username (Core.pm:121-131)") {
    val (db, schema, migrations) = freshCase()
    Migrator(spark, db, migrations, user = Some("alice"))
      .username shouldBe Some("alice")
    Migrator(spark, db, migrations, user = Some("alice"),
      username = Some("bob")).username shouldBe Some("bob")
  }

  test("constructor type constraints (Types.pm parity)") {
    val (db, schema, migrations) = freshCase()
    // port range
    intercept[IllegalArgumentException] {
      new Migrator(spark, db, migrations, port = Some(0))
    }.getMessage should include("port")
    intercept[IllegalArgumentException] {
      new Migrator(spark, db, migrations, port = Some(70000))
    }.getMessage should include("port")
    new Migrator(spark, db, migrations, port = Some(5432)) // fine
    // dir/file existence, like Moose's coerced Dir/File attrs failing fast
    intercept[IllegalArgumentException] {
      new Migrator(spark, db, migrations.resolve("no-such-dir"))
    }.getMessage should include("migrations dir")
    intercept[IllegalArgumentException] {
      new Migrator(spark, db, migrations,
        Some(migrations.resolve("no-such-schema.sql")))
    }.getMessage should include("schema file")
    // names must be non-empty
    intercept[IllegalArgumentException] {
      new Migrator(spark, " ", migrations)
    }.getMessage should include("database")
    intercept[IllegalArgumentException] {
      new Migrator(spark, db, migrations, migrationTable = "")
    }.getMessage should include("migration table")
  }

  test(".sql steps run through a native CLI client when sqlCli is set") {
    val (db, _, migrations) = freshCase()
    // pre-create db + ledger so the CLI path is the only .sql executor
    spark.sql(s"CREATE DATABASE $db")
    spark.sql(
      s"CREATE TABLE $db.applied_migration (migration STRING) USING PARQUET")
    val m1 = Files.createDirectories(migrations.resolve("01-cli"))
    Files.writeString(m1.resolve("01-step.sql"),
      "\\copy foo FROM 'stdin' -- client-side directive, not server SQL")
    val out = migrations.resolve("cli-out.txt")
    val cli = migrations.resolve("fakesql.sh")
    Files.writeString(cli, s"#!/bin/sh\ncat \"$$1\" >> '$out'\n")
    cli.toFile.setExecutable(true)

    val m = new Migrator(spark, db, migrations,
      sqlCli = Some(Seq(cli.toString)))
    m.createOrUpdate()
    // the client saw the raw file — including the psql-style directive a
    // server-side SQL runner could never execute — and the ledger updated
    Files.readString(out) should include("\\copy foo")
    m.appliedMigrations() shouldBe Seq("01-cli")
  }

  test("CLI .sql step fails on nonempty stderr, like external programs") {
    val (db, _, migrations) = freshCase()
    spark.sql(s"CREATE DATABASE $db")
    spark.sql(
      s"CREATE TABLE $db.applied_migration (migration STRING) USING PARQUET")
    val m1 = Files.createDirectories(migrations.resolve("01-cli"))
    Files.writeString(m1.resolve("01-step.sql"), "SELECT 1")
    val cli = migrations.resolve("failsql.sh")
    Files.writeString(cli, "#!/bin/sh\necho 'ERROR: relation missing' >&2\n")
    cli.toFile.setExecutable(true)

    val m = new Migrator(spark, db, migrations,
      sqlCli = Some(Seq(cli.toString)))
    val ex = intercept[RuntimeException](m.createOrUpdate())
    ex.getMessage should include("relation missing")
    m.appliedMigrations() shouldBe Seq.empty // failed step is not recorded
  }

  test("numeric-or-alpha ordering (Core.pm:277-284)") {
    val names = Seq("10-b", "2-a", "1-z", "abc", "03-c", "2-b")
    names.sortWith(NumericOrAlpha.lt) shouldBe
      Seq("abc", "1-z", "2-a", "2-b", "03-c", "10-b")
    // all-digit names: the greedy ^(\d+)(.+) backtracks one digit, in
    // Perl and Scala alike → "123" keys as (12, "3")
    NumericOrAlpha.key("123") shouldBe ((12L, "3", "123"))
    // names with no leading digits fall back to (0, "")
    NumericOrAlpha.key("abc") shouldBe ((0L, "", "abc"))
  }

  test("dropDatabase removes the database (M8)") {
    val (db, schema, migrations) = freshCase()
    val m = mk(db, schema, migrations)
    m.createOrUpdate()
    m.databaseExists() shouldBe true
    m.dropDatabase()
    m.databaseExists() shouldBe false
  }
}
