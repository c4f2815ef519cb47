package graft.migrate

import java.nio.file.{Files, Path}
import java.sql.DriverManager

import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

import graft.TestSpark

/** The Migrator driving a REAL external DBMS (embedded Derby) through
  * the JDBC adapter — the reference's own schema DDL
  * (Test/Database/Migrator.pm:103-117: applied_migration + foo), ordered
  * SQL migrations, ledger bootstrap, idempotent re-run.
  */
class JdbcDbmsAdapterSpec extends AnyFunSuite with Matchers {

  private lazy val spark = TestSpark.spark

  private def mkMigrations(): Path = {
    val tmp = Files.createTempDirectory("graft-jdbc-mig")
    val migrations = Files.createDirectories(tmp.resolve("migrations"))
    val m1 = Files.createDirectories(migrations.resolve("01-first"))
    Files.writeString(m1.resolve("01-create-tables.sql"),
      """CREATE TABLE bar (bar_id INTEGER PRIMARY KEY,
        |                  bar_name VARCHAR(50) NOT NULL);
        |CREATE TABLE baz (baz_id INTEGER PRIMARY KEY,
        |                  baz_name VARCHAR(50) NOT NULL);
        |""".stripMargin)
    Files.writeString(m1.resolve("02-create-bar-index.sql"),
      "CREATE INDEX bar_bar_name ON bar (bar_name)")
    val m2 = Files.createDirectories(migrations.resolve("02-second"))
    Files.writeString(m2.resolve("01-fill.sql"),
      "INSERT INTO bar VALUES (1, 'one')")
    migrations
  }

  test("full migrator flow against embedded Derby") {
    val db = "graft_derby_mig"
    val adapter = JdbcDbmsAdapter.derbyInMemory()
    adapter.dropDatabase(db)

    val tmp = Files.createTempDirectory("graft-jdbc")
    val schema = tmp.resolve("schema.sql")
    // the reference's own test schema, verbatim semantics
    Files.writeString(schema,
      """CREATE TABLE applied_migration (
        |    migration  VARCHAR(250)   PRIMARY KEY
        |);
        |CREATE TABLE foo (
        |    foo_id     INTEGER        PRIMARY KEY,
        |    foo_name   VARCHAR(50)    NOT NULL
        |);
        |""".stripMargin)
    val migrations = mkMigrations()

    def mk() = new Migrator(spark, db, migrations, Some(schema),
      adapter = adapter)

    mk().databaseExists() shouldBe false
    mk().createOrUpdate()
    mk().databaseExists() shouldBe true
    mk().appliedMigrations().sorted shouldBe Seq("01-first", "02-second")

    // real DDL landed: index exists, insert queryable over plain JDBC
    val c = DriverManager.getConnection(s"jdbc:derby:memory:$db")
    try {
      val rs = c.createStatement()
        .executeQuery("SELECT bar_name FROM bar WHERE bar_id = 1")
      rs.next() shouldBe true
      rs.getString(1) shouldBe "one"
    } finally c.close()

    // idempotent
    noException should be thrownBy mk().createOrUpdate()
    mk().appliedMigrations().sorted shouldBe Seq("01-first", "02-second")

    adapter.dropDatabase(db)
    mk().databaseExists() shouldBe false
  }

  test("server-style create/drop statements route through the admin DB " +
    "and databaseExists probes the catalog, not connect-success") {
    // "admin DB" stand-in: a Derby memory db holding a dbs catalog table,
    // exactly the shape of pg_database probing on a Postgres maintenance DB
    val adminUrl = "jdbc:derby:memory:graft_admin_cat"
    val c = DriverManager.getConnection(adminUrl + ";create=true")
    try {
      c.createStatement().execute("CREATE TABLE dbs (name VARCHAR(100))")
      c.createStatement().execute("INSERT INTO dbs VALUES ('prod_db')")
    } finally c.close()

    val adapter = new JdbcDbmsAdapter(
      // urlFor would fail for everything — proves no call touches it
      urlFor = db => s"jdbc:derby:memory:no_such_$db",
      adminUrl = Some(adminUrl),
      createStatement = Some(db => s"INSERT INTO dbs VALUES ('$db')"),
      dropStatement = Some(db => s"DELETE FROM dbs WHERE name = '$db'"),
      existsQuery = Some(db => s"SELECT 1 FROM dbs WHERE name = '$db'"))

    adapter.databaseExists("prod_db") shouldBe true
    adapter.databaseExists("absent") shouldBe false
    adapter.createDatabase("fresh_db")
    adapter.databaseExists("fresh_db") shouldBe true
    adapter.dropDatabase("fresh_db")
    adapter.databaseExists("fresh_db") shouldBe false
  }

  test("create/drop statements without an adminUrl are rejected at " +
    "construction") {
    an[IllegalArgumentException] should be thrownBy new JdbcDbmsAdapter(
      urlFor = db => s"jdbc:derby:memory:$db",
      createStatement = Some(db => s"CREATE DATABASE $db"))
  }

  test("bootstrap: adapter reports None for a missing ledger table") {
    val adapter = JdbcDbmsAdapter.derbyInMemory()
    val db = "graft_derby_boot"
    adapter.createDatabase(db)
    adapter.appliedMigrations(db, "applied_migration") shouldBe None
    adapter.runDdl(db,
      "CREATE TABLE applied_migration (migration VARCHAR(250) PRIMARY KEY)")
    adapter.appliedMigrations(db, "applied_migration") shouldBe Some(Seq.empty)
    adapter.recordMigration(db, "applied_migration", "01-x")
    adapter.appliedMigrations(db, "applied_migration") shouldBe
      Some(Seq("01-x"))
    adapter.dropDatabase(db)
  }
}
