package graft.migrate

import org.apache.spark.sql.SparkSession

/** DBMS adapter contract, mirroring the reference's required role methods
  * (Core.pm:27-45: `_create_database` / `_drop_database` / `_driver_name`
  * / `_run_ddl` / `_database_exists`). The Spark-native implementation
  * targets the session catalog + warehouse.
  */
trait DbmsAdapter {
  def driverName: String
  def createDatabase(db: String): Unit
  def dropDatabase(db: String): Unit
  def databaseExists(db: String): Boolean

  /** Run a (possibly multi-statement) DDL/DML script. */
  def runDdl(db: String, script: String): Unit

  /** Ledger contents, or None when the ledger table doesn't exist yet
    * (bootstrap: everything is pending — Core.pm:215-227).
    */
  def appliedMigrations(db: String, table: String): Option[Seq[String]]

  /** Core.pm:203 — insert into the single-text-column ledger table. */
  def recordMigration(db: String, table: String, name: String): Unit
}

/** Adapter over the Spark catalog: databases are warehouse namespaces,
  * DDL runs through `spark.sql` one statement at a time (statement
  * splitting via [[SqlScript]]), with the target database as the current
  * namespace — the analogue of the reference's per-database DBI handle.
  */
final class SparkCatalogAdapter(spark: SparkSession) extends DbmsAdapter {

  override def driverName: String = "spark"

  private def q(db: String): String = s"`${db.replace("`", "``")}`"

  override def createDatabase(db: String): Unit =
    spark.sql(s"CREATE DATABASE ${q(db)}")

  override def dropDatabase(db: String): Unit =
    spark.sql(s"DROP DATABASE IF EXISTS ${q(db)} CASCADE")

  override def databaseExists(db: String): Boolean =
    spark.catalog.databaseExists(db)

  override def runDdl(db: String, script: String): Unit = {
    val prev = spark.catalog.currentDatabase
    spark.sql(s"USE ${q(db)}")
    try SqlScript.split(script).foreach(spark.sql(_))
    finally spark.sql(s"USE ${q(prev)}")
  }

  override def appliedMigrations(db: String, table: String): Option[Seq[String]] =
    if (!spark.catalog.tableExists(s"$db.$table")) None
    else Some(spark.table(s"$db.$table")
      .select("migration").collect().map(_.getString(0)).toSeq)

  override def recordMigration(db: String, table: String, name: String): Unit = {
    val lit = name.replace("'", "''")
    spark.sql(s"INSERT INTO ${q(db)}.`$table` VALUES ('$lit')")
  }
}
