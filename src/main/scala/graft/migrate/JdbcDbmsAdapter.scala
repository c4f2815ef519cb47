package graft.migrate

import java.sql.{Connection, DriverManager}

/** [[DbmsAdapter]] over plain JDBC — the analogue of the reference's
  * DBMS-specific implementation classes (Core.pm documents the contract;
  * Database::Migrator::Pg / ::mysql provide it). Lets the same
  * [[Migrator]] drive an external relational database: migrations' DDL
  * runs on the DBMS while bulk data steps run on Spark (via
  * [[graft.sources.JdbcSource]]).
  *
  * `urlFor(db)` builds the per-database JDBC URL; `createSuffix` /
  * `dropSuffix` adapt to engines (like embedded Derby) that
  * create/remove databases via connection attributes rather than
  * CREATE/DROP DATABASE statements.
  *
  * Server DBMSes (Postgres/MySQL style) can't run CREATE/DROP DATABASE
  * over a connection to the database being created (it doesn't exist
  * yet) or dropped (can't drop the database you're connected to) —
  * those engines must supply `adminUrl`, a maintenance-database URL
  * (e.g. `.../postgres`) that create/drop statements and `existsQuery`
  * catalog probes run over. Connect-success probing of `urlFor(db)` is
  * only the fallback for embedded engines with no catalog database.
  */
final class JdbcDbmsAdapter(
    urlFor: String => String,
    user: Option[String] = None,
    password: Option[String] = None,
    override val driverName: String = "jdbc",
    createSuffix: String = "",
    dropSuffix: String = "",
    adminUrl: Option[String] = None,
    createStatement: Option[String => String] = None,
    dropStatement: Option[String => String] = None,
    existsQuery: Option[String => String] = None) extends DbmsAdapter {

  require(createStatement.isEmpty && dropStatement.isEmpty
    || adminUrl.nonEmpty,
    "createStatement/dropStatement run CREATE/DROP DATABASE and need an " +
      "adminUrl (maintenance DB) — they cannot run on the target database")

  private def connect(url: String): Connection =
    DriverManager.getConnection(url, user.orNull, password.orNull)

  private def admin: String =
    adminUrl.getOrElse(throw new IllegalStateException("adminUrl not set"))

  override def createDatabase(db: String): Unit =
    createStatement match {
      case Some(stmt) => // server DBMS: CREATE DATABASE over the admin conn
        withConn(admin) { c => c.createStatement().execute(stmt(db)) }
      case None => // embedded style: creation happens via URL attributes
        connect(urlFor(db) + createSuffix).close()
    }

  override def dropDatabase(db: String): Unit =
    dropStatement match {
      case Some(stmt) =>
        withConn(admin) { c => c.createStatement().execute(stmt(db)) }
      case None =>
        try connect(urlFor(db) + dropSuffix).close()
        catch {
          // Derby signals a successful in-memory drop with SQLState 08006;
          // XJ004 = database absent — dropping nothing is a no-op
          case e: java.sql.SQLException
            if e.getSQLState == "08006" || e.getSQLState == "XJ004" => ()
        }
    }

  override def databaseExists(db: String): Boolean =
    existsQuery match {
      case Some(q) => // catalog probe on the admin DB — no connect-failure abuse
        withConn(admin) { c =>
          val rs = c.createStatement().executeQuery(q(db))
          try rs.next() finally rs.close()
        }
      case None =>
        try { connect(urlFor(db)).close(); true }
        catch { case _: java.sql.SQLException => false }
    }

  override def runDdl(db: String, script: String): Unit =
    withConn(urlFor(db)) { c =>
      val st = c.createStatement()
      try SqlScript.split(script).foreach(st.execute)
      finally st.close()
    }

  override def appliedMigrations(db: String, table: String): Option[Seq[String]] =
    withConn(urlFor(db)) { c =>
      try {
        val rs = c.createStatement()
          .executeQuery(s"SELECT migration FROM $table")
        val out = scala.collection.mutable.ArrayBuffer.empty[String]
        while (rs.next()) out += rs.getString(1)
        Some(out.toSeq)
      } catch {
        case _: java.sql.SQLException => None // ledger table absent
      }
    }

  override def recordMigration(db: String, table: String, name: String): Unit =
    withConn(urlFor(db)) { c =>
      val ps = c.prepareStatement(s"INSERT INTO $table (migration) VALUES (?)")
      try { ps.setString(1, name); ps.executeUpdate() } finally ps.close()
    }

  private def withConn[T](url: String)(f: Connection => T): T = {
    val c = connect(url)
    try f(c) finally c.close()
  }
}

object JdbcDbmsAdapter {

  /** Embedded Derby (in-memory): databases appear on `;create=true` and
    * vanish on `;drop=true` — used by the specs; also the shape for any
    * attribute-managed embedded engine.
    */
  def derbyInMemory(): JdbcDbmsAdapter =
    new JdbcDbmsAdapter(
      urlFor = db => s"jdbc:derby:memory:$db",
      driverName = "derby",
      createSuffix = ";create=true",
      dropSuffix = ";drop=true")

  /** Postgres-shaped server adapter: DDL-on-admin-DB + pg_database
    * catalog probe (cf. reference Database::Migrator::Pg, which shells
    * out to createdb/dropdb against the cluster, not the target DB).
    * Untested here (no server in this environment); the admin-routing
    * contract it exercises is covered by the Derby-backed specs.
    */
  def postgresShaped(host: String, port: Int, user: String,
      password: String): JdbcDbmsAdapter =
    new JdbcDbmsAdapter(
      urlFor = db => s"jdbc:postgresql://$host:$port/$db",
      user = Some(user),
      password = Some(password),
      driverName = "postgresql",
      adminUrl = Some(s"jdbc:postgresql://$host:$port/postgres"),
      createStatement = Some(db => s"""CREATE DATABASE "$db""""),
      dropStatement = Some(db => s"""DROP DATABASE IF EXISTS "$db""""),
      existsQuery =
        Some(db => s"SELECT 1 FROM pg_database WHERE datname = '$db'"))
}
