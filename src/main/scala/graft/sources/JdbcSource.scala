package graft.sources

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}

/** JDBC source/sink surface (SURVEY IO5) — the reference's DBI
  * connection attrs (database/username/password/host/port, Core.pm:55-99)
  * become a partition-aware Spark JDBC spec.
  *
  * Scale: a single-connection JDBC read is a 1-task bottleneck; always
  * set (partitionColumn, lowerBound, upperBound, numPartitions) for big
  * tables so every executor opens its own range-bounded cursor.
  * `fetchSize` keeps driver memory flat; `pushDownPredicate` stays on so
  * filters become WHERE clauses on the database side.
  */
final case class JdbcSource(
    url: String,
    table: String,
    user: Option[String] = None,
    password: Option[String] = None,
    driver: Option[String] = None,
    partitionColumn: Option[String] = None,
    lowerBound: Option[Long] = None,
    upperBound: Option[Long] = None,
    numPartitions: Option[Int] = None,
    fetchSize: Int = 10000,
    extraOptions: Map[String, String] = Map.empty) {

  /** The exact option map handed to the DataFrameReader/Writer. */
  def options: Map[String, String] = {
    val base = Map(
      "url" -> url,
      "dbtable" -> table,
      "fetchsize" -> fetchSize.toString)
    val auth = user.map("user" -> _).toMap ++
      password.map("password" -> _).toMap ++
      driver.map("driver" -> _).toMap
    val part = (partitionColumn, lowerBound, upperBound, numPartitions) match {
      case (Some(c), Some(lo), Some(hi), Some(n)) => Map(
        "partitionColumn" -> c, "lowerBound" -> lo.toString,
        "upperBound" -> hi.toString, "numPartitions" -> n.toString)
      case (None, None, None, None) => Map.empty[String, String]
      case _ => throw new IllegalArgumentException(
        "partitionColumn, lowerBound, upperBound and numPartitions must be set together")
    }
    base ++ auth ++ part ++ extraOptions
  }

  def load(spark: SparkSession): DataFrame =
    spark.read.format("jdbc").options(options).load()

  def save(df: DataFrame, mode: SaveMode = SaveMode.Append): Unit =
    df.write.format("jdbc").options(options).mode(mode).save()
}

object JdbcSource {

  /** Build from reference-style connection attrs (host/port/database). */
  def forDatabase(scheme: String, host: String, port: Int, database: String,
      table: String, user: Option[String] = None,
      password: Option[String] = None): JdbcSource =
    JdbcSource(s"jdbc:$scheme://$host:$port/$database", table,
      user = user, password = password)
}
