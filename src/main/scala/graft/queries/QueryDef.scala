package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}

/** One verifiable operator: a DataFrame plan plus (optionally) the
  * equivalent ANSI SQL the driver runs in DuckDB over the same parquet
  * tables. Column names/aliases MUST match between the two sides; every
  * query ends in a total order so row order is engine-independent.
  */
final case class QueryDef(
    name: String,
    build: (SparkSession, String) => DataFrame,
    oracle: Option[String])

trait QueryGroup {
  def queries: Seq[QueryDef]
}
