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

/** Canonical persisted-state path for one operator family over one
  * testdata dir: `/tmp/graft_state/graft_{tag}_{dirname}_{digest}
  * {suffix}` — the digest keys on the dir's ABSOLUTE path so two SF
  * dirs sharing a basename never share ledger state (the d9
  * cross-SF-contamination spec), and `suffix` versions a family's
  * layout (`_p1`/`_p2` — bumping it retires incompatible on-disk
  * state without a migration). One definition (r20 review: nine
  * verbatim copies had accreted across the query families).
  */
object StatePath {
  def apply(dir: String, tag: String, suffix: String = ""): String = {
    val f = new java.io.File(dir)
    val digest = java.security.MessageDigest.getInstance("SHA-256")
      .digest(f.getAbsolutePath.getBytes("UTF-8"))
      .take(16).map("%02x".format(_)).mkString
    s"/tmp/graft_state/graft_${tag}_${f.getName}_$digest$suffix"
  }
}
