package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.queries.{QueryDef, QueryGroup}

/** Driver contract — see /root/repo/SURVEY.md §2 (inventory) + §7 (plan).
  *
  * Every implemented operator is a [[graft.queries.QueryDef]] registered in
  * [[groups]]; `queries`/`oracleSql` are derived views over that registry.
  */
object SparkEntry {

  private def groups: Seq[QueryGroup] = Seq(
    graft.queries.Relational,
    graft.queries.Analytic,
    graft.queries.TextOps,
    graft.queries.DedupOps,
    graft.queries.SimilarityOps,
    graft.queries.CurationOps,
    graft.queries.MultimodalOps,
    graft.queries.PipelineOps)

  def all: Seq[QueryDef] = groups.flatMap(_.queries)

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    all.find(_.name == "q4_star_join").get
      .build(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    all.map(q => q.name -> q.build).toMap

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omitted for non-SQL-expressible ops.
    */
  def oracleSql: Map[String, String] =
    all.flatMap(q => q.oracle.map(q.name -> _)).toMap
}
