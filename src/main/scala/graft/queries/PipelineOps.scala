package graft.queries

import org.apache.spark.sql.functions._

import graft.sources.Tables

/** The composed training-data pipeline (P1): what a user actually runs
  * before a training job — every stage is one of the already-verified
  * operators, composed as a SINGLE lazy DataFrame plan:
  *
  *   near-dup collapse (d7 keepers) → benchmark holdout + 4-gram
  *   decontamination (t6) → quality filter (t2's keep rule) → exact
  *   per-source mixture sampling (t8)
  *
  * Because the whole pipeline is one plan, Catalyst sees it whole:
  * stage filters combine and push toward the scans, the holdout/quality
  * predicates prune before any join, and the only corpus-wide shuffles
  * are the ones each stage needs anyway (dedup's prefix join, the final
  * per-source range rank — GlobalOrder.withGroupedRank, no per-source
  * window wall). The DuckDB oracle chains the SAME stage CTEs, so the
  * end-to-end composition — not just each stage — is hash-verified.
  */
object PipelineOps extends QueryGroup {

  private val p1 = QueryDef(
    "p1_training_corpus",
    (s, dir) => {
      val d = Tables.load(s, dir, "documents")
      val keep = DedupOps.keeperIds(s, dir)
      // hashed gram keys (no gram strings — TextOps.hashedGrams)
      val grams = TextOps.hashedGrams(d)
      val bench = grams.filter(col("doc_id") % TextOps.benchMod === 0)
        .select("g").distinct()
      val contaminated = grams
        .filter(col("doc_id") % TextOps.benchMod =!= 0)
        .join(broadcast(bench), "g")
        .select("doc_id").distinct()
      val eligible = d
        .filter(col("doc_id") % TextOps.benchMod =!= 0) // eval holdout out
        .filter(TextOps.qualityOk(col("text")))
        .join(keep, "doc_id")
        .join(contaminated, Seq("doc_id"), "left_anti")
        .select("source", "doc_id")
      val srcNum = substring(col("source"), 4, 10).cast("int")
      // same scale-safe per-source rank as t8: GlobalOrder.withGroupedRank,
      // not a per-source window wall (see TextOps t8)
      val ranked = graft.operators.GlobalOrder.withGroupedRank(
        eligible.withColumn("frac",
          when(srcNum % 2 === 0, 0.2).otherwise(0.6)),
        Seq("source"), Seq(col("doc_id")), "rn", "n_src")
      ranked
        .filter(col("rn") <= ceil(col("frac") * col("n_src")))
        .select("source", "doc_id", "rn")
        .orderBy("source", "rn")
    },
    Some(s"""WITH RECURSIVE ${DedupOps.keeperCtes},
       |w4 AS (SELECT doc_id, string_split(text,' ') AS words FROM documents),
       |g4 AS (SELECT doc_id,
       |  unnest(list_distinct([list_aggregate(words[i:i+${TextOps.contamN - 1}],'string_agg',' ')
       |                        for i in range(1, len(words)-${TextOps.contamN - 2})])) AS g
       |  FROM w4),
       |bench AS (SELECT DISTINCT g FROM g4 WHERE doc_id % ${TextOps.benchMod} = 0),
       |contam AS (SELECT DISTINCT g4.doc_id FROM g4 JOIN bench USING(g)
       |           WHERE doc_id % ${TextOps.benchMod} <> 0),
       |eligible AS (
       |  SELECT d.source, d.doc_id FROM documents d
       |  JOIN keepers k ON k.doc_id = d.doc_id
       |  WHERE d.doc_id % ${TextOps.benchMod} <> 0
       |    AND ${TextOps.qualityOkSql("d.text")}
       |    AND d.doc_id NOT IN (SELECT doc_id FROM contam)
       |),
       |sampled AS (
       |  SELECT source, doc_id,
       |    CAST(ROW_NUMBER() OVER (PARTITION BY source ORDER BY doc_id) AS BIGINT) AS rn,
       |    COUNT(*) OVER (PARTITION BY source) AS n_src,
       |    CASE WHEN CAST(substr(source, 4) AS INT) % 2 = 0
       |         THEN 0.2 ELSE 0.6 END AS frac
       |  FROM eligible
       |)
       |SELECT source, doc_id, rn FROM sampled
       |WHERE rn <= CEIL(frac * n_src)
       |ORDER BY source, rn""".stripMargin))

  override val queries: Seq[QueryDef] = Seq(p1)
}
