package graft

import org.apache.spark.sql.functions._

import graft.queries.DedupOps
import graft.sources.Tables

/** Dev benchmark: evidence that d9's ingest cost is O(batch), not
  * O(corpus). The SAME fixed batch (sf0.1's `src0` slice) is deduped
  * against a prior-corpus ledger derived from sf0.1 (1×) and from the
  * ScaleUp-synthesized sf1 (10× corpus): O(batch) ingest keeps the
  * cost ~flat while the standing corpus behind the ledger grows 10×.
  * (The anti-join still SCANS the ledger — hashes, not documents, so
  * 32 bytes/doc at any scale, broadcast when it fits — but with the
  * append-only maintenance nothing corpus-sized is ever rewritten.)
  *
  * Run after `graft.ScaleUp /root/testdata/sf0.1 /tmp/graft_sf1 10`:
  *   sbt "runMain graft.LedgerScaleBench"
  * Prints `[ledger] label seconds`; recorded in BASELINE.md §sf1.
  */
object LedgerScaleBench {
  def main(args: Array[String]): Unit = {
    val small = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    if (args.headOption.contains("compact")) { compactScenario(small); return }
    val big = args.headOption.getOrElse("/tmp/graft_sf1")
    val spark = GraftSession.local(32, "graft-ledger-scale")

    def ledgerOf(dir: String): String = {
      val prior = Tables.load(spark, dir, "documents")
        .filter(col("source") =!= "src0")
        .select(md5(col("text")).as("content_hash")).distinct()
      val path = DedupOps.d9LedgerPath(dir)
      DedupOps.refreshLedger(spark, path, prior)
      path
    }
    val batch = Tables.load(spark, small, "documents")
      .filter(col("source") === "src0")

    def timeDedup(path: String, label: String): Unit = {
      spark.catalog.clearCache()
      val t0 = System.nanoTime()
      DedupOps.incrementalDedup(batch, spark.read.parquet(path))
        .write.format("noop").mode("overwrite").save()
      println(f"[ledger] $label ${(System.nanoTime() - t0) / 1e9}%.2f s")
    }

    // bootstrap both ledgers untimed; the timed region is the INGEST
    // dedup plan a daily run executes (ledger anti-join + batch agg).
    // Each ledger gets its OWN untimed warmup so the 10x number is not
    // penalized by cold page-cache/footer reads the 1x number skipped
    // — the asymmetry would land exactly on the comparison at stake.
    val p1x = ledgerOf(small)
    val p10x = ledgerOf(big)
    timeDedup(p1x, "warmup_1x")
    timeDedup(p1x, "batch_vs_1x_corpus_ledger")
    timeDedup(p10x, "warmup_10x")
    timeDedup(p10x, "batch_vs_10x_corpus_ledger")

    // the same question for d13's NEAR-dup ingest: a fixed batch probed
    // against the band-index ledger of a 1× and a 10× standing corpus.
    // The probe is a band-key equi-join (batch side broadcastable), so
    // the index scan grows with the corpus but the join work is
    // O(batch candidates) — the number at stake is how flat that holds.
    def ndLedgerOf(dir: String): String = {
      val prior = Tables.load(spark, dir, "documents")
        .filter(col("source") =!= "src0").select("doc_id", "text")
      val path = DedupOps.d13LedgerPath(dir)
      DedupOps.refreshNearDupLedger(spark, path, prior)
      path
    }
    val batchIdx = DedupOps.minhashIndex(
      batch.select("doc_id", "text")).localCheckpoint()
    def timeNearDup(path: String, label: String): Unit = {
      spark.catalog.clearCache()
      val t0 = System.nanoTime()
      DedupOps.nearDupProbe(batchIdx, spark.read.parquet(path))
        .write.format("noop").mode("overwrite").save()
      println(f"[ledger] $label ${(System.nanoTime() - t0) / 1e9}%.2f s")
    }
    val n1x = ndLedgerOf(small)
    val n10x = ndLedgerOf(big)
    timeNearDup(n1x, "neardup_warmup_1x")
    timeNearDup(n1x, "neardup_batch_vs_1x_corpus_index")
    timeNearDup(n10x, "neardup_warmup_10x")
    timeNearDup(n10x, "neardup_batch_vs_10x_corpus_index")
    spark.stop()
  }

  /** The small-file tax of a long append chain, and what compaction
    * buys back: the SAME ledger content behind 100 daily-append
    * fragments vs bin-packed (`DedupOps.compactLedger`), timed on the
    * exact daily ingest plan (d9's ledger anti-join). Run:
    * `sbt "runMain graft.LedgerScaleBench compact"`; recorded in
    * BASELINE §sf1 (d9 ledger growth).
    */
  private def compactScenario(sfDir: String): Unit = {
    val spark = GraftSession.local(32, "graft-ledger-compact")
    val appends = 100
    val root = java.nio.file.Files
      .createTempDirectory("graft_ledger_compact").toString
    val path = s"$root/ledger_p1"
    val hashes = Tables.load(spark, sfDir, "documents")
      .filter(col("source") =!= "src0")
      .select(md5(col("text")).as("content_hash")).distinct()
      .withColumn("b", pmod(xxhash64(col("content_hash")), lit(appends)))
      .localCheckpoint()
    (0 until appends).foreach { i =>
      DedupOps.refreshLedger(spark, path,
        hashes.filter(col("b") === i).select("content_hash"))
    }
    def files() = {
      def walk(f: java.io.File): Seq[java.io.File] =
        if (f.isDirectory) f.listFiles().toSeq.flatMap(walk) else Seq(f)
      walk(new java.io.File(path)).count(_.getName.startsWith("part-"))
    }
    val batch = Tables.load(spark, sfDir, "documents")
      .filter(col("source") === "src0")
    def timeDedup(label: String): Unit = {
      spark.catalog.clearCache()
      val t0 = System.nanoTime()
      DedupOps.incrementalDedup(batch, spark.read.parquet(path))
        .write.format("noop").mode("overwrite").save()
      println(f"[ledger] $label ${(System.nanoTime() - t0) / 1e9}%.2f s" +
        s" (${files()} files)")
    }
    timeDedup("compact_warmup")
    timeDedup("ingest_vs_100_append_chain")
    val t0 = System.nanoTime()
    DedupOps.compactLedger(spark, path)
    println(f"[ledger] compaction_itself ${(System.nanoTime() - t0) / 1e9}%.2f s")
    timeDedup("ingest_vs_compacted_warmup")
    timeDedup("ingest_vs_compacted")
    spark.stop()
  }
}
