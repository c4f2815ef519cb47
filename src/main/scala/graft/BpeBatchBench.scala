package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.sources.Tables

/** Dev benchmark (r19; r20 adds the Zipfian arm): the batched BPE
  * inducer's round-count claim AND its merge-set fidelity at a
  * realistic vocabulary. The exact inducer is one Spark job pair PER
  * MERGE (driver-latency bound — a 32k vocabulary is 32k sequential
  * rounds); the batched variant accepts up to B symbol-disjoint merges
  * per round. Two modes:
  *
  *  - corpus mode (default): times both arms on the real `documents`
  *    table at the same merge count and prints merge-set agreement —
  *    the sf tables' 31-word toy vocabulary is the ADVERSARIAL case
  *    for within-round disjointness (depth-chains dominate), so its
  *    overlap is the documented fidelity FLOOR, not the expectation.
  *  - `zipf` mode (r20, closing the r19 verdict's evidence gap): the
  *    Zipfian-overlap claim ("a real vocabulary amortizes chains
  *    across many words, pushing overlap toward 1") measured instead
  *    of asserted. Synthesizes a deterministic syllable-built
  *    vocabulary (shared subword structure, the thing BPE exists to
  *    exploit) under a Zipf(s=1.07) token distribution — the shape of
  *    real web text — trains ≥1k merges exact once, then batched at
  *    each requested B, and prints overlap + speedup per B. Recorded
  *    in BASELINE §bpe-batched; F12's default B cites it.
  *
  * Run: `SPARK_GRAFT_SF_DIR=... sbt "runMain graft.BpeBatchBench
  * [nMerges] [batchB]"` or `sbt "runMain graft.BpeBatchBench zipf
  * [nMerges] [B,B,...] [vocabSize] [millionTokens]"`.
  */
object BpeBatchBench {

  /** Deterministic Zipfian corpus: `vSize` distinct words composed of
    * 1–3 shared syllables (so merges have cross-word structure to
    * find), sampled to `nTokens` under Zipf(s) by inverse CDF. Seeded —
    * every run measures the identical corpus.
    */
  private[graft] def zipfCorpus(spark: SparkSession, vSize: Int,
      nTokens: Long, s: Double = 1.07, seed: Long = 42L): DataFrame = {
    val rnd = new scala.util.Random(seed)
    val syll = Vector.fill(240)(
      (0 until (2 + rnd.nextInt(2)))
        .map(_ => ('a' + rnd.nextInt(26)).toChar).mkString)
    val vocab = scala.collection.mutable.LinkedHashSet.empty[String]
    while (vocab.size < vSize)
      vocab += (0 to rnd.nextInt(3)).map(_ => syll(rnd.nextInt(syll.size)))
        .mkString
    val words = vocab.toIndexedSeq
    val cum = Array.tabulate(vSize)(i => 1.0 / math.pow(i + 1.0, s))
      .scanLeft(0.0)(_ + _).tail
    val total = cum.last
    def sample(): String = {
      val u = rnd.nextDouble() * total
      var lo = 0
      var hi = vSize - 1
      while (lo < hi) {
        val m = (lo + hi) >>> 1
        if (cum(m) < u) lo = m + 1 else hi = m
      }
      words(lo)
    }
    val perDoc = 100
    val docs = (0L until nTokens / perDoc).map(_ =>
      (0 until perDoc).map(_ => sample()).mkString(" "))
    import spark.implicits._
    spark.createDataset(docs).toDF("text")
  }

  private def overlapOf(exact: Seq[((String, String), Long)],
      batched: Seq[((String, String), Long)]): Double =
    batched.map(_._1).toSet.intersect(exact.map(_._1).toSet)
      .size.toDouble / math.max(exact.size, 1)

  def main(args: Array[String]): Unit = {
    val spark = GraftSession.local(
      sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt, "graft-bpe-batch")
    spark.sparkContext.setLogLevel("WARN")

    if (args.headOption.contains("zipf")) {
      val n = args.lift(1).map(_.toInt).getOrElse(1024)
      val bs = args.lift(2).map(_.split(",").map(_.toInt).toSeq)
        .getOrElse(Seq(8, 64, 256))
      val vSize = args.lift(3).map(_.toInt).getOrElse(20000)
      val nTokens = args.lift(4).map(_.toLong * 1000000L)
        .getOrElse(2000000L)
      val docs = zipfCorpus(spark, vSize, nTokens).localCheckpoint()
      val realV = docs.selectExpr("explode(split(text, ' ')) AS w")
        .select("w").distinct().count()
      println(s"[bpe-zipf] vocab=$realV tokens=$nTokens merges=$n")
      var t0 = System.nanoTime()
      val exact = graft.operators.BpeInduction.trainMerges(docs, "text", n)
      val exactSec = (System.nanoTime() - t0) / 1e9
      println(f"[bpe-zipf] exact rounds=${exact.size} " +
        f"wall=$exactSec%.1f s")
      bs.foreach { b =>
        t0 = System.nanoTime()
        val batched = graft.operators.BpeInduction
          .trainMergesBatched(docs, "text", n, batchB = b)
        val sec = (System.nanoTime() - t0) / 1e9
        println(f"[bpe-zipf] B=$b wall=$sec%.1f s " +
          f"speedup=${exactSec / sec}%.1f " +
          f"set_overlap=${overlapOf(exact, batched)}%.3f")
      }
    } else {
      val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR",
        "/root/testdata/sf0.01")
      val n = args.headOption.map(_.toInt).getOrElse(128)
      val b = args.lift(1).map(_.toInt).getOrElse(64)
      val docs = Tables.load(spark, sfDir, "documents")
      var t0 = System.nanoTime()
      val exact = graft.operators.BpeInduction.trainMerges(docs, "text", n)
      val exactSec = (System.nanoTime() - t0) / 1e9
      t0 = System.nanoTime()
      val batched = graft.operators.BpeInduction
        .trainMergesBatched(docs, "text", n, batchB = b)
      val batchedSec = (System.nanoTime() - t0) / 1e9
      println(f"[bpe] n=$n exact_rounds=${exact.size} " +
        f"exact=$exactSec%.1f s batched(B=$b)=$batchedSec%.1f s " +
        f"speedup=${exactSec / batchedSec}%.1f " +
        f"set_overlap=${overlapOf(exact, batched)}%.3f " +
        f"sf=$sfDir")
    }
    spark.stop()
  }
}
