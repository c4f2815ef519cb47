package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.functions.HashFunctions.shingles
import graft.operators.{JaccardNearDup, SkewJoin}
import graft.sources.Tables

/** Dev benchmark: MEASURED evidence that the skew-armor operators beat
  * their naive twins on skewed inputs (they are result-equal by spec;
  * this shows the speedup). Two scenarios, both derived from the driver
  * testdata:
  *
  *  1. Hot-key equi-join: 60% of a ×20-amplified lineitem carries ONE
  *     join key. Broadcast is disabled (models the 100 TB regime where
  *     the dim side exceeds broadcast size — with a broadcastable dim
  *     there is no skew problem to solve). Naive shuffle join is timed
  *     with AQE off and on (AQE's skew split is the built-in remedy;
  *     the comparison shows where it lands) vs saltedEquiJoin.
  *
  *  2. Zipfian set-similarity: a universal token (Long.MinValue — first
  *     in every sorted shingle array) is added to every document, the
  *     worst case for prefix filtering: under the default token order it
  *     sits in EVERY prefix, creating one O(n²) candidate bucket. The
  *     dfOrdered variant ranks tokens by document frequency, pushing the
  *     universal token out of all prefixes.
  *
  * Prints one `[skew] label seconds` line per timed case; results are
  * recorded in BASELINE.md §skew. An optional arg restricts the run to
  * one scenario (`join` | `jaccard`) — the Jaccard worst case is also
  * measured at sf1, where running the ×20 join amplification too would
  * swamp the signal.
  */
object SkewBench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val scenario = args.headOption.getOrElse("all")
    require(
      Set("all", "join", "jaccard", "lm", "pairs", "simhash", "hamming")(
        scenario),
      s"unknown scenario '$scenario' " +
        "(expected all | join | jaccard | lm | pairs | simhash | hamming)")
    val spark = GraftSession.local(32, "graft-skew-bench")

    def sink(df: DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()
    def time(label: String)(f: => Unit): Double = {
      val t0 = System.nanoTime()
      f
      val dt = (System.nanoTime() - t0) / 1e9
      println(f"[skew] $label $dt%.2f s")
      dt
    }

    // ---------------------------------------------------- hot-key join
    // 60% of rows on key 0, the rest spread over 20k keys; ×20 amplified
    if (scenario == "all" || scenario == "join") {
    val amplified = Tables.load(spark, sfDir, "lineitem")
      .select(explode(sequence(lit(1), lit(20))).as("rep"),
        col("l_orderkey"), col("l_quantity"))
    val big = amplified.select(
      when(pmod(col("l_orderkey") + col("rep"), lit(20)) < 19, 0L)
        .otherwise(pmod(xxhash64(col("l_orderkey"), col("rep")),
          lit(20000)) + 1).as("k"),
      col("l_quantity"))
    // uniform-key control: same row count, no skew — the floor any join
    // of this size pays regardless of strategy
    val uniform = amplified.select(
      pmod(xxhash64(col("l_orderkey"), col("rep")), lit(20000) + 1).as("k"),
      col("l_quantity"))
    val dim = spark.range(0, 20001)
      .select(col("id").as("k"), xxhash64(col("id")).as("payload"))

    // cache all sides so the timed region is the JOIN, not the ×20
    // amplification scan that would otherwise dominate all variants
    big.cache().write.format("noop").mode("overwrite").save()
    uniform.cache().write.format("noop").mode("overwrite").save()
    dim.cache().write.format("noop").mode("overwrite").save()

    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    def naive(): Unit = sink(big.join(dim, "k"))
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    naive() // warm the join codegen path untimed
    time("join_uniform_control")(sink(uniform.join(dim, "k")))
    time("join_naive_noAQE")(naive())
    spark.conf.set("spark.sql.adaptive.enabled", "true")
    time("join_naive_AQE")(naive())
    time("join_salted_32")(sink(SkewJoin.saltedEquiJoin(big, dim, "k", 32)))
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold",
      (64 * 1024 * 1024).toString)
    spark.catalog.clearCache()
    }

    // ------------------------------------- universal-token similarity
    if (scenario == "all" || scenario == "jaccard") {
    val sh = Tables.load(spark, sfDir, "documents")
      .select(col("doc_id"),
        array_sort(array_union(
          transform(shingles(split(col("text"), " "), 3), t => xxhash64(t)),
          array(lit(Long.MinValue)))).as("sh"))
      .withColumn("n", size(col("sh")))
    // clear between variants: JaccardNearDup caches its input internally
    // and a shared cache would bias whichever variant runs second
    spark.catalog.clearCache()
    time("jaccard_default_order")(
      sink(JaccardNearDup.pairs(sh, "doc_id", "sh", 0.8)))
    spark.catalog.clearCache()
    time("jaccard_df_order")(
      sink(JaccardNearDup.pairs(sh, "doc_id", "sh", 0.8, dfOrdered = true)))
    // r14 third arm: hot-token demotion — must hold the df arm's skew
    // kill (the planted universal token goes hot and leaves every
    // prefix) at a fraction of its cost (no df join, no window)
    spark.catalog.clearCache()
    time("jaccard_hot_demoted")(
      sink(JaccardNearDup.pairs(sh, "doc_id", "sh", 0.8,
        hotDemoted = true)))
    }

    // --------------------------------------- Zipfian LM context probe
    // t13's model probe joins key on the context unigram, and natural
    // text is Zipfian: one stopword can own a double-digit share of ALL
    // bigram positions. Here 50% of 20M positions share one hot context
    // ("the"); the rest spread over a 5k vocabulary. Broadcast is
    // disabled to model the regime where the model tables exceed
    // broadcast size (web-scale vocab/bigram tables) — with a
    // broadcastable model there is no shuffle and no skew problem.
    // Variants: naive shuffle join AQE off/on (does AQE's skew split
    // absorb it?) vs the salted ctx probe (SkewJoin, result-equal).
    // Optional second arg = corpus size in docs (default 100k ≈ 20M
    // positions). Sweeping it locates the size-keyed switch point for
    // t13's salted-probe default (TextOps.lmSaltMinDocs).
    if (scenario == "all" || scenario == "lm") {
    val nDocs = args.lift(1).map(_.toLong).getOrElse(100000L)
    val docLen = 200
    val hot = spark.range(nDocs).select(col("id").as("doc_id"),
      concat_ws(" ", transform(sequence(lit(1), lit(docLen)), i =>
        when(pmod(xxhash64(col("id"), i), lit(2)) === 0, lit("the"))
          .otherwise(concat(lit("w"),
            pmod(xxhash64(col("id"), i, lit(7)), lit(5000)))))).as("text"))
    val pos = graft.queries.TextOps.lmPositions(hot)
    val vocab = graft.queries.TextOps.lmVocab(hot)
    // cache positions + vocab: the timed region is the model build +
    // probe joins + per-doc aggregation, not the synthesis scan
    pos.cache().write.format("noop").mode("overwrite").save()
    vocab.cache().write.format("noop").mode("overwrite").save()

    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    def score(saltCtx: Int): Unit =
      sink(graft.queries.TextOps.lmScoreFromPositions(pos, vocab, saltCtx))
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    score(0) // warm the codegen paths untimed
    time("lm_naive_noAQE")(score(0))
    spark.conf.set("spark.sql.adaptive.enabled", "true")
    time("lm_naive_AQE")(score(0))
    time("lm_salted_32")(score(32))
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold",
      (64 * 1024 * 1024).toString)
    spark.catalog.clearCache()
    }

    // ----------------------------------- q36 pairing arms, head-to-head
    // The q36 adjacency switch (small → lag window, ≥ pairLargeMinDocs
    // = 250k docs → grouped range rank; measured crossover ≈ 250k, see
    // Analytic) is result-equal by spec; this times both arms
    // WITH the downstream levenshtein at the current SF dir. The window
    // arm's hidden cost is not just the per-source reducer funnel: its
    // output stays partitioned by source (~10 partitions), so the
    // bounded levenshtein — the expensive stage — runs on ~10 tasks
    // while the rest of the host idles. The rank arm leaves range
    // partitioning by (source, doc_id) and keeps every core busy. Run
    // against /tmp/graft_sf2 (100k docs) to see the arms at the
    // switch's engagement threshold.
    // Optional second arg = in-memory replication factor for the doc
    // corpus (key-shifted replicas; content replicas are fine here —
    // adjacency pairing only orders by doc_id). `pairs 200` on sf0.1 =
    // a 1M-doc corpus without synthesizing a dir.
    if (scenario == "pairs") {
    val factor = args.lift(1).map(_.toInt).getOrElse(1)
    val base = Tables.load(spark, sfDir, "documents")
      .select(col("doc_id"), col("source"), col("text"))
    val docs =
      if (factor == 1) base
      else base.crossJoin(
          spark.range(factor).toDF("rep").hint("broadcast"))
        .withColumn("doc_id", col("doc_id") + col("rep") * 1000000000L)
        .drop("rep")
    docs.cache().write.format("noop").mode("overwrite").save()
    def lev(large: Boolean): Unit = sink(
      graft.queries.Analytic.adjacentPairs(docs, large)
        .select(col("source"), col("doc_id"),
          levenshtein(col("text"), col("prev_text"), 60).as("lev")))
    lev(true) // warm codegen untimed
    time("pairs_window_arm")(lev(false))
    time("pairs_rank_arm")(lev(true))
    time("pairs_window_arm_2")(lev(false))
    time("pairs_rank_arm_2")(lev(true))
    spark.catalog.clearCache()
    }

    // ------------------------------- d4 simhash blocking arms, head-to-head
    // The measurement that justified shipping the wide arm
    // UNCONDITIONALLY (the r13 d4/d14 decision — the hypothesized
    // size-keyed switch was falsified; no crossover at any corpus
    // size): narrow lo-64 blocking (2¹⁶ keys, half the
    // probe explode) vs wide 4×32-bit blocking (2³² keys). Both arms are
    // result-equal by spec; this times the candidate+verify join alone —
    // signatures are computed once from the SF dir's REAL documents
    // (synthetic uniform-random signatures would flatter the narrow arm:
    // real simhash bits are vote-correlated, so real corpora collide far
    // more per 16-bit key). Optional second arg keeps 1-in-k docs by id
    // hash, so one sf10 dir yields the 500k/250k/125k corpus line.
    if (scenario == "simhash") {
    val keep = args.lift(1).map(_.toInt).getOrElse(1)
    val sigs = graft.queries.DedupOps.simhashSigs128(spark, sfDir)
      .filter(pmod(xxhash64(col("doc_id")), lit(keep)) === 0)
    sigs.cache().write.format("noop").mode("overwrite").save()
    println(s"[skew] simhash_n ${sigs.count()}")
    import graft.operators.HammingNearDup
    def arm(wide: Boolean): Unit = sink(
      if (wide) HammingNearDup.pairsWide(sigs, "doc_id", "hi", "lo", 7)
      else HammingNearDup
        .pairsWideNarrowBlocked(sigs, "doc_id", "hi", "lo", 7))
    arm(true) // warm codegen untimed
    time("simhash_narrow_arm")(arm(false))
    time("simhash_wide_arm")(arm(true))
    time("simhash_narrow_arm_2")(arm(false))
    time("simhash_wide_arm_2")(arm(true))
    spark.catalog.clearCache()
    graft.operators.ScratchCache.releaseAll()
    }

    // -------------------------- d4/mm3 hamming hot-BLOCK skew probe
    // HammingNearDup's doc promised "a hot bucket can be salted or
    // dropped like any skewed join key" with nothing measuring it.
    // The hazard is OUTPUT-compute skew: a low-entropy corpus (boiler-
    // plate pages, near-constant templates) gives d unique signatures
    // IDENTICAL in 3 of 4 pigeonhole blocks — three (block, v) join
    // keys each carrying d·d candidate pairs that all materialize in
    // whichever task owns that key. The shuffle INPUT for those keys
    // is tiny (d rows a side), so AQE's bytes-based skew split never
    // fires — if a straggler exists, it is invisible to every adaptive
    // remedy and needs an explicit probe-side salt. This measures it:
    // a planted 3-constant-block hot group (hotN of n sigs, the other
    // blocks random) under (a) the small-index broadcast-join shape,
    // (b) the at-scale merge-join shape with AQE skew split on,
    // (c) same with skew split off (isolates what AQE contributes),
    // against a uniform-entropy control on the merge shape.
    if (scenario == "hamming") {
    val n = args.lift(1).map(_.toLong).getOrElse(150000L)
    val hotN = args.lift(2).map(_.toLong).getOrElse(5000L)
    import graft.operators.HammingNearDup
    // deterministic synthetic signatures (ANSI-safe hash mixing):
    // cold rows uniform over 2⁶⁴×2⁶⁴; hot rows share hi and lo's high
    // half (blocks 1–3 constant) and randomize only lo's low 32 bits
    val hot = col("id") % lit(n / hotN) === 0
    val sigs = spark.range(n)
      .select(col("id").as("doc_id"),
        when(hot, lit(0x5A5A5A5A5A5A5A5AL))
          .otherwise(xxhash64(col("id"), lit("h"))).as("hi"),
        when(hot, lit(0x3C3C3C3C00000000L)
            .bitwiseOR(xxhash64(col("id"), lit("l"))
              .bitwiseAND(lit(0xFFFFFFFFL))))
          .otherwise(xxhash64(col("id"), lit("l"))).as("lo"))
    val cold = spark.range(n)
      .select(col("id").as("doc_id"),
        xxhash64(col("id"), lit("h")).as("hi"),
        xxhash64(col("id"), lit("l")).as("lo"))
    sigs.cache().write.format("noop").mode("overwrite").save()
    cold.cache().write.format("noop").mode("overwrite").save()
    def arm(s: DataFrame, salt: Int = 0): Unit =
      sink(HammingNearDup.pairsWide(s, "doc_id", "hi", "lo", 7,
        saltHotBlocks = salt))
    def noBroadcast(f: => Unit): Unit = {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      try f finally spark.conf.set(
        "spark.sql.autoBroadcastJoinThreshold",
        (64 * 1024 * 1024).toString)
    }
    // optional third arg prunes to the cheap arms (the unsalted
    // broadcast arm is ~d²-serial — pathological by design; measure it
    // once at a moderate d, not on every corpus line)
    val fast = args.lift(3).contains("fast")
    arm(cold) // warm codegen untimed
    noBroadcast { time("hamming_uniform_merge")(arm(cold)) }
    if (!fast) {
      time("hamming_hot_broadcast")(arm(sigs))
      time("hamming_hot_broadcast_salted")(arm(sigs, salt = 32))
      noBroadcast { time("hamming_hot_merge_aqe_skew")(arm(sigs)) }
    }
    spark.conf.set("spark.sql.adaptive.skewJoin.enabled", "false")
    noBroadcast { time("hamming_hot_merge_no_skew")(arm(sigs)) }
    spark.conf.set("spark.sql.adaptive.skewJoin.enabled", "true")
    noBroadcast { time("hamming_hot_merge_salted")(arm(sigs, salt = 32)) }
    spark.catalog.clearCache()
    }

    spark.stop()
  }
}
