package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Product quantization (Jégou/Douze/Schmid, "Product Quantization for
  * Nearest Neighbor Search", TPAMI 2011) — the memory-bound regime's
  * ANN answer: a D-dim float vector (D×4 bytes) compresses to M
  * sub-codes of log₂K bits, and query scoring reads the CODES, not the
  * vectors. At 100 TB of embeddings the scan that dominates ANN cost
  * shrinks ~16×, which is the difference between "fits the page cache"
  * and "doesn't".
  *
  * The codebook (M·K centroids, a few KB) is a MODEL, not data: it
  * lives on the driver and enters every plan as a flat literal array
  * feeding the native [[graft.functions.PqEncode]] kernel (argmin
  * triple loop inside whole-stage codegen) — no broadcast join, no
  * n·M·K row explosion, no shuffle, no interpreted lambdas. Encoding
  * the corpus is therefore a PROJECTION (scan-speed at any size, the
  * shape a 100 TB encode pass must have), and each Lloyd training round
  * is exactly one shuffle (the per-(sub, code, dim) mean) over the
  * hash-capped sample, with the M·K·(D/M) mean cells collected back —
  * the BpeInduction O(1)-collect discipline.
  *
  * Determinism, end to end:
  *  - per-dimension centroid means accumulate in DECIMAL, not DOUBLE,
  *    so the shuffle's partial-sum order cannot drift a centroid by a
  *    ulp between runs (floats are exact in decimal; the mean is one
  *    decimal division) — the t13 discipline;
  *  - assignment distance is a fixed-order double fold per (vector,
  *    sub, code), argmin scanning codes ascending with strict `<` —
  *    lexicographic (dist, code) tie-break;
  *  - seeds are the K sample vectors minimizing (xxhash64(vec_id) mod
  *    2²⁰, vec_id) — spread, insertion-order-independent, reproducible.
  */
object ProductQuantizer {

  /** Codebook training cap: hash-sampled vectors used for Lloyd
    * iterations (codebooks converge on a sample; encoding still sees
    * every vector — the production shape).
    */
  val maxTrainVectors = 50000L

  /** Driver-resident codebook: `cb(sub)(code)(j)` = centroid value. */
  type Codebook = Seq[Seq[Seq[Double]]]

  /** All M codes of a vector column against a driver codebook, via the
    * native [[graft.functions.PqEncode]] kernel — the codebook enters
    * the plan as a flat `array<double>` literal, the argmin triple loop
    * runs inside whole-stage codegen.
    */
  private def pqCodes(vec: Column, cb: Codebook, m: Int, k: Int): Column =
    org.apache.spark.sql.GraftBridge.column(
      graft.functions.PqEncode(
        org.apache.spark.sql.GraftBridge.expression(vec),
        org.apache.spark.sql.GraftBridge.expression(
          typedLit(cb.flatten.flatten)),
        m, k))

  private def cbToDf(df: DataFrame, cb: Codebook): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    cb.zipWithIndex.flatMap { case (cents, s) =>
      cents.zipWithIndex.map { case (cent, c) => (s, c, cent) }
    }.toDF("sub", "code", "centroid")
  }

  /** Rebuild the (sub, code, centroid) model relation from driver form
    * — the inverse of [[collectCodebook]], for cached codebooks.
    */
  def codebookDf(ref: DataFrame, cb: Codebook): DataFrame = cbToDf(ref, cb)

  /** Collect a (sub, code, centroid) frame back into driver form —
    * M·K rows, an O(1) model relation.
    */
  def collectCodebook(codebookDf: DataFrame): Codebook =
    codebookDf.collect()
      .map(r => (r.getInt(0), r.getInt(1), r.getSeq[Double](2)))
      .groupBy(_._1).toSeq.sortBy(_._1)
      .map { case (_, rs) => rs.sortBy(_._2).map(_._3).toSeq }

  /** Train an (M subspaces × K centroids) codebook over `emb`
    * (vec_id, embedding: array<float> of length `dim`).
    *
    * @return (sub, code, centroid: array<double> of length dim/M)
    */
  def trainCodebook(emb: DataFrame, dim: Int, m: Int, k: Int,
      iters: Int, nVectors: Long): DataFrame = {
    require(dim % m == 0, s"dim $dim not divisible by M=$m")
    val subDim = dim / m
    // hash-sample down to ≤ maxTrainVectors (F=1 keeps everything)
    val f = math.max(1L, nVectors / maxTrainVectors)
    val sample = emb.filter(pmod(xxhash64(col("vec_id")), lit(f)) === 0)
      .select(col("vec_id"), col("embedding")).cache()

    // deterministic spread seeds: the K sample vectors minimizing
    // (hash, vec_id) — a TakeOrdered + one O(K) collect; subvector
    // slicing happens on the driver
    val seedIds = sample
      .select(col("vec_id"),
        pmod(xxhash64(col("vec_id")), lit(1 << 20)).as("h"))
      .orderBy(col("h"), col("vec_id")).limit(k)
      .select("vec_id").collect().map(_.getLong(0))
    require(seedIds.length == k,
      s"sample has ${seedIds.length} vectors, need >= $k for K=$k")
    val codeOf = seedIds.zipWithIndex.toMap
    val seedVecs = sample.filter(col("vec_id").isInCollection(seedIds))
      .collect()
      .map(r => codeOf(r.getLong(0)) -> r.getSeq[Float](1))
      .toMap
    var codebook: Codebook = Seq.tabulate(m, k)((s, c) =>
      seedVecs(c).slice(s * subDim, (s + 1) * subDim)
        .map(_.toDouble).toSeq)

    for (_ <- 1 to iters) {
      // one shuffle: per-(sub, code, dim) decimal means of the sample's
      // assigned subvectors; M·K·subDim cells collect back. Empty
      // clusters simply don't appear and keep their previous centroid.
      val cells = sample
        .select(col("embedding"),
          posexplode(pqCodes(col("embedding"), codebook, m, k)))
        .toDF("embedding", "sub", "code")
        .select(col("sub"), col("code"), posexplode(transform(
          slice(col("embedding"), col("sub") * subDim + lit(1), lit(subDim)),
          x => x.cast("double"))))
        .toDF("sub", "code", "j", "v")
        .groupBy("sub", "code", "j")
        .agg((sum(col("v").cast(DecimalType(27, 12))) /
          count(lit(1))).cast("double").as("mean"))
        .collect()
        .map(r => (r.getInt(0), r.getInt(1), r.getInt(2), r.getDouble(3)))
      val next = cells.groupBy(c => (c._1, c._2))
        .view.mapValues(_.sortBy(_._3).map(_._4).toSeq).toMap
      codebook = Seq.tabulate(m, k)((s, c) =>
        next.getOrElse((s, c), codebook(s)(c)))
    }
    sample.unpersist(blocking = false)
    cbToDf(emb, codebook)
  }

  /** Encode EVERY vector against a trained codebook: a pure projection
    * (the codebook collects to a literal — no join, no explode, no
    * shuffle; the encode pass runs at scan speed at any corpus size).
    *
    * @return (vec_id, codes: array<int> of length M ordered by sub,
    *         vnorm: exact double L2 norm of the original vector — the
    *         standard side-channel that turns ADC inner products into
    *         cosine scores)
    */
  def encode(emb: DataFrame, codebookDf: DataFrame, dim: Int,
      m: Int): DataFrame = {
    val cb = collectCodebook(codebookDf)
    val k = cb.head.length
    emb.select(col("vec_id"),
      pqCodes(col("embedding"), cb, m, k).as("codes"),
      graft.functions.VectorFunctions.norm(col("embedding")).as("vnorm"))
  }

  /** Asymmetric-distance (ADC) approximate-cosine scores of every coded
    * vector against every query row (qid, qemb, qnorm): per (qid, sub,
    * code) inner products become a flat M·K lookup table per query, and
    * each coded vector's score is one fixed-order fold of its M looked-up
    * contributions — a per-pair single-row fold, never a multi-row SUM,
    * so a SQL twin folding the same ordered list matches bit for bit
    * (the s1 fold discipline, not the t13 decimal one).
    *
    * @return (qid, vec_id, score) — score ≈ cosine(q, vec)
    */
  def adcScores(codes: DataFrame, codebook: DataFrame, queries: DataFrame,
      dim: Int, m: Int, k: Int): DataFrame = {
    val subDim = dim / m
    // (qid, dt: array<double> of M·K) — the classic ADC lookup table,
    // one fixed-order subDim fold per (query, sub, code), NQ·M·K rows
    // collapsing to NQ rows
    val dt = queries.crossJoin(broadcast(codebook))
      .select(col("qid"),
        (col("sub") * k + col("code")).as("slot"),
        aggregate(zip_with(
            transform(slice(col("qemb"), col("sub") * subDim + 1,
              lit(subDim)), x => x.cast("double")),
            col("centroid"), (a, b) => a * b),
          lit(0d), (acc, x) => acc + x).as("dot"))
      .groupBy("qid")
      .agg(sort_array(collect_list(struct(col("slot"), col("dot"))))
        .as("slots"))
      .select(col("qid"),
        transform(col("slots"), s => s.getField("dot")).as("dt"))
    val qn = queries.select(col("qid"), col("qnorm"))
    codes.crossJoin(broadcast(dt.join(qn, "qid")))
      .select(col("qid"), col("vec_id"),
        (aggregate(
            zip_with(col("codes"), sequence(lit(0), lit(m - 1)),
              (c, s) => element_at(col("dt"), (s * k + c + 1).cast("int"))),
            lit(0d), (acc, x) => acc + x)
          / (col("vnorm") * col("qnorm"))).as("score"))
  }
}
