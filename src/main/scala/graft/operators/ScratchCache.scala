package graft.operators

import scala.collection.mutable

import org.apache.spark.sql.DataFrame
import org.apache.spark.storage.StorageLevel

/** Explicit lifecycle for CORPUS-SIZED cached intermediates (the
  * shingle tables feeding d2/d3/d4/d6/d7/t6/p1, and anything else
  * whose cached footprint scales with the input rather than with a
  * model).
  *
  * Why these frames must be persisted at all: when a wide computed
  * column (e.g. the WordGramHashes shingle array) feeds a Generate,
  * the optimizer collapses the projection into the generator input and
  * re-evaluates the builder per CONSUMING EXPRESSION — measured
  * 0.3 s → 4.8 s on the simhash path uncached. The persist is a
  * materialization barrier, not an optimization.
  *
  * Why NOT a bare `.cache()`: the default level would pin a table
  * larger than the corpus (the shingle array is ~w× the text bytes)
  * into executor storage memory at 100 TB — storage amplification
  * that competes with shuffle/agg memory for the whole job's
  * lifetime — and nothing would ever free it outside the bench
  * harnesses (which `clearCache()` between queries). Here instead:
  *
  *  - the storage level is an EXPLICIT, conf-keyed choice
  *    (`spark.graft.scratch.level`, default DISK_ONLY): scratch
  *    frames are read back a handful of times within one query and
  *    then dead, so they belong on local disk — columnar-compressed,
  *    sequential reads — leaving memory to the operators that are
  *    actually hot. Set the conf to MEMORY_AND_DISK to opt a small
  *    corpus back into memory-first caching.
  *  - every scratch frame is REGISTERED, and [[releaseAll]] frees the
  *    lot — the library-user equivalent of the bench harnesses'
  *    per-query `clearCache()`. Call it after the queries sharing the
  *    scratch (d3's set-grain frames, the d2/d6/d7 prefix-join base)
  *    have run their actions.
  *
  * Persisted frames remain LRU-evictable and recompute-safe (the
  * builders are deterministic), so registration is a release handle,
  * not a correctness dependency.
  */
object ScratchCache {

  /** Conf key selecting the scratch storage level. */
  val levelConf = "spark.graft.scratch.level"

  /** Conf key selecting the storage level for MODEL-SIZED pins
    * ([[scratchModel]]) — tables bounded by vocabulary × classes /
    * sources, not by the corpus. Model tables are small by
    * construction at ANY corpus size, so spilling them to disk to save
    * a recompute is the wrong trade (r21 measured t19's
    * vocabulary×sources pin at DISK_ONLY 2.3× SLOWER than no pin at
    * sf0.1): they belong memory-first, disk only under pressure.
    */
  val modelLevelConf = "spark.graft.scratch.model.level"

  /** Conf key for the SIZE GATE on gated pins: a [[scratchGated]] /
    * [[scratchModel]] pin whose optimizer-estimated plan size is below
    * this many bytes is SKIPPED (the frame is returned unpersisted).
    * Rationale (r22, guide §1.2/§5): a pin trades one write + k reads
    * of the pinned table against k−1 recomputes of its subtree. Both
    * sides scale with the input, but the pin carries a fixed
    * materialization cost (job + block write) that DOMINATES at small
    * inputs — the r21 t17/t19 regressions were exactly this trade made
    * unconditionally. The gate makes the pin scale-adaptive: tiny
    * inputs recompute (cheaper), production-scale inputs pin.
    */
  val gateBytesConf = "spark.graft.scratch.gateBytes"

  /** Default gate: 1 MB of estimated plan size. Calibrated by a
    * same-window A/B at sf0.1 (plan estimates ~0.3-0.4 MB → skip wins:
    * t17 1.08 vs 1.32 s, t19 0.63 vs 0.87 s) and sf1 (~3-4 MB → pin
    * wins: t21 2.52 vs 9.28 s, t17 4.62 vs 5.07 s); the crossover sits
    * between the two, and erring LOW is the safe side — a pin taken
    * too early costs a fixed ~0.2-0.4 s, a pin skipped too late costs
    * a multiple of the corpus pass (t21's 3.7× at sf1).
    */
  val gateBytesDefault: Long = 1L << 20

  private val registry = mutable.Set.empty[DataFrame]

  private def level(df: DataFrame): StorageLevel =
    StorageLevel.fromString(
      df.sparkSession.conf.get(levelConf, "DISK_ONLY"))

  private def gateBytes(df: DataFrame): BigInt = BigInt(
    df.sparkSession.conf.get(gateBytesConf, gateBytesDefault.toString)
      .toLong)

  /** Persist `df` at the scratch level and register it for
    * [[releaseAll]]. Idempotent per frame (re-persisting an already
    * persisted plan is a Spark no-op warning; the registry is a set).
    */
  def scratch(df: DataFrame): DataFrame = {
    df.persist(level(df))
    registry.synchronized { registry += df }
    df
  }

  /** Size-gated CORPUS pin: persist at the scratch level only when the
    * optimizer's size estimate clears [[gateBytesConf]] — for pins that
    * are an OPTIMIZATION (save a re-explode), not a materialization
    * barrier. Barrier pins (the d2/d3 shingle tables, whose absence
    * re-evaluates a wide builder per consuming expression) must stay on
    * the unconditional [[scratch]].
    */
  def scratchGated(df: DataFrame): DataFrame =
    if (org.apache.spark.sql.GraftBridge.planSizeBytes(df)
        < gateBytes(df)) df
    else scratch(df)

  /** Size-gated MODEL pin: as [[scratchGated]], but at the model
    * storage level (default MEMORY_AND_DISK) — for vocabulary-/class-/
    * source-bounded tables whose pinned footprint is small at any
    * corpus size while their recompute is a full corpus pass.
    */
  def scratchModel(df: DataFrame): DataFrame =
    if (org.apache.spark.sql.GraftBridge.planSizeBytes(df)
        < gateBytes(df)) df
    else {
      df.persist(StorageLevel.fromString(
        df.sparkSession.conf.get(modelLevelConf, "MEMORY_AND_DISK")))
      registry.synchronized { registry += df }
      df
    }

  /** Unpersist one scratch frame and drop it from the registry — for
    * callers with a natural release point earlier than [[releaseAll]]
    * (e.g. a trained model that localCheckpoints its derived frames and
    * then never reads the scratch again). Safe on frames the gate left
    * unpersisted (unpersist is a no-op).
    */
  def release(df: DataFrame): Unit = {
    df.unpersist(blocking = false)
    registry.synchronized { registry -= df }
  }

  /** Unpersist every registered scratch frame (non-blocking) and empty
    * the registry.
    */
  def releaseAll(): Unit = registry.synchronized {
    registry.foreach(_.unpersist(blocking = false))
    registry.clear()
  }

  /** Registered-but-not-yet-released frame count (spec hook). */
  def outstanding: Int = registry.synchronized(registry.size)
}
