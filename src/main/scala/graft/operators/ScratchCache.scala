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

  private val registry = mutable.Set.empty[DataFrame]

  private def level(df: DataFrame): StorageLevel =
    StorageLevel.fromString(
      df.sparkSession.conf.get(levelConf, "DISK_ONLY"))

  /** Persist `df` at the scratch level and register it for
    * [[releaseAll]]. Idempotent per frame (re-persisting an already
    * persisted plan is a Spark no-op warning; the registry is a set).
    */
  def scratch(df: DataFrame): DataFrame = {
    df.persist(level(df))
    registry.synchronized { registry += df }
    df
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
