package graft.functions

import java.io.ByteArrayOutputStream

import org.apache.spark.sql.{Column, GraftBridge}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, Literal, Predicate, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.aggregate.BloomFilterAggregate
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.LongType
import org.apache.spark.util.sketch.BloomFilter

/** Broadcast Bloom-filter membership as a MAP-SIDE prefilter — the
  * standard large-scale trick for "is this key in that multi-TB set"
  * when a full anti-join would shuffle the probing side: test against a
  * compact bitmap first, and pay the exact join only for the positives
  * (true members + the fpp·n false positives). The final answer stays
  * EXACT because every positive is re-checked by the exact join;
  * Bloom filters have no false negatives, so a negative is proof of
  * absence (Bloom, CACM 1970; the same shape Spark's own
  * InjectRuntimeFilter plants under shuffle joins).
  *
  * Built on Spark's native codegen'd expressions — the aggregate and
  * the probe both run inside whole-stage codegen, no UDF anywhere:
  *  - [[bloomAgg]] wraps `BloomFilterAggregate` (partial-agg mergeable:
  *    each task builds a partial bitmap, merge is bitwise OR — one
  *    1-row binary result, never a driver-side item collect);
  *  - [[mightContain]] wraps `BloomFilterMightContain` with the filter
  *    bytes as a plan LITERAL — exactly how Spark's runtime filters
  *    embed theirs. Values must be pre-hashed to longs (`xxhash64`),
  *    matching the runtime-filter convention.
  *
  * Sizing: [[defaultNumItems]]/[[defaultNumBits]] give ~2% fpp at 1M
  * distinct keys (m/n ≈ 8.4, k = 6) — a 1 MB bitmap. At a 100 TB
  * corpus (~10⁹ ledger hashes) the same m/n is ~1.3 GB: still one
  * torrent-broadcast to 1000 executors (vs re-shuffling a daily batch
  * against a 32 GB hash ledger), or shard the filter by the ledger's
  * hash-prefix partitions (16 × ~84 MB) and probe the shard for each
  * row's prefix. fpp only affects the exact-check volume, never the
  * result.
  */
object BloomMembership {

  /** ~2% fpp at 1M items; both sides of every merge MUST be built with
    * the same numBits (bitwise-OR compatibility) — [[merge]] enforces.
    */
  val defaultNumItems: Long = 1000000L
  val defaultNumBits: Long = 8388608L // 2²³ bits = 1 MB

  /** Aggregate a LongType column (pre-hash strings with `xxhash64`)
    * into a serialized Bloom filter (one BinaryType row).
    */
  def bloomAgg(hashedLong: Column,
      numItems: Long = defaultNumItems,
      numBits: Long = defaultNumBits): Column =
    GraftBridge.column(new BloomFilterAggregate(
      GraftBridge.expression(hashedLong),
      Literal(numItems), Literal(numBits)).toAggregateExpression())

  /** Membership probe: `mightContain(bytes, xxhash64(key))`. False ⇒
    * definitely absent; true ⇒ must be exact-checked. A [[BloomGuard]]
    * rather than `BloomFilterMightContain(Literal(bytes), …)`: the
    * literal form prints the ENTIRE bitmap as hex into every plan/
    * explain string (megabytes per filter mention); the guard carries
    * the bytes out-of-band and ships the deserialized filter to
    * executors as a codegen reference object.
    */
  def mightContain(bloomBytes: Array[Byte], hashedLong: Column): Column =
    GraftBridge.column(BloomGuard(GraftBridge.expression(hashedLong),
      bloomBytes))

  /** Driver-side union of serialized filters (bitwise OR — MB-sized,
    * the same class of bounded driver work as reading a codebook).
    * Throws on incompatible (numBits/k) inputs rather than degrade.
    */
  def merge(a: Array[Byte], b: Array[Byte]): Array[Byte] = {
    val fa = BloomFilter.readFrom(a)
    fa.mergeInPlace(BloomFilter.readFrom(b))
    serialize(fa)
  }

  def serialize(f: BloomFilter): Array[Byte] = {
    val out = new ByteArrayOutputStream()
    f.writeTo(out)
    out.toByteArray
  }

  def bitSize(bytes: Array[Byte]): Long = BloomFilter.readFrom(bytes).bitSize()
}

/** `bloom_guard(xxhash64Key)` — membership probe against a filter held
  * OUT-OF-BAND (constructor field, not a child Literal), so plan
  * strings stay readable and codegen references the deserialized
  * filter object directly (one `mightContainLong` call per row inside
  * whole-stage codegen — the same hot path as Spark's own runtime
  * filters, minus the megabyte literal in every explain).
  */
case class BloomGuard(child: Expression, bits: Array[Byte])
    extends UnaryExpression with Predicate {

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == LongType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"bloom_guard needs a LongType key (pre-hash with xxhash64), " +
        s"got ${child.dataType.catalogString}")

  @transient private lazy val filter: BloomFilter = BloomFilter.readFrom(bits)

  override protected def nullSafeEval(v: Any): Any =
    filter.mightContainLong(v.asInstanceOf[Long])

  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode = {
    val bf = ctx.addReferenceObj("bloomFilter", filter,
      classOf[BloomFilter].getName)
    nullSafeCodeGen(ctx, ev, c => s"${ev.value} = $bf.mightContainLong($c);")
  }

  override def prettyName: String = "bloom_guard"

  override protected def withNewChildInternal(newChild: Expression) =
    copy(child = newChild)
}
