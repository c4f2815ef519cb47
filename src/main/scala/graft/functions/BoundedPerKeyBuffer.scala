package graft.functions

/** Contract marker for every `TypedImperativeAggregate` in this library:
  * the aggregation buffer holds at most [[bufferBound]] entries PER KEY,
  * independent of input size.
  *
  * Why this is load-bearing: TypedImperativeAggregates run in
  * `ObjectHashAggregateExec`, and `GraftSession` raises the sort-based
  * fallback threshold (`spark.sql.objectHashAggregate.sortBased
  * .fallbackThreshold`) from 128 to 1M keys so corpus-keyed heap aggs
  * (s9's per-vector top-k) never silently become a full sort+spill of
  * their input (the r14 sf10 OOM). That global setting is only safe
  * while EVERY buffer is per-key bounded — 1M keys × a bounded buffer
  * is a few hundred MB per task; 1M keys × an unbounded buffer is an
  * OOM. `AggregateBufferBoundSpec` fails the build if an aggregate
  * extends `TypedImperativeAggregate` without declaring this bound.
  */
trait BoundedPerKeyBuffer {
  /** Maximum buffer entries per grouping key, at any input size. */
  def bufferBound: Int
}

/** A `long[]` expression parameter with STRUCTURAL equality at O(1)
  * hot-path cost: Catalyst's tree transforms hash and compare
  * expression nodes constantly, so a case-class field must be cheap to
  * hash (a raw `Array` is — but by reference identity, defeating
  * canonicalization/CSE; a `Seq` is structural — but O(n) per
  * hashCode/equals, which measured a 6× planning regression on d2 at
  * sf10 with a 65536-entry hot set). The wrapper computes its hash
  * once at construction and short-circuits equals on reference before
  * falling back to the exact array compare.
  */
final class LongArrayParam(val values: Array[Long]) extends Serializable {
  override val hashCode: Int = java.util.Arrays.hashCode(values)
  override def equals(o: Any): Boolean = o match {
    case other: LongArrayParam =>
      (this eq other) || ((hashCode == other.hashCode) &&
        java.util.Arrays.equals(values, other.values))
    case _ => false
  }
  override def toString: String =
    s"LongArrayParam(n=${values.length}, hash=$hashCode)"
}
