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
