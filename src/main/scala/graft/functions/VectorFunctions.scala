package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DoubleType

/** Vector math over `Array[Float]` embedding columns. The hot-path dot
  * product is a native Catalyst expression ([[FloatVecDot]], primitive
  * loop inside whole-stage codegen); everything else composes from it.
  *
  * Elements are promoted to double BEFORE multiplication and accumulated
  * strictly left-to-right, so the result is deterministic and
  * reproducible across engines (bit-exact vs. the DuckDB oracle's
  * identical fold).
  */
object VectorFunctions {

  import org.apache.spark.sql.GraftBridge

  private def toDouble(a: Column): Column =
    transform(a, x => x.cast(DoubleType))

  /** Sequential dot product in double precision (native codegen). */
  def dot(a: Column, b: Column): Column =
    GraftBridge.column(FloatVecDot(
      GraftBridge.expression(a), GraftBridge.expression(b)))

  /** Reference HOF formulation of [[dot]] — kept for the spec that
    * asserts the native expression is bit-identical to it.
    */
  private[graft] def dotHof(a: Column, b: Column): Column =
    aggregate(
      zip_with(toDouble(a), toDouble(b), (x, y) => x * y),
      lit(0.0), (acc, v) => acc + v)

  /** L2 norm (self-dot shares the same fold order). */
  def norm(a: Column): Column = sqrt(dot(a, a))

  /** Cosine similarity = dot / (|a| * |b|). */
  def cosine(a: Column, b: Column): Column =
    dot(a, b) / (norm(a) * norm(b))

  /** Random-hyperplane signature: `bits` sign bits packed into a long.
    * Hyperplane h is the deterministic pseudo-vector whose j-th component
    * is a hash of (seed, h, j) mapped to [-1, 1); sign(v . h) gives the
    * bit. Deterministic, shippable to any cluster size.
    */
  def hyperplaneSignature(v: Column, bits: Int, seed: Int = 0x5eed): Column = {
    require(bits >= 1 && bits <= 63, s"bits must be in [1,63], got $bits")
    GraftBridge.column(HyperplaneSignature(
      GraftBridge.expression(v), bits, seed))
  }

  /** First index where two long arrays hold equal values, -1 if none
    * (native codegen) — the multi-table LSH first-collision filter: see
    * [[FirstEqualIndex]].
    */
  def firstEqualIndex(a: Column, b: Column): Column =
    GraftBridge.column(FirstEqualIndex(
      GraftBridge.expression(a), GraftBridge.expression(b)))

  /** Reference HOF formulation of [[firstEqualIndex]] — kept for the
    * spec that asserts the native expression matches it on non-null
    * elements.
    */
  private[graft] def firstEqualIndexHof(a: Column, b: Column): Column =
    // array_position returns 0 when absent, so the -1 shift yields the
    // same "not found" sentinel; a NULL array nulls both formulations
    array_position(zip_with(a, b, (x, y) => x <=> y), lit(true))
      .cast("int") - 1

  /** Reference HOF formulation of [[hyperplaneSignature]] — one
    * interpreted zip_with+aggregate fold per bit; kept for the spec
    * that asserts the native single-pass expression is bit-identical.
    */
  private[graft] def hyperplaneSignatureHof(v: Column, bits: Int,
      seed: Int = 0x5eed): Column = {
    require(bits >= 1 && bits <= 63, s"bits must be in [1,63], got $bits")
    val d = toDouble(v)
    val terms = (0 until bits).map { h =>
      // component weight for plane h at position i: xxhash64(seed,h,i)
      // scaled into [-1,1) — generated inline, never materialized
      val proj = aggregate(
        zip_with(d, sequence(lit(0), size(d) - 1), (x, i) =>
          x * (xxhash64(lit(seed), lit(h), i).cast(DoubleType) /
            lit(Long.MaxValue.toDouble))),
        lit(0.0), (acc, x) => acc + x)
      when(proj >= 0, lit(1L << h)).otherwise(lit(0L))
    }
    terms.reduce(_.bitwiseOR(_))
  }
}
