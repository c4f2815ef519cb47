package graft.functions

import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, ExpectsInputTypes, Expression, UnaryExpression, XXH64}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType, IntegerType, LongType}

/** Native Catalyst expression for the ANN/dedup hot path: dot product of
  * two `array<float>` columns as a primitive `while` loop inside
  * whole-stage codegen — no per-element boxing, no lambda dispatch, one
  * array traversal. ~20× the HOF (`zip_with`+`aggregate`) formulation on
  * the 12.5M-pair sf0.1 embedding join.
  *
  * The accumulation is float→double promotion, strict left-to-right —
  * EXACTLY the fold order of the HOF version it replaces, so results are
  * bit-identical and the DuckDB oracle parity of s1 is preserved.
  */
case class FloatVecDot(left: Expression, right: Expression)
    extends BinaryExpression with ExpectsInputTypes {

  // return type inferred: Seq[AbstractDataType] is private[sql]
  override def inputTypes = Seq(ArrayType(FloatType), ArrayType(FloatType))

  override def dataType: DataType = DoubleType

  override def prettyName: String = "float_vec_dot"

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    var s = 0.0
    var i = 0
    while (i < n) {
      s += x.getFloat(i).toDouble * y.getFloat(i).toDouble
      i += 1
    }
    s
  }

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val s = ctx.freshName("s")
      s"""
         |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |double $s = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  $s += (double) $a.getFloat($i) * (double) $b.getFloat($i);
         |}
         |${ev.value} = $s;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): FloatVecDot =
    copy(left = newLeft, right = newRight)
}

/** Native random-hyperplane LSH signature: all `bits` sign bits of one
  * table computed in a SINGLE traversal of the `array<float>` vector
  * inside whole-stage codegen. The HOF formulation it replaces ran one
  * interpreted `zip_with` + `aggregate` pair (with a fresh array
  * allocation) PER BIT — 128 lambda-dispatched folds per row at 8
  * tables × 8 bits, which became the d8/s2 bottleneck once the
  * occupancy-keyed width grew past the calibrated 4 bits (measured
  * ~40 s of a 51 s d8 run at n = 20 000).
  *
  * Bit-identical to the HOF version (spec-asserted): plane h's j-th
  * component is xxhash64(seed, h, j) — reproduced via the same chained
  * XXH64.hashInt links (default seed 42, then seed, then h, then j) —
  * scaled by / Long.MaxValue, multiplied against the float→double
  * promoted element, accumulated strictly left-to-right per plane, bit
  * set iff the projection is ≥ 0.
  */
case class HyperplaneSignature(child: Expression, bits: Int, seed: Int)
    extends UnaryExpression with ExpectsInputTypes {

  override def inputTypes = Seq(ArrayType(FloatType))

  override def dataType: DataType = LongType

  override def prettyName: String = "hyperplane_signature"

  // first two links of the xxhash64(seed, h, j) chain are plan-time
  // constants: fold them once per plane
  private lazy val planeSeeds: Array[Long] = {
    val s0 = XXH64.hashInt(seed, 42L)
    Array.tabulate(bits)(h => XXH64.hashInt(h, s0))
  }

  override def nullSafeEval(a: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val n = x.numElements()
    val acc = new Array[Double](bits)
    var i = 0
    while (i < n) {
      val v = x.getFloat(i).toDouble
      var h = 0
      while (h < bits) {
        acc(h) += v *
          (XXH64.hashInt(i, planeSeeds(h)).toDouble / Long.MaxValue.toDouble)
        h += 1
      }
      i += 1
    }
    var sig = 0L
    var h = 0
    while (h < bits) {
      if (acc(h) >= 0) sig |= 1L << h
      h += 1
    }
    sig
  }

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val seeds = ctx.addReferenceObj("planeSeeds", planeSeeds, "long[]")
      val xxh = classOf[XXH64].getName
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val h = ctx.freshName("h")
      val v = ctx.freshName("v")
      val acc = ctx.freshName("acc")
      val sig = ctx.freshName("sig")
      s"""
         |int $n = $a.numElements();
         |double[] $acc = new double[$bits];
         |for (int $i = 0; $i < $n; $i++) {
         |  double $v = (double) $a.getFloat($i);
         |  for (int $h = 0; $h < $bits; $h++) {
         |    $acc[$h] += $v * ((double) $xxh.hashInt($i, $seeds[$h])
         |      / (double) java.lang.Long.MAX_VALUE);
         |  }
         |}
         |long $sig = 0L;
         |for (int $h = 0; $h < $bits; $h++) {
         |  if ($acc[$h] >= 0) $sig |= 1L << $h;
         |}
         |${ev.value} = $sig;
       """.stripMargin
    })

  override protected def withNewChildInternal(
      newChild: Expression): HyperplaneSignature =
    copy(child = newChild)
}

/** Intersection COUNT of two SORTED-DISTINCT long arrays as one
  * allocation-free merge loop inside whole-stage codegen — the verify
  * kernel of the Jaccard self-join, where
  * `size(array_intersect(a, b))` built a hash set per candidate-pair
  * evaluation (and candidates with several shared prefix tokens are
  * verified redundantly, multiplying that allocation).
  *
  * Equal to `size(array_intersect(a, b))` whenever both inputs are
  * sorted distinct (the shingle-set invariant from WordGramHashes /
  * DedupOps.shingled; spec-asserted on real data) — callers own that
  * precondition.
  */
case class SortedLongIntersectCount(left: Expression, right: Expression)
    extends BinaryExpression with ExpectsInputTypes {

  override def inputTypes = Seq(ArrayType(LongType), ArrayType(LongType))

  override def dataType: DataType = IntegerType

  override def prettyName: String = "sorted_intersect_count"

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val nx = x.numElements()
    val ny = y.numElements()
    var i = 0
    var j = 0
    var c = 0
    while (i < nx && j < ny) {
      val vx = x.getLong(i)
      val vy = y.getLong(j)
      if (vx == vy) { c += 1; i += 1; j += 1 }
      else if (vx < vy) i += 1
      else j += 1
    }
    c
  }

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val j = ctx.freshName("j")
      val c = ctx.freshName("c")
      val nx = ctx.freshName("nx")
      val ny = ctx.freshName("ny")
      val vx = ctx.freshName("vx")
      val vy = ctx.freshName("vy")
      s"""
         |int $nx = $a.numElements();
         |int $ny = $b.numElements();
         |int $i = 0, $j = 0, $c = 0;
         |while ($i < $nx && $j < $ny) {
         |  long $vx = $a.getLong($i);
         |  long $vy = $b.getLong($j);
         |  if ($vx == $vy) { $c++; $i++; $j++; }
         |  else if ($vx < $vy) { $i++; } else { $j++; }
         |}
         |${ev.value} = $c;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): SortedLongIntersectCount =
    copy(left = newLeft, right = newRight)
}
