package graft.functions

import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, ExpectsInputTypes, Expression, UnaryExpression, XXH64}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType, IntegerType, LongType}

/** Shared element-null plumbing for the native array expressions: a NULL
  * array ELEMENT nulls the whole result, mirroring the HOF twins each
  * expression replaces (a null poisons `zip_with`/`aggregate` folds) —
  * parquet array columns default to `containsNull = true`, so element
  * nulls are reachable through every call site, including the
  * SQL-registered forms. The per-element check is emitted ONLY when a
  * child's array type declares `containsNull`; non-null-element schemas
  * keep the branch-free hot loop.
  */
private[functions] trait NullableElements { self: Expression =>
  protected def elemNullable(e: Expression): Boolean =
    !e.resolved || (e.dataType match {
      case ArrayType(_, cn) => cn
      case _ => true
    })
  protected def anyElementNullable: Boolean =
    children.exists(elemNullable)
  override def nullable: Boolean =
    children.exists(_.nullable) || anyElementNullable
}

/** Schema-level assertion that an array column's ELEMENTS are non-null:
  * re-declares `containsNull = false` (parquet always declares true) and
  * enforces it with ONE scan per row that throws a clear error on
  * violation — Spark's `AssertNotNull` pattern, one level down.
  *
  * This is the performance seam for the null-safe kernels above: their
  * per-ELEMENT null checks are correct but cost ~1.6× on the d5/s1 pair
  * join, where every row is re-read once per PAIR (n·n element checks).
  * Asserting once per ROW at the scan (n checks) lets every downstream
  * kernel see `containsNull = false` and emit its branch-free loop —
  * nullability is a schema contract, and codegen trusts the schema.
  */
case class KnownNonNullElements(child: Expression)
    extends UnaryExpression with ExpectsInputTypes {

  override def inputTypes = Seq(ArrayType)

  override def dataType: DataType = child.dataType match {
    case ArrayType(et, _) => ArrayType(et, containsNull = false)
    case dt => dt
  }

  override def prettyName: String = "known_non_null_elements"

  override def nullSafeEval(a: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val n = x.numElements()
    var i = 0
    while (i < n) {
      if (x.isNullAt(i)) KnownNonNullElements.failStatic()
      i += 1
    }
    x
  }

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val cls = classOf[KnownNonNullElements].getName
      s"""
         |int $n = $a.numElements();
         |for (int $i = 0; $i < $n; $i++) {
         |  if ($a.isNullAt($i)) $cls.failStatic();
         |}
         |${ev.value} = $a;
       """.stripMargin
    })

  override protected def withNewChildInternal(
      newChild: Expression): KnownNonNullElements =
    copy(child = newChild)
}

object KnownNonNullElements {
  // codegen entry point (instance methods aren't reachable from the
  // generated class without a reference object)
  def failStatic(): Unit = throw new IllegalStateException(
    "known_non_null_elements: null array element violates the " +
      "non-null-element contract")
}

/** Native Catalyst expression for the ANN/dedup hot path: dot product of
  * two `array<float>` columns as a primitive `while` loop inside
  * whole-stage codegen — no per-element boxing, no lambda dispatch, one
  * array traversal. ~20× the HOF (`zip_with`+`aggregate`) formulation on
  * the 12.5M-pair sf0.1 embedding join.
  *
  * The accumulation is float→double promotion, strict left-to-right —
  * EXACTLY the fold order of the HOF version it replaces, so results are
  * bit-identical and the DuckDB oracle parity of s1 is preserved. A null
  * ELEMENT nulls the result (the HOF twin's poison-fold semantics);
  * unequal lengths fold over the common prefix (the HOF twin instead
  * nulls via zip_with's padding — callers pass equal-dimension vectors).
  */
case class FloatVecDot(left: Expression, right: Expression)
    extends BinaryExpression with ExpectsInputTypes with NullableElements {

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
      if (x.isNullAt(i) || y.isNullAt(i)) return null
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
      val hasNull = ctx.freshName("hasNull")
      // null detection is a SEPARATE scan so the multiply-accumulate
      // loop keeps a single exit (a break in the FP loop measurably
      // defeats unrolling: ~1.6× on the d5 pair join)
      val nullScan = if (!anyElementNullable) "" else
        s"""boolean $hasNull = false;
           |for (int $i = 0; $i < $n; $i++) {
           |  $hasNull = $hasNull || $a.isNullAt($i) || $b.isNullAt($i);
           |}
           |${ev.isNull} = $hasNull;""".stripMargin
      // when the expression is non-nullable, ev.isNull is an UNDECLARED
      // name inside nullSafeCodeGen's result code — referencing it made
      // Janino reject the class and the whole stage silently fell back
      // to interpreted projection (caught by the width-compile gate)
      val resNull = if (nullable) s"${ev.isNull}" else "false"
      s"""
         |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |double $s = 0.0;
         |$nullScan
         |if (!$resNull) {
         |  for (int $i = 0; $i < $n; $i++) {
         |    $s += (double) $a.getFloat($i) * (double) $b.getFloat($i);
         |  }
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
    extends UnaryExpression with ExpectsInputTypes with NullableElements {

  // enforced HERE (not only in VectorFunctions.hyperplaneSignature) so
  // the SQL-registered form can't silently wrap `1L << h` at bits ≥ 64
  require(bits >= 1 && bits <= 63,
    s"hyperplane_signature: bits must be in [1, 63], got $bits")

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
      if (x.isNullAt(i)) return null
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
      val hasNull = ctx.freshName("hasNull")
      // separate null scan — keep the hash-accumulate loop single-exit
      // (same unrolling rationale as FloatVecDot)
      val nullScan = if (!anyElementNullable) "" else
        s"""boolean $hasNull = false;
           |for (int $i = 0; $i < $n; $i++) {
           |  $hasNull = $hasNull || $a.isNullAt($i);
           |}
           |${ev.isNull} = $hasNull;""".stripMargin
      // non-nullable ⇒ ev.isNull is undeclared here (see FloatVecDot)
      val resNull = if (nullable) s"${ev.isNull}" else "false"
      s"""
         |int $n = $a.numElements();
         |long $sig = 0L;
         |$nullScan
         |if (!$resNull) {
         |  double[] $acc = new double[$bits];
         |  for (int $i = 0; $i < $n; $i++) {
         |    double $v = (double) $a.getFloat($i);
         |    for (int $h = 0; $h < $bits; $h++) {
         |      $acc[$h] += $v * ((double) $xxh.hashInt($i, $seeds[$h])
         |        / (double) java.lang.Long.MAX_VALUE);
         |    }
         |  }
         |  for (int $h = 0; $h < $bits; $h++) {
         |    if ($acc[$h] >= 0) $sig |= 1L << $h;
         |  }
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
  * sorted distinct with NON-NULL elements (the shingle-set invariant
  * from WordGramHashes / DedupOps.shingled; spec-asserted on real data)
  * — callers own that precondition. A null ELEMENT (unreachable under
  * the invariant, but reachable via the SQL-registered form) nulls the
  * result rather than miscounting: `array_intersect` treats null as a
  * matchable value, but a null inside a "sorted distinct long array"
  * has no defined sort position, so no count is right.
  */
case class SortedLongIntersectCount(left: Expression, right: Expression)
    extends BinaryExpression with ExpectsInputTypes with NullableElements {

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
      if (x.isNullAt(i) || y.isNullAt(j)) return null
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
      val nullCheck = if (!anyElementNullable) "" else
        s"if ($a.isNullAt($i) || $b.isNullAt($j)) { ${ev.isNull} = true; break; }"
      s"""
         |int $nx = $a.numElements();
         |int $ny = $b.numElements();
         |int $i = 0, $j = 0, $c = 0;
         |while ($i < $nx && $j < $ny) {
         |  $nullCheck
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

/** First index at which two long arrays hold EQUAL values (-1 if none;
  * scan stops at the shorter length) — one primitive loop inside
  * whole-stage codegen.
  *
  * This is the multi-table LSH dedup kernel: a pair colliding in k of
  * the L signature tables comes out of the bucket self-join k times, and
  * `first_equal_index(a.sigs, b.sigs) = table` keeps exactly the FIRST
  * collision — a per-row filter that replaces a `distinct` over the full
  * candidate-pair set (a 13.5M-row shuffle at sf1 that removed only the
  * 4.5% multi-table duplicates; the filter costs ≤ L long compares per
  * raw candidate and shuffles nothing). Equal to
  * `array_position(zip_with(a, b, (x, y) => x <=> y), true) - 1` for
  * non-null elements (spec-asserted). The scan is in index order and
  * stops at the first equality: a null ELEMENT encountered before it
  * nulls the result (a null signature has no defined position, unlike
  * the HOF's never-matches `<=>`); elements past the first equality are
  * never examined.
  */
case class FirstEqualIndex(left: Expression, right: Expression)
    extends BinaryExpression with ExpectsInputTypes with NullableElements {

  override def inputTypes = Seq(ArrayType(LongType), ArrayType(LongType))

  override def dataType: DataType = IntegerType

  override def prettyName: String = "first_equal_index"

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    var i = 0
    while (i < n) {
      if (x.isNullAt(i) || y.isNullAt(i)) return null
      if (x.getLong(i) == y.getLong(i)) return i
      i += 1
    }
    -1
  }

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val r = ctx.freshName("r")
      val nullCheck = if (!anyElementNullable) "" else
        s"if ($a.isNullAt($i) || $b.isNullAt($i)) { ${ev.isNull} = true; break; }"
      s"""
         |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |int $r = -1;
         |for (int $i = 0; $i < $n; $i++) {
         |  $nullCheck
         |  if ($a.getLong($i) == $b.getLong($i)) { $r = $i; break; }
         |}
         |${ev.value} = $r;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): FirstEqualIndex =
    copy(left = newLeft, right = newRight)
}

/** Stable hot-token demotion over a SORTED DISTINCT long array: returns
  * the same elements reordered as (elements ∉ `hot`, in their original
  * ascending order) ++ (elements ∈ `hot`, in ascending order) — the
  * token order behind [[graft.operators.JaccardNearDup]]'s hot-demoted
  * prefix arm. `hot` is a driver-collected SORTED array (the Zipf head
  * of the corpus vocabulary, bounded — see the caller), carried as a
  * reference object, so membership is a two-pointer MERGE against the
  * row's own sorted array: O(n + log|hot|·(first seek)) per row,
  * allocation-free until the output copy. The result is a deterministic
  * TOTAL order on tokens (rare: (0, tok); hot: (1, tok)), identical for
  * every row — which is all PPJoin's prefix bound needs.
  *
  * Null ELEMENTS null the result (the [[SortedLongIntersectCount]]
  * contract: a null inside a "sorted distinct long array" has no
  * defined order position).
  */
case class DemoteHotTokens(child: Expression, hot: LongArrayParam)
    extends UnaryExpression with ExpectsInputTypes with NullableElements {

  // `hot` is a LongArrayParam, not a raw Array: a case-class Array
  // field compares by reference identity, which defeats expression
  // canonicalization/CSE (two semantically-equal DemoteHotTokens would
  // never compare equal). A plain Seq fixes equality but poisons
  // PLANNING: Catalyst's tree transforms hash/compare expression nodes
  // constantly, and an O(|hot|) hashCode on a 65536-entry field
  // measured d2 at sf10 12.7 → 74 s. The wrapper caches its hash and
  // short-circuits equals on reference, keeping structural semantics
  // at O(1) hot-path cost.
  private def hotArr: Array[Long] = hot.values

  override def inputTypes = Seq(ArrayType(LongType))

  override def dataType: DataType =
    ArrayType(LongType, containsNull = false)

  override def prettyName: String = "demote_hot_tokens"

  override def nullSafeEval(a: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val n = x.numElements()
    val out = new Array[Long](n)
    val hotBuf = new Array[Long](n)
    var r = 0
    var h = 0
    var hi = 0
    var i = 0
    while (i < n) {
      if (x.isNullAt(i)) return null
      val v = x.getLong(i)
      while (hi < hotArr.length && hotArr(hi) < v) hi += 1
      if (hi < hotArr.length && hotArr(hi) == v) { hotBuf(h) = v; h += 1 }
      else { out(r) = v; r += 1 }
      i += 1
    }
    var j = 0
    while (j < h) { out(r + j) = hotBuf(j); j += 1 }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(out)
  }

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val hotRef = ctx.addReferenceObj("hotSet", hotArr, "long[]")
      val n = ctx.freshName("n")
      val out = ctx.freshName("out")
      val hotBuf = ctx.freshName("hotBuf")
      val r = ctx.freshName("r")
      val h = ctx.freshName("h")
      val hi = ctx.freshName("hi")
      val i = ctx.freshName("i")
      val v = ctx.freshName("v")
      val j = ctx.freshName("j")
      val brk = ctx.freshName("demoteLoop")
      // ev.isNull exists only when some child is nullable; element
      // nulls on a non-nullable child are a contract violation we
      // cannot signal through isNull — emit the check only when the
      // name is declared (the r12 undeclared-ev.isNull hazard)
      val nullCheck =
        if (!anyElementNullable) ""
        else if (nullable)
          s"if ($a.isNullAt($i)) { ${ev.isNull} = true; break $brk; }"
        else ""
      s"""
         |int $n = $a.numElements();
         |long[] $out = new long[$n];
         |long[] $hotBuf = new long[$n];
         |int $r = 0, $h = 0, $hi = 0;
         |$brk:
         |for (int $i = 0; $i < $n; $i++) {
         |  $nullCheck
         |  long $v = $a.getLong($i);
         |  while ($hi < $hotRef.length && $hotRef[$hi] < $v) $hi++;
         |  if ($hi < $hotRef.length && $hotRef[$hi] == $v) {
         |    $hotBuf[$h++] = $v;
         |  } else {
         |    $out[$r++] = $v;
         |  }
         |}
         |for (int $j = 0; $j < $h; $j++) { $out[$r + $j] = $hotBuf[$j]; }
         |${ev.value} =
         |  org.apache.spark.sql.catalyst.expressions.UnsafeArrayData
         |    .fromPrimitiveArray($out);
       """.stripMargin
    })

  override protected def withNewChildInternal(
      newChild: Expression): DemoteHotTokens = copy(child = newChild)
}
