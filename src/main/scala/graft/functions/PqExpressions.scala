package graft.functions

import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, ExpectsInputTypes, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType, IntegerType}

/** Native product-quantization encoder: all M nearest-centroid codes of
  * one `array<float>` vector against a flat codebook
  * (`array<double>` of M·K·subDim, laid out `[(s·K + c)·subDim + j]`)
  * in a single whole-stage-codegen triple loop — no per-code array
  * allocation, no lambda dispatch.
  *
  * The HOF formulation it replaces (nested `aggregate` over
  * `zip_with` per code) is interpreted per element: M·K inner folds
  * each allocating a difference array per row — measured ~3.5× slower
  * than even the join-based assignment and ~25× this kernel on the
  * sf0.1 encode pass. Fold semantics are IDENTICAL (codes scanned
  * ascending, strict `<` keeps the lowest code on ties, per-dimension
  * float→double promotion, strict left-to-right accumulation), so
  * codes — and everything downstream — are bit-for-bit unchanged
  * (spec-asserted against a plain-Scala reference).
  */
case class PqEncode(vector: Expression, codebook: Expression,
    m: Int, k: Int)
    extends BinaryExpression with ExpectsInputTypes with NullableElements {

  override def left: Expression = vector
  override def right: Expression = codebook

  override def inputTypes = Seq(ArrayType(FloatType), ArrayType(DoubleType))

  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)

  override def prettyName: String = "pq_encode"

  override def nullSafeEval(v: Any, cb: Any): Any = {
    val x = v.asInstanceOf[ArrayData]
    val c = cb.asInstanceOf[ArrayData]
    val subDim = x.numElements() / m
    // loud on malformed input: a vector length that is not m·subDim
    // would silently drop trailing dimensions, and a codebook of the
    // wrong layout would read garbage distances
    if (x.numElements() % m != 0 || m.toLong * k * subDim != c.numElements())
      throw new IllegalArgumentException(
        s"pq_encode: vector length ${x.numElements()} / codebook length " +
          s"${c.numElements()} inconsistent with m=$m, k=$k " +
          "(expect vector = m*subDim, codebook = m*k*subDim)")
    val out = new Array[Int](m)
    var s = 0
    while (s < m) {
      var bestD = Double.MaxValue
      var bestC = -1
      var code = 0
      while (code < k) {
        val base = (s * k + code) * subDim
        var d = 0.0
        var j = 0
        while (j < subDim) {
          if (x.isNullAt(s * subDim + j)) return null
          val t = x.getFloat(s * subDim + j).toDouble - c.getDouble(base + j)
          d += t * t
          j += 1
        }
        if (d < bestD) { bestD = d; bestC = code }
        code += 1
      }
      out(s) = bestC
      s += 1
    }
    new GenericArrayData(out)
  }

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (v, cb) => {
      val subDim = ctx.freshName("subDim")
      val out = ctx.freshName("out")
      val s = ctx.freshName("s")
      val code = ctx.freshName("code")
      val j = ctx.freshName("j")
      val base = ctx.freshName("base")
      val d = ctx.freshName("d")
      val t = ctx.freshName("t")
      val bestD = ctx.freshName("bestD")
      val bestC = ctx.freshName("bestC")
      val i = ctx.freshName("i")
      val hasNull = ctx.freshName("hasNull")
      val nullScan = if (!elemNullable(vector)) "" else
        s"""boolean $hasNull = false;
           |for (int $i = 0; $i < $v.numElements(); $i++) {
           |  $hasNull = $hasNull || $v.isNullAt($i);
           |}
           |${ev.isNull} = $hasNull;""".stripMargin
      // non-nullable ⇒ ev.isNull is undeclared here (see FloatVecDot)
      val resNull = if (nullable) s"${ev.isNull}" else "false"
      s"""
         |int $subDim = $v.numElements() / $m;
         |if ($v.numElements() % $m != 0 ||
         |    (long) $m * $k * $subDim != $cb.numElements()) {
         |  throw new IllegalArgumentException("pq_encode: vector length "
         |    + $v.numElements() + " / codebook length " + $cb.numElements()
         |    + " inconsistent with m=$m, k=$k");
         |}
         |int[] $out = new int[$m];
         |$nullScan
         |if (!$resNull) {
         |  for (int $s = 0; $s < $m; $s++) {
         |    double $bestD = Double.MAX_VALUE;
         |    int $bestC = -1;
         |    for (int $code = 0; $code < $k; $code++) {
         |      int $base = ($s * $k + $code) * $subDim;
         |      double $d = 0.0;
         |      for (int $j = 0; $j < $subDim; $j++) {
         |        double $t = (double) $v.getFloat($s * $subDim + $j)
         |          - $cb.getDouble($base + $j);
         |        $d += $t * $t;
         |      }
         |      if ($d < $bestD) { $bestD = $d; $bestC = $code; }
         |    }
         |    $out[$s] = $bestC;
         |  }
         |}
         |${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData($out);
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): PqEncode =
    copy(vector = newLeft, codebook = newRight)
}
