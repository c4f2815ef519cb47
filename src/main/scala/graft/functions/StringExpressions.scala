package graft.functions

import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.unsafe.types.UTF8String
import org.apache.spark.sql.types.{DataType, LongType, StringType}

/** Native polynomial rolling hash over a string's code points:
  * acc ← (acc·mult + codePoint) % mod, one primitive loop inside
  * whole-stage codegen. Replaces the HOF formulation
  * `aggregate(transform(split(text, ""), ascii), init, …)`, which
  * materializes one single-character STRING per input character and
  * runs an interpreted lambda pair per step — the t4 fingerprint
  * bottleneck at scale (measured ~8 s for 50 000 docs; the native loop
  * is pure integer math on the decoded text).
  *
  * Matches the HOF version exactly on any text (spec-asserted):
  * `split(text, "")` yields one single-code-point string per character
  * and `ascii` returns that code point; the empty string yields one
  * `[""]` element with ascii 0, reproduced here by folding a single 0.
  */
case class RollingHash(child: Expression, init: Long, mult: Long, mod: Long)
    extends UnaryExpression with ExpectsInputTypes {

  override def inputTypes = Seq(StringType)

  override def dataType: DataType = LongType

  override def prettyName: String = "rolling_hash"

  override def nullSafeEval(a: Any): Any = {
    val s = a.asInstanceOf[UTF8String].toString
    var acc = init
    if (s.isEmpty) acc = (acc * mult) % mod
    else {
      var i = 0
      while (i < s.length) {
        val cp = s.codePointAt(i)
        acc = (acc * mult + cp) % mod
        i += Character.charCount(cp)
      }
    }
    acc
  }

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val s = ctx.freshName("s")
      val acc = ctx.freshName("acc")
      val i = ctx.freshName("i")
      val cp = ctx.freshName("cp")
      s"""
         |java.lang.String $s = $a.toString();
         |long $acc = ${init}L;
         |if ($s.isEmpty()) {
         |  $acc = ($acc * ${mult}L) % ${mod}L;
         |} else {
         |  int $i = 0;
         |  while ($i < $s.length()) {
         |    int $cp = $s.codePointAt($i);
         |    $acc = ($acc * ${mult}L + $cp) % ${mod}L;
         |    $i += java.lang.Character.charCount($cp);
         |  }
         |}
         |${ev.value} = $acc;
       """.stripMargin
    })

  override protected def withNewChildInternal(
      newChild: Expression): RollingHash =
    copy(child = newChild)
}
