package graft.functions

import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression, UnaryExpression, XXH64}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.catalyst.expressions.UnsafeArrayData
import org.apache.spark.unsafe.types.UTF8String
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}

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

/** Native word-n-gram hash keys: split on single spaces, xxhash64 each
  * word, slide an n-window chaining xxhash64 over the word hashes —
  * the whole per-document pipeline in ONE primitive pass, replacing
  * the interpreted `transform(split(…), xxhash64)` +
  * `transform(sequence(…), i ⇒ xxhash64(element_at…))` HOF chain that
  * every shingle consumer (d2/d3/d4/d6/d7, t6, t11, p1) paid per row.
  *
  * Bit-identical to the HOF formulation (spec-asserted): the word hash
  * is Spark's `xxhash64(string)` (XXH64 over the UTF-8 bytes, seed
  * 42) and the gram key is Spark's `xxhash64(h₁,…,hₙ)` (hashLong
  * chain from seed 42), with `split(text, " ")` semantics (regex
  * split, limit −1: consecutive separators yield empty words, which
  * hash like any string). Fewer than n words ⇒ empty array — the
  * `when(size ≥ n, …)` guard of the HOF twins.
  *
  * @param distinctSorted true ⇒ sorted distinct keys (the
  *        `array_sort(array_distinct(…))` shingle-SET shape d2–d7
  *        consume); false ⇒ raw window order with duplicates (the
  *        explode-feed shape t6/t11 consume)
  */
case class WordGramHashes(child: Expression, n: Int,
    distinctSorted: Boolean)
    extends UnaryExpression with ExpectsInputTypes {

  require(n >= 1, s"gram size must be >= 1, got $n")

  override def inputTypes = Seq(StringType)

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def prettyName: String = "word_gram_hashes"

  def compute(u: UTF8String): ArrayData = {
    val words = u.toString.split(" ", -1)
    if (words.length < n)
      return UnsafeArrayData.fromPrimitiveArray(Array.emptyLongArray)
    val wh = new Array[Long](words.length)
    var i = 0
    while (i < words.length) {
      val w = UTF8String.fromString(words(i))
      wh(i) = XXH64.hashUnsafeBytes(w.getBaseObject, w.getBaseOffset,
        w.numBytes, 42L)
      i += 1
    }
    var grams = new Array[Long](words.length - n + 1)
    i = 0
    while (i < grams.length) {
      var h = 42L
      var k = 0
      while (k < n) { h = XXH64.hashLong(wh(i + k), h); k += 1 }
      grams(i) = h
      i += 1
    }
    if (distinctSorted) {
      java.util.Arrays.sort(grams)
      var out = 0
      i = 0
      while (i < grams.length) {
        if (out == 0 || grams(i) != grams(out - 1)) {
          grams(out) = grams(i); out += 1
        }
        i += 1
      }
      grams = java.util.Arrays.copyOf(grams, out)
    }
    UnsafeArrayData.fromPrimitiveArray(grams)
  }

  override def nullSafeEval(a: Any): Any =
    compute(a.asInstanceOf[UTF8String])

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    // per-doc work happens in [[compute]]; one virtual call per row is
    // noise next to the per-ELEMENT lambda dispatch it replaces
    val ref = ctx.addReferenceObj("wordGramHashes", this,
      classOf[WordGramHashes].getName)
    nullSafeCodeGen(ctx, ev, a => s"${ev.value} = $ref.compute($a);")
  }

  override protected def withNewChildInternal(
      newChild: Expression): WordGramHashes =
    copy(child = newChild)
}
