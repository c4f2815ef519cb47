package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

import graft.functions.FloatVecDot

/** Session extension point: registers graft's native Catalyst
  * expressions as SQL functions, so `spark.sql` users get the codegen'd
  * hot paths too:
  *
  *   spark-submit --conf spark.sql.extensions=graft.GraftExtensions …
  *   SELECT vec_dot(a.embedding, b.embedding) FROM …
  *
  * For an already-running session (tests, notebooks) use
  * [[GraftExtensions.register]].
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {

  override def apply(ext: SparkSessionExtensions): Unit =
    GraftExtensions.functions.foreach(ext.injectFunction)
}

object GraftExtensions {

  private type FunctionDescription =
    (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression)

  private def info(name: String, usage: String): ExpressionInfo =
    new ExpressionInfo(classOf[FloatVecDot].getName, null, name, usage,
      "", "", "", "", "", "", "built-in")

  val functions: Seq[FunctionDescription] = Seq(
    (FunctionIdentifier("vec_dot"),
      info("vec_dot",
        "vec_dot(a, b) - dot product of two float vectors (double fold)"),
      (children: Seq[Expression]) => FloatVecDot(children(0), children(1))),
    (FunctionIdentifier("vec_cosine"),
      info("vec_cosine",
        "vec_cosine(a, b) - cosine similarity of two float vectors " +
          "(same fold order as the DataFrame-side cosine)"),
      (children: Seq[Expression]) => {
        import org.apache.spark.sql.catalyst.expressions.{Divide, Multiply, Sqrt}
        val (a, b) = (children(0), children(1))
        Divide(FloatVecDot(a, b),
          Multiply(Sqrt(FloatVecDot(a, a)), Sqrt(FloatVecDot(b, b))))
      }),
    (FunctionIdentifier("topk_by_score"),
      info("topk_by_score",
        "topk_by_score(score, id, k) - partial-agg top-k as array<struct<score,id>>"),
      (children: Seq[Expression]) => {
        val k = intLit(children(2), "topk_by_score: k")
        graft.functions.TopKByScore(children(0), children(1), k)
      }),
    (FunctionIdentifier("hyperplane_signature"),
      info("hyperplane_signature",
        "hyperplane_signature(vec, bits, seed) - random-hyperplane LSH " +
          "signature of a float vector, all bits in one pass"),
      (children: Seq[Expression]) =>
        graft.functions.HyperplaneSignature(children(0),
          intLit(children(1), "hyperplane_signature: bits"),
          intLit(children(2), "hyperplane_signature: seed"))),
    (FunctionIdentifier("rolling_hash"),
      info("rolling_hash",
        "rolling_hash(text, init, mult, mod) - polynomial rolling hash " +
          "over the string's code points"),
      (children: Seq[Expression]) =>
        graft.functions.RollingHash(children(0),
          longLit(children(1), "rolling_hash: init"),
          longLit(children(2), "rolling_hash: mult"),
          longLit(children(3), "rolling_hash: mod"))),
    (FunctionIdentifier("word_gram_hashes"),
      info("word_gram_hashes",
        "word_gram_hashes(text, n, distinct_sorted) - hashed word-n-gram " +
          "keys (xxhash64 chain) as array<bigint>"),
      (children: Seq[Expression]) =>
        graft.functions.WordGramHashes(children(0),
          intLit(children(1), "word_gram_hashes: n"),
          boolLit(children(2), "word_gram_hashes: distinct_sorted"))),
    (FunctionIdentifier("sorted_intersect_count"),
      info("sorted_intersect_count",
        "sorted_intersect_count(a, b) - intersection count of two " +
          "sorted-distinct bigint arrays (merge loop)"),
      (children: Seq[Expression]) =>
        graft.functions.SortedLongIntersectCount(children(0), children(1))),
    (FunctionIdentifier("first_equal_index"),
      info("first_equal_index",
        "first_equal_index(a, b) - first index where two bigint arrays " +
          "hold equal values, -1 if none (multi-table LSH dedup filter)"),
      (children: Seq[Expression]) =>
        graft.functions.FirstEqualIndex(children(0), children(1))),
    (FunctionIdentifier("mg_topk"),
      info("mg_topk",
        "mg_topk(item, k) - Misra-Gries heavy-hitter sketch: the <= k-1 " +
          "survivors as array<struct<item,est>>; every item with " +
          "frequency > n/k is guaranteed present"),
      (children: Seq[Expression]) => {
        val k = intLit(children(1), "mg_topk: k")
        graft.functions.MisraGriesTopK(children(0), k).toAggregateExpression()
      }))

  private def lit(e: Expression, what: String): Any = e match {
    case org.apache.spark.sql.catalyst.expressions.Literal(v, _)
      if v != null => v
    case other => throw new IllegalArgumentException(
      s"$what must be a literal, got $other")
  }
  private def intLit(e: Expression, what: String): Int =
    lit(e, what).toString.toInt
  private def longLit(e: Expression, what: String): Long =
    lit(e, what).toString.toLong
  private def boolLit(e: Expression, what: String): Boolean =
    lit(e, what).toString.toBoolean

  /** Register on a live session (temp functions, session-scoped). */
  def register(spark: SparkSession): Unit =
    functions.foreach { case (ident, _, builder) =>
      spark.sessionState.functionRegistry
        .createOrReplaceTempFunction(ident.funcName, builder, "built-in")
    }
}
