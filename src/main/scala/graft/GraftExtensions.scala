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
        val k = children(2) match {
          case org.apache.spark.sql.catalyst.expressions.Literal(v, _)
            if v != null => v.toString.toInt
          case other => throw new IllegalArgumentException(
            s"topk_by_score: k must be an integer literal, got $other")
        }
        graft.functions.TopKByScore(children(0), children(1), k)
      }))

  /** Register on a live session (temp functions, session-scoped). */
  def register(spark: SparkSession): Unit =
    functions.foreach { case (ident, _, builder) =>
      spark.sessionState.functionRegistry
        .createOrReplaceTempFunction(ident.funcName, builder, "built-in")
    }
}
