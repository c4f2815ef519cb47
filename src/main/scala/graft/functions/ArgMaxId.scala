package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftBridge
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.aggregate.DeclarativeAggregate
import org.apache.spark.sql.types.{DataType, DoubleType, LongType}

/** Fixed-width argmax: the id whose score is greatest, ties broken by
  * the SMALLEST id — the `(score desc, id asc)` rank rule every graft
  * ranking op shares (SURVEY F20).
  *
  * Why not `max_by(id, struct(score, -id))`: MaxBy's aggregation
  * buffer holds the struct ordering value, and a struct is not an
  * UnsafeRow-mutable field type, so every aggregate containing it is
  * planned as a SortAggregate pair — the partial side SORTS (and at
  * corpus scale, spills) the aggregate's ENTIRE input before reducing
  * it. For the nearest-centroid assignment that input is the
  * n×cells scored cross join (~n^1.5 wide rows): at sf10 the partial
  * sort buffers ~100 GB that a hash aggregate never materializes.
  * This aggregate's buffer is exactly (DoubleType, LongType) — both
  * mutable UnsafeRow fields — so the plan is HashAggregateExec with
  * map-side combine and the cross join streams straight into the
  * probe of an n-entry hash map (plan-gated in PlanSpec).
  *
  * Semantics notes (spec-asserted equal to the struct-max_by
  * formulation in ArgMaxIdSpec):
  *  - null score or id rows are skipped (max_by skips null ordering
  *    values the same way);
  *  - comparisons are IEEE `>`/`==` — a NaN score is never selected,
  *    where struct-ordering max_by would rank NaN greatest. Cosines
  *    of finite non-zero vectors are never NaN; callers feeding
  *    arbitrary doubles must filter NaN first.
  *  - an all-null (or empty) group evaluates to null.
  */
case class ArgMaxIdByScore(score: Expression, id: Expression)
    extends DeclarativeAggregate {

  override def children: Seq[Expression] = Seq(score, id)
  override def nullable: Boolean = true
  override def dataType: DataType = LongType
  override def prettyName: String = "argmax_id_by_score"

  override def checkInputDataTypes(): TypeCheckResult =
    if (score.dataType != DoubleType)
      TypeCheckResult.TypeCheckFailure(
        s"$prettyName: score must be DOUBLE, got ${score.dataType.sql}")
    else if (id.dataType != LongType)
      TypeCheckResult.TypeCheckFailure(
        s"$prettyName: id must be BIGINT, got ${id.dataType.sql}")
    else TypeCheckResult.TypeCheckSuccess

  private lazy val bestScore =
    AttributeReference("bestScore", DoubleType)()
  private lazy val bestId = AttributeReference("bestId", LongType)()

  override lazy val aggBufferAttributes: Seq[AttributeReference] =
    Seq(bestScore, bestId)

  override lazy val initialValues: Seq[Expression] =
    Seq(Literal.create(null, DoubleType), Literal.create(null, LongType))

  /** (s, i) beats (bs, bi) under (score desc, id asc); null (bs, bi)
    * means "empty so far" and always loses to a non-null challenger.
    */
  private def beats(s: Expression, i: Expression,
      bs: Expression, bi: Expression): Expression =
    And(And(IsNotNull(s), IsNotNull(i)),
      Or(IsNull(bs),
        Or(GreaterThan(s, bs), And(EqualTo(s, bs), LessThan(i, bi)))))

  override lazy val updateExpressions: Seq[Expression] = {
    val win = beats(score, id, bestScore, bestId)
    Seq(If(win, score, bestScore), If(win, id, bestId))
  }

  override lazy val mergeExpressions: Seq[Expression] = {
    val win = beats(bestScore.right, bestId.right,
      bestScore.left, bestId.left)
    Seq(If(win, bestScore.right, bestScore.left),
      If(win, bestId.right, bestId.left))
  }

  override lazy val evaluateExpression: Expression = bestId

  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): Expression =
    copy(score = newChildren(0), id = newChildren(1))
}

object ArgMaxId {
  /** `argmax_id_by_score(score, id)` as a Column aggregate. */
  def argMaxIdByScore(score: Column, id: Column): Column =
    GraftBridge.column(
      ArgMaxIdByScore(GraftBridge.expression(score),
        GraftBridge.expression(id)).toAggregateExpression())
}
