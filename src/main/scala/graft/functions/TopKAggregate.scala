package graft.functions

import java.io.{ByteArrayOutputStream, DataInputStream, DataOutputStream}

import scala.collection.mutable

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftBridge
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/** Bounded top-k as a custom `TypedImperativeAggregate` (SURVEY F5).
  *
  * Why it exists: `row_number().over(Window.partitionBy(g))` ships EVERY
  * row of a group to one reducer before discarding all but k — the
  * classic skew trap called out in SURVEY §6. This aggregate keeps a
  * ≤ k min-heap per partition and merges heaps, so the shuffle carries
  * at most k rows per (partition × group): top-k per group becomes
  * partial-aggregation-friendly like a sum.
  *
  * Ranking: score DESC, id ASC on ties (matching the window idiom
  * `orderBy(desc(score), asc(id))`). Output: `array<struct<score,id>>`
  * in rank order.
  */
case class TopKByScore(
    score: Expression,
    id: Expression,
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[mutable.PriorityQueue[(Double, Long)]] {

  require(k >= 1, s"k must be >= 1, got $k")

  override def children: Seq[Expression] = Seq(score, id)

  // update() casts eval results straight to Double/Long, so reject other
  // types at analysis time — via SQL `topk_by_score` a float score would
  // otherwise surface as an executor ClassCastException mid-job.
  // (checkInputDataTypes rather than ExpectsInputTypes: AbstractDataType
  // is private[sql] in Spark 4.1.)
  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
    if (score.dataType != DoubleType)
      TypeCheckResult.TypeCheckFailure(
        s"topk_by_score: score must be DOUBLE, got ${score.dataType.sql}")
    else if (id.dataType != LongType)
      TypeCheckResult.TypeCheckFailure(
        s"topk_by_score: id must be BIGINT, got ${id.dataType.sql}")
    else TypeCheckResult.TypeCheckSuccess
  }

  override def nullable: Boolean = false

  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("score", DoubleType, nullable = false),
    StructField("id", LongType, nullable = false))), containsNull = false)

  override def prettyName: String = "topk_by_score"

  // min-heap: head = WORST kept element under (score desc, id asc)
  private val worstFirst: Ordering[(Double, Long)] =
    Ordering.by[(Double, Long), (Double, Long)] { case (s, i) => (-s, i) }

  override def createAggregationBuffer(): mutable.PriorityQueue[(Double, Long)] =
    mutable.PriorityQueue.empty(worstFirst)

  override def update(
      buf: mutable.PriorityQueue[(Double, Long)],
      input: InternalRow): mutable.PriorityQueue[(Double, Long)] = {
    val s = score.eval(input)
    val i = id.eval(input)
    if (s != null && i != null)
      offer(buf, (s.asInstanceOf[Double], i.asInstanceOf[Long]))
    buf
  }

  override def merge(
      buf: mutable.PriorityQueue[(Double, Long)],
      other: mutable.PriorityQueue[(Double, Long)]): mutable.PriorityQueue[(Double, Long)] = {
    other.foreach(offer(buf, _))
    buf
  }

  private def offer(buf: mutable.PriorityQueue[(Double, Long)],
      e: (Double, Long)): Unit =
    if (buf.size < k) buf.enqueue(e)
    else if (worstFirst.compare(e, buf.head) < 0) { // e beats the worst
      buf.dequeue(); buf.enqueue(e)
    }

  override def eval(buf: mutable.PriorityQueue[(Double, Long)]): Any = {
    val sorted = buf.toSeq.sortBy { case (s, i) => (-s, i) }
    new GenericArrayData(sorted.map { case (s, i) =>
      InternalRow(s, i)
    }.toArray[Any])
  }

  override def serialize(buf: mutable.PriorityQueue[(Double, Long)]): Array[Byte] = {
    val bytes = new ByteArrayOutputStream()
    val out = new DataOutputStream(bytes)
    out.writeInt(buf.size)
    buf.foreach { case (s, i) => out.writeDouble(s); out.writeLong(i) }
    out.flush()
    bytes.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): mutable.PriorityQueue[(Double, Long)] = {
    val in = new DataInputStream(new java.io.ByteArrayInputStream(bytes))
    val buf = createAggregationBuffer()
    val n = in.readInt()
    (0 until n).foreach(_ => buf.enqueue((in.readDouble(), in.readLong())))
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): TopKByScore =
    copy(mutableAggBufferOffset = newOffset)

  override def withNewInputAggBufferOffset(newOffset: Int): TopKByScore =
    copy(inputAggBufferOffset = newOffset)

  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): TopKByScore =
    copy(score = newChildren(0), id = newChildren(1))
}

object TopKAggregate {

  /** `array<struct<score,id>>` of the k best (score desc, id asc) rows
    * per group — shuffle carries ≤ k rows per partition per group.
    */
  def topKByScore(score: Column, id: Column, k: Int): Column =
    GraftBridge.column(
      TopKByScore(GraftBridge.expression(score),
        GraftBridge.expression(id), k).toAggregateExpression())
}
