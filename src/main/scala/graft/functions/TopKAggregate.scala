package graft.functions

import java.io.{ByteArrayOutputStream, DataInputStream, DataOutputStream}

import scala.collection.mutable

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftBridge
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

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
  * `orderBy(desc(score), asc(id))`). The id may be BIGINT (q5/q7 keys)
  * or STRING (t5 vocabulary words) — string ties compare in UTF8 binary
  * order, which is what both Spark's and DuckDB's default (C/binary)
  * string ordering produce for ASCII word data. Output:
  * `array<struct<score,id>>` in rank order.
  */
case class TopKByScore(
    score: Expression,
    id: Expression,
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[mutable.PriorityQueue[(Double, Any)]]
    with BoundedPerKeyBuffer {

  override def bufferBound: Int = k

  require(k >= 1, s"k must be >= 1, got $k")

  override def children: Seq[Expression] = Seq(score, id)

  // update() casts eval results straight to Double/Long|UTF8String, so
  // reject other types at analysis time — via SQL `topk_by_score` a
  // float score would otherwise surface as an executor
  // ClassCastException mid-job. (checkInputDataTypes rather than
  // ExpectsInputTypes: AbstractDataType is private[sql] in Spark 4.1.)
  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
    if (score.dataType != DoubleType)
      TypeCheckResult.TypeCheckFailure(
        s"topk_by_score: score must be DOUBLE, got ${score.dataType.sql}")
    else if (id.dataType != LongType && id.dataType != StringType)
      TypeCheckResult.TypeCheckFailure(
        s"topk_by_score: id must be BIGINT or STRING, got ${id.dataType.sql}")
    else TypeCheckResult.TypeCheckSuccess
  }

  override def nullable: Boolean = false

  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("score", DoubleType, nullable = false),
    StructField("id", id.dataType, nullable = false))), containsNull = false)

  override def prettyName: String = "topk_by_score"

  private def isStringId: Boolean = id.dataType == StringType

  private def compareIds(a: Any, b: Any): Int =
    if (isStringId) a.asInstanceOf[UTF8String].compareTo(b.asInstanceOf[UTF8String])
    else java.lang.Long.compare(a.asInstanceOf[Long], b.asInstanceOf[Long])

  // min-heap: head = WORST kept element under (score desc, id asc)
  private val worstFirst: Ordering[(Double, Any)] =
    new Ordering[(Double, Any)] {
      override def compare(x: (Double, Any), y: (Double, Any)): Int = {
        val c = java.lang.Double.compare(y._1, x._1) // score desc
        if (c != 0) c else compareIds(x._2, y._2) // id asc
      }
    }

  override def createAggregationBuffer(): mutable.PriorityQueue[(Double, Any)] =
    mutable.PriorityQueue.empty(worstFirst)

  override def update(
      buf: mutable.PriorityQueue[(Double, Any)],
      input: InternalRow): mutable.PriorityQueue[(Double, Any)] = {
    val s = score.eval(input)
    val i = id.eval(input)
    if (s != null && i != null) {
      // UTF8String from an UnsafeRow aliases a reused buffer — copy
      // before the value outlives this input row inside the heap
      val key = i match {
        case u: UTF8String => u.copy()
        case other => other
      }
      offer(buf, (s.asInstanceOf[Double], key))
    }
    buf
  }

  override def merge(
      buf: mutable.PriorityQueue[(Double, Any)],
      other: mutable.PriorityQueue[(Double, Any)]): mutable.PriorityQueue[(Double, Any)] = {
    other.foreach(offer(buf, _))
    buf
  }

  private def offer(buf: mutable.PriorityQueue[(Double, Any)],
      e: (Double, Any)): Unit =
    if (buf.size < k) buf.enqueue(e)
    else if (worstFirst.compare(e, buf.head) < 0) { // e beats the worst
      buf.dequeue(); buf.enqueue(e)
    }

  override def eval(buf: mutable.PriorityQueue[(Double, Any)]): Any = {
    // ascending under worstFirst = best (rank 1) first
    val sorted = buf.toSeq.sorted(worstFirst)
    new GenericArrayData(sorted.map { case (s, i) =>
      InternalRow(s, i)
    }.toArray[Any])
  }

  override def serialize(buf: mutable.PriorityQueue[(Double, Any)]): Array[Byte] = {
    val bytes = new ByteArrayOutputStream()
    val out = new DataOutputStream(bytes)
    out.writeInt(buf.size)
    buf.foreach { case (s, i) =>
      out.writeDouble(s)
      if (isStringId) {
        val b = i.asInstanceOf[UTF8String].getBytes
        out.writeInt(b.length); out.write(b)
      } else out.writeLong(i.asInstanceOf[Long])
    }
    out.flush()
    bytes.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): mutable.PriorityQueue[(Double, Any)] = {
    val in = new DataInputStream(new java.io.ByteArrayInputStream(bytes))
    val buf = createAggregationBuffer()
    val n = in.readInt()
    (0 until n).foreach { _ =>
      val s = in.readDouble()
      val i: Any =
        if (isStringId) {
          val len = in.readInt()
          val b = new Array[Byte](len)
          in.readFully(b)
          UTF8String.fromBytes(b)
        } else in.readLong()
      buf.enqueue((s, i))
    }
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
    * `id` may be BIGINT or STRING.
    */
  def topKByScore(score: Column, id: Column, k: Int): Column =
    GraftBridge.column(
      TopKByScore(GraftBridge.expression(score),
        GraftBridge.expression(id), k).toAggregateExpression())
}
