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

/** Misra–Gries heavy-hitter sketch as a `TypedImperativeAggregate`
  * (SURVEY F15): the bounded-memory answer to "which keys exceed n/k of
  * a 100 TB stream" — hot-key detection for skew planning (the F9/t13
  * salting decisions), vocabulary heads, abusive-source discovery. An
  * exact groupBy needs the full key cardinality in the shuffle; this
  * carries AT MOST k−1 counters per partition (merged pairwise), so
  * the shuffle payload is O(k) per partition at any corpus size —
  * partial-agg friendly like a sum.
  *
  * The classic guarantee (Misra–Gries 1982; mergeability per Agarwal
  * et al., "Mergeable summaries", PODS 2012): with capacity k−1, every
  * item with true count > n/k survives in the final summary, and each
  * reported estimate e satisfies true − n/k ≤ e ≤ true. The MERGE step
  * sums counters pointwise, then subtracts the k-th largest count and
  * drops non-positive entries — which preserves the additive n/k error
  * across any merge tree, so partial aggregation cannot break the
  * bound. The surviving candidate set (≤ k−1 items) is what feeds an
  * exact confirm pass: filter the corpus to the candidates (map-side,
  * broadcast) and count exactly — the sketch bounds the second pass's
  * key space, which is the whole point at scale.
  *
  * Estimates (not membership) depend on partitioning/merge order, like
  * any MG instance — the spec asserts the INVARIANTS (coverage +
  * error bound) rather than byte-stable output, plus exactness when
  * every count fits (distinct items < k).
  *
  * Item may be BIGINT or STRING (UTF8 binary order on ties, matching
  * `topk_by_score`).
  */
case class MisraGriesTopK(
    item: Expression,
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[mutable.HashMap[Any, Long]]
    with BoundedPerKeyBuffer {

  override def bufferBound: Int = k

  require(k >= 2, s"mg_topk: k must be >= 2, got $k")

  override def children: Seq[Expression] = Seq(item)

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
    if (item.dataType != LongType && item.dataType != StringType)
      TypeCheckResult.TypeCheckFailure(
        s"mg_topk: item must be BIGINT or STRING, got ${item.dataType.sql}")
    else TypeCheckResult.TypeCheckSuccess
  }

  override def nullable: Boolean = false

  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("item", item.dataType, nullable = false),
    StructField("est", LongType, nullable = false))), containsNull = false)

  override def prettyName: String = "mg_topk"

  private def isStringItem: Boolean = item.dataType == StringType

  private def compareItems(a: Any, b: Any): Int =
    if (isStringItem)
      a.asInstanceOf[UTF8String].compareTo(b.asInstanceOf[UTF8String])
    else java.lang.Long.compare(a.asInstanceOf[Long], b.asInstanceOf[Long])

  override def createAggregationBuffer(): mutable.HashMap[Any, Long] =
    mutable.HashMap.empty

  override def update(
      buf: mutable.HashMap[Any, Long],
      input: InternalRow): mutable.HashMap[Any, Long] = {
    val raw = item.eval(input)
    if (raw != null) {
      // UTF8String from an UnsafeRow aliases a reused buffer — copy
      // before it outlives this input row inside the map
      val key = raw match {
        case u: UTF8String => if (buf.contains(u)) u else u.copy()
        case other => other
      }
      buf.get(key) match {
        case Some(c) => buf(key) = c + 1
        case None if buf.size < k - 1 => buf(key) = 1L
        case None =>
          // decrement-all; amortized O(1) — each decrement is paid for
          // by a prior increment
          val dead = buf.iterator.collect {
            case (i, 1L) => i
          }.toList
          buf.mapValuesInPlace((_, c) => c - 1)
          dead.foreach(buf.remove)
      }
    }
    buf
  }

  override def merge(
      buf: mutable.HashMap[Any, Long],
      other: mutable.HashMap[Any, Long]): mutable.HashMap[Any, Long] = {
    other.foreach { case (i, c) =>
      buf(i) = buf.getOrElse(i, 0L) + c
    }
    if (buf.size > k - 1) {
      // subtract the k-th largest count, keep strictly positive —
      // the Agarwal et al. merge that preserves the n/k error bound
      val kth = buf.values.toArray.sortBy(-_).apply(k - 1)
      val dead = buf.iterator.collect {
        case (i, c) if c - kth <= 0 => i
      }.toList
      buf.mapValuesInPlace((_, c) => c - kth)
      dead.foreach(buf.remove)
    }
    buf
  }

  override def eval(buf: mutable.HashMap[Any, Long]): Any = {
    val sorted = buf.toSeq.sortWith { case ((ia, ca), (ib, cb)) =>
      if (ca != cb) ca > cb else compareItems(ia, ib) < 0
    }
    new GenericArrayData(sorted.map { case (i, c) =>
      InternalRow(i, c)
    }.toArray[Any])
  }

  override def serialize(buf: mutable.HashMap[Any, Long]): Array[Byte] = {
    val bytes = new ByteArrayOutputStream()
    val out = new DataOutputStream(bytes)
    out.writeInt(buf.size)
    buf.foreach { case (i, c) =>
      if (isStringItem) {
        val b = i.asInstanceOf[UTF8String].getBytes
        out.writeInt(b.length); out.write(b)
      } else out.writeLong(i.asInstanceOf[Long])
      out.writeLong(c)
    }
    out.flush()
    bytes.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): mutable.HashMap[Any, Long] = {
    val in = new DataInputStream(new java.io.ByteArrayInputStream(bytes))
    val buf = createAggregationBuffer()
    val n = in.readInt()
    (0 until n).foreach { _ =>
      val i: Any =
        if (isStringItem) {
          val len = in.readInt()
          val b = new Array[Byte](len)
          in.readFully(b)
          UTF8String.fromBytes(b)
        } else in.readLong()
      buf(i) = in.readLong()
    }
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): MisraGriesTopK =
    copy(mutableAggBufferOffset = newOffset)

  override def withNewInputAggBufferOffset(newOffset: Int): MisraGriesTopK =
    copy(inputAggBufferOffset = newOffset)

  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): MisraGriesTopK =
    copy(item = newChildren(0))
}

object MisraGriesTopK {

  /** `array<struct<item,est>>` (est desc, item asc) of the ≤ k−1
    * Misra–Gries survivors — guaranteed to contain every item with
    * frequency > n/k; shuffle carries ≤ k−1 counters per partition.
    */
  def mgTopK(item: Column, k: Int): Column =
    GraftBridge.column(
      MisraGriesTopK(GraftBridge.expression(item), k).toAggregateExpression())
}
