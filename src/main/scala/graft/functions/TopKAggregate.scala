package graft.functions

import java.nio.ByteBuffer

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/**
 * Bounded top-k as a native aggregate: keeps the k best (score DESC,
 * id ASC on ties) pairs in a size-capped heap.
 *
 * This is the operator that makes distributed top-k scale: because it is a
 * TypedImperativeAggregate, Catalyst runs it as partial + final — every
 * partition reduces its slice to ≤ k pairs map-side, and only those k-row
 * buffers cross the shuffle. A window row_number() formulation shuffles
 * every scored row; this shuffles k per partition per group. At 100 TB
 * corpus scale that is the difference between a shuffle of the corpus and
 * a shuffle of (partitions × k) rows.
 *
 * Deterministic by construction: total order (score DESC, id ASC), so ties
 * resolve identically everywhere — output equals the window formulation's.
 */
case class TopKPairs(
    scoreExpr: Expression,
    idExpr: Expression,
    kExpr: Expression,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[TopKBuffer] {

  private lazy val k: Int = kExpr.eval().asInstanceOf[Number].intValue()

  override def children: Seq[Expression] = Seq(scoreExpr, idExpr, kExpr)

  /** SQL-reachable (graft_topk), so malformed calls must fail ANALYSIS,
    * not throw ClassCastException mid-job on an executor. */
  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    import org.apache.spark.sql.catalyst.analysis.TypeCheckResult._
    if (scoreExpr.dataType != DoubleType)
      TypeCheckFailure(s"graft_topk score must be double, got ${scoreExpr.dataType.simpleString}")
    else if (idExpr.dataType != LongType)
      TypeCheckFailure(s"graft_topk id must be bigint, got ${idExpr.dataType.simpleString}")
    else if (!kExpr.foldable ||
        !Seq(ByteType, ShortType, IntegerType, LongType).contains(kExpr.dataType))
      TypeCheckFailure("graft_topk k must be an integer literal")
    else {
      val kv = kExpr.eval()
      if (kv == null || kv.asInstanceOf[Number].longValue() < 1L ||
          kv.asInstanceOf[Number].longValue() > Int.MaxValue.toLong - 1)
        TypeCheckFailure(s"graft_topk k must be in [1, ${Int.MaxValue - 1}], got $kv")
      else TypeCheckSuccess
    }
  }

  override def nullable: Boolean = false

  override def dataType: DataType = ArrayType(
    StructType(Seq(StructField("score", DoubleType), StructField("id", LongType))),
    containsNull = false)

  override def createAggregationBuffer(): TopKBuffer = new TopKBuffer(k)

  override def update(buf: TopKBuffer, input: InternalRow): TopKBuffer = {
    val s = scoreExpr.eval(input)
    val i = idExpr.eval(input)
    if (s != null && i != null)
      buf.offer(s.asInstanceOf[Double], i.asInstanceOf[Long])
    buf
  }

  override def merge(buf: TopKBuffer, other: TopKBuffer): TopKBuffer = {
    other.foreach((s, i) => buf.offer(s, i))
    buf
  }

  override def eval(buf: TopKBuffer): Any = {
    val sorted = buf.sortedBestFirst
    new GenericArrayData(sorted.map { case (s, i) =>
      InternalRow(s, i)
    }.toArray[Any])
  }

  override def serialize(buf: TopKBuffer): Array[Byte] = {
    val pairs = buf.sortedBestFirst
    val bb = ByteBuffer.allocate(4 + pairs.length * 16)
    bb.putInt(pairs.length)
    pairs.foreach { case (s, i) => bb.putDouble(s); bb.putLong(i) }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): TopKBuffer = {
    val bb = ByteBuffer.wrap(bytes)
    val n = bb.getInt
    val buf = new TopKBuffer(k)
    var j = 0
    while (j < n) { buf.offer(bb.getDouble, bb.getLong); j += 1 }
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): TopKPairs =
    copy(mutableAggBufferOffset = newOffset)

  override def withNewInputAggBufferOffset(newOffset: Int): TopKPairs =
    copy(inputAggBufferOffset = newOffset)

  override protected def withNewChildrenInternal(newChildren: IndexedSeq[Expression]): Expression =
    copy(scoreExpr = newChildren(0), idExpr = newChildren(1), kExpr = newChildren(2))
}

/** Size-capped heap; evicts the worst pair (lowest score, then highest id). */
final class TopKBuffer(k: Int) {
  // Ascending by (-score, id): "better" is smaller; the PriorityQueue's
  // max is therefore the WORST element, so dequeue() evicts it.
  private val worstFirst: Ordering[(Double, Long)] =
    Ordering.by[(Double, Long), (Double, Long)] { case (s, i) => (-s, i) }(
      Ordering.Tuple2(Ordering.Double.TotalOrdering, Ordering.Long))
  private val heap = scala.collection.mutable.PriorityQueue.empty[(Double, Long)](worstFirst)

  def offer(score: Double, id: Long): Unit = {
    if (heap.size < k) heap.enqueue((score, id))
    else if (worstFirst.lt((score, id), heap.head)) { // strictly better than current worst
      heap.dequeue(); heap.enqueue((score, id))
    }
  }

  def foreach(f: (Double, Long) => Unit): Unit = heap.foreach(p => f(p._1, p._2))

  def sortedBestFirst: Seq[(Double, Long)] =
    heap.toSeq.sortBy { case (s, i) => (-s, i) }
}
