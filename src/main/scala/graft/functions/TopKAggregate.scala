package graft.functions

import java.nio.ByteBuffer

import scala.collection.mutable

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftExpressionBridge
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._

/** Bounded per-group top-k aggregate over `struct(score double,
  * id bigint)` rows: each partial buffer is a k-capped heap, so the
  * shuffle carries at most k rows per (group, partition) instead of
  * every scored row — the aggregation-based alternative to
  * `row_number().over(Window)` (which must sort whole partitions).
  * This is what keeps per-query ANN top-k viable when |corpus| per
  * query is millions: partial aggregation collapses the candidate
  * stream map-side.
  *
  * Result: `array<struct<score double, id bigint>>`, best-first,
  * deterministic (ties broken by smaller id).
  */
case class TopKByScore(
    child: Expression,
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[mutable.PriorityQueue[(Double, Long)]] {

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = false
  override def prettyName: String = "top_k_by_score"
  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("score", DoubleType, nullable = false),
    StructField("id", LongType, nullable = false))), containsNull = false)

  // max-heap whose head is the WORST element (lowest score, then
  // largest id) so exceeding k pops the loser in O(log k)
  private def worstFirst: Ordering[(Double, Long)] =
    Ordering.by(p => (-p._1, p._2))

  override def createAggregationBuffer(): mutable.PriorityQueue[(Double, Long)] =
    mutable.PriorityQueue.empty(worstFirst)

  private def push(buf: mutable.PriorityQueue[(Double, Long)],
      e: (Double, Long)): Unit = {
    if (buf.size < k) buf.enqueue(e)
    else if (worstFirst.lt(e, buf.head)) { buf.dequeue(); buf.enqueue(e) }
  }

  override def update(buf: mutable.PriorityQueue[(Double, Long)],
      input: InternalRow): mutable.PriorityQueue[(Double, Long)] = {
    val v = child.eval(input)
    if (v != null) {
      val row = v.asInstanceOf[InternalRow]
      push(buf, (row.getDouble(0), row.getLong(1)))
    }
    buf
  }

  override def merge(b1: mutable.PriorityQueue[(Double, Long)],
      b2: mutable.PriorityQueue[(Double, Long)]): mutable.PriorityQueue[(Double, Long)] = {
    b2.foreach(push(b1, _))
    b1
  }

  override def eval(buf: mutable.PriorityQueue[(Double, Long)]): Any = {
    val best = buf.toArray.sortBy(p => (-p._1, p._2))
    new GenericArrayData(best.map { case (s, id) =>
      new GenericInternalRow(Array[Any](s, id))
    })
  }

  override def serialize(buf: mutable.PriorityQueue[(Double, Long)]): Array[Byte] = {
    val arr = buf.toArray
    val bb = ByteBuffer.allocate(4 + 16 * arr.length)
    bb.putInt(arr.length)
    arr.foreach { case (s, id) => bb.putDouble(s); bb.putLong(id) }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): mutable.PriorityQueue[(Double, Long)] = {
    val bb = ByteBuffer.wrap(bytes)
    val n = bb.getInt
    val buf = createAggregationBuffer()
    (0 until n).foreach(_ => buf.enqueue((bb.getDouble, bb.getLong)))
    buf
  }

  override def withNewMutableAggBufferOffset(n: Int): TopKByScore =
    copy(mutableAggBufferOffset = n)
  override def withNewInputAggBufferOffset(n: Int): TopKByScore =
    copy(inputAggBufferOffset = n)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): Expression =
    copy(child = newChildren.head)
}

object TopKByScore {
  /** Column helper: `top_k_by_score(struct(score, id), k)`. */
  def top_k_by_score(scoreIdStruct: Column, k: Int): Column =
    GraftExpressionBridge.column(
      TopKByScore(GraftExpressionBridge.expression(scoreIdStruct), k)
        .toAggregateExpression())
}
