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

/** Bounded per-group k-SMALLEST aggregate over `struct(key bigint,
  * id bigint, payload bigint)` rows, ordered by the EXACT 64-bit pair
  * (key, id) ascending. The integer-keyed sibling of
  * [[TopKByScore]]: that one ranks by a double score, which cannot
  * carry the repo's 60-bit salted-md5 ranks (doubles collapse above
  * 2^53, so hash order would diverge from DuckDB's exact BIGINT
  * comparison); this one compares longs, so selection is bit-identical
  * to `ORDER BY key, id LIMIT k` in any engine.
  *
  * Each partial buffer is a k-capped heap, so the shuffle carries at
  * most k rows per (group, partition) instead of every row — the
  * aggregation-based replacement for
  * `row_number().over(Window.partitionBy(g).orderBy(key, id))`, whose
  * window partitions cannot be split by AQE and send every row of the
  * hottest group to one reducer. `payload` rides along untouched
  * (e.g. n_chars), so downstream stats need no join-back.
  *
  * Result: `array<struct<key bigint, id bigint, payload bigint>>`,
  * ascending by (key, id); total order because id is unique per group.
  */
case class BottomKByKey(
    child: Expression,
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[mutable.PriorityQueue[(Long, Long, Long)]] {

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = false
  override def prettyName: String = "bottom_k_by_key"
  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("key", LongType, nullable = false),
    StructField("id", LongType, nullable = false),
    StructField("payload", LongType, nullable = false))),
    containsNull = false)

  // max-heap whose head is the WORST kept element (largest (key, id))
  // so exceeding k pops the loser in O(log k)
  private def byKeyId: Ordering[(Long, Long, Long)] =
    Ordering.by(p => (p._1, p._2))

  override def createAggregationBuffer(): mutable.PriorityQueue[(Long, Long, Long)] =
    mutable.PriorityQueue.empty(byKeyId)

  private def push(buf: mutable.PriorityQueue[(Long, Long, Long)],
      e: (Long, Long, Long)): Unit = {
    if (buf.size < k) buf.enqueue(e)
    else if (byKeyId.lt(e, buf.head)) { buf.dequeue(); buf.enqueue(e) }
  }

  override def update(buf: mutable.PriorityQueue[(Long, Long, Long)],
      input: InternalRow): mutable.PriorityQueue[(Long, Long, Long)] = {
    val v = child.eval(input)
    if (v != null) {
      val row = v.asInstanceOf[InternalRow]
      push(buf, (row.getLong(0), row.getLong(1), row.getLong(2)))
    }
    buf
  }

  override def merge(b1: mutable.PriorityQueue[(Long, Long, Long)],
      b2: mutable.PriorityQueue[(Long, Long, Long)]): mutable.PriorityQueue[(Long, Long, Long)] = {
    b2.foreach(push(b1, _))
    b1
  }

  override def eval(buf: mutable.PriorityQueue[(Long, Long, Long)]): Any = {
    val best = buf.toArray.sortBy(p => (p._1, p._2))
    new GenericArrayData(best.map { case (key, id, payload) =>
      new GenericInternalRow(Array[Any](key, id, payload))
    })
  }

  override def serialize(buf: mutable.PriorityQueue[(Long, Long, Long)]): Array[Byte] = {
    val arr = buf.toArray
    val bb = ByteBuffer.allocate(4 + 24 * arr.length)
    bb.putInt(arr.length)
    arr.foreach { case (key, id, payload) =>
      bb.putLong(key); bb.putLong(id); bb.putLong(payload)
    }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): mutable.PriorityQueue[(Long, Long, Long)] = {
    val bb = ByteBuffer.wrap(bytes)
    val n = bb.getInt
    val buf = createAggregationBuffer()
    (0 until n).foreach(_ => buf.enqueue((bb.getLong, bb.getLong, bb.getLong)))
    buf
  }

  override def withNewMutableAggBufferOffset(n: Int): BottomKByKey =
    copy(mutableAggBufferOffset = n)
  override def withNewInputAggBufferOffset(n: Int): BottomKByKey =
    copy(inputAggBufferOffset = n)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): Expression =
    copy(child = newChildren.head)
}

object BottomKByKey {
  /** Column helper: `bottom_k_by_key(struct(key, id, payload), k)`. */
  def bottom_k_by_key(keyIdPayloadStruct: Column, k: Int): Column =
    GraftExpressionBridge.column(
      BottomKByKey(GraftExpressionBridge.expression(keyIdPayloadStruct), k)
        .toAggregateExpression())
}
