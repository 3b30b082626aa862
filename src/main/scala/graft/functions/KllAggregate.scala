package graft.functions

import org.apache.datasketches.kll.KllDoublesSketch
import org.apache.datasketches.memory.Memory
import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftExpressionBridge
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, ImplicitCastInputTypes}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.types._

/** KLL quantile-sketch aggregates over the DataSketches library that
  * ships with Spark's jars (used by the built-in `hll_sketch_agg`
  * family, which exposes no KLL surface) — the mergeable-summary
  * counterpart of [[graft.operators.Sketches]]' HLL store for ORDER
  * STATISTICS: per-group doc-length/score distributions maintained
  * across ingests without re-reading the base corpus.
  *
  * [[KllAgg]] folds raw doubles into a sketch (map-side partials —
  * one corpus pass per batch); [[KllMergeAgg]] folds serialized
  * sketches (the store-append path: stored rows ∪ fresh batch rows,
  * one dictionary-sized merge per group). k = 1024 keeps every value
  * exactly below ~1k items per group (estimates then EQUAL exact
  * order statistics — the spec regime) and bounds the sketch at a few
  * KB with ~1% rank error at production cardinalities.
  *
  * Determinism note: below capacity the sketch retains all values and
  * results are exact and order-free; above it, KLL's randomized
  * compaction makes byte images run-dependent — stores built on these
  * are rows-only for the driver gate, laws live in `SketchesSpec`.
  */
case class KllAgg(
    child: Expression,
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[KllDoublesSketch]
    with ImplicitCastInputTypes {

  override def children: Seq[Expression] = Seq(child)
  override def inputTypes: Seq[DataType] = Seq(DoubleType)
  override def nullable: Boolean = false
  override def dataType: DataType = BinaryType
  override def prettyName: String = "kll_sketch_agg"

  override def createAggregationBuffer(): KllDoublesSketch =
    KllDoublesSketch.newHeapInstance(k)

  override def update(buf: KllDoublesSketch,
      input: InternalRow): KllDoublesSketch = {
    val v = child.eval(input)
    if (v != null) buf.update(v.asInstanceOf[Double])
    buf
  }

  override def merge(b1: KllDoublesSketch,
      b2: KllDoublesSketch): KllDoublesSketch = {
    b1.merge(b2); b1
  }

  override def eval(buf: KllDoublesSketch): Any = buf.toByteArray

  override def serialize(buf: KllDoublesSketch): Array[Byte] =
    buf.toByteArray
  override def deserialize(bytes: Array[Byte]): KllDoublesSketch =
    KllDoublesSketch.heapify(Memory.wrap(bytes))

  override def withNewMutableAggBufferOffset(n: Int): KllAgg =
    copy(mutableAggBufferOffset = n)
  override def withNewInputAggBufferOffset(n: Int): KllAgg =
    copy(inputAggBufferOffset = n)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): Expression =
    copy(child = newChildren.head)
}

/** Merge serialized KLL sketches (binary column) into one. */
case class KllMergeAgg(
    child: Expression,
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[KllDoublesSketch]
    with ImplicitCastInputTypes {

  override def children: Seq[Expression] = Seq(child)
  override def inputTypes: Seq[DataType] = Seq(BinaryType)
  override def nullable: Boolean = false
  override def dataType: DataType = BinaryType
  override def prettyName: String = "kll_merge_agg"

  override def createAggregationBuffer(): KllDoublesSketch =
    KllDoublesSketch.newHeapInstance(k)

  override def update(buf: KllDoublesSketch,
      input: InternalRow): KllDoublesSketch = {
    val v = child.eval(input)
    if (v != null) buf.merge(KllDoublesSketch.heapify(
      Memory.wrap(v.asInstanceOf[Array[Byte]])))
    buf
  }

  override def merge(b1: KllDoublesSketch,
      b2: KllDoublesSketch): KllDoublesSketch = {
    b1.merge(b2); b1
  }

  override def eval(buf: KllDoublesSketch): Any = buf.toByteArray

  override def serialize(buf: KllDoublesSketch): Array[Byte] =
    buf.toByteArray
  override def deserialize(bytes: Array[Byte]): KllDoublesSketch =
    KllDoublesSketch.heapify(Memory.wrap(bytes))

  override def withNewMutableAggBufferOffset(n: Int): KllMergeAgg =
    copy(mutableAggBufferOffset = n)
  override def withNewInputAggBufferOffset(n: Int): KllMergeAgg =
    copy(inputAggBufferOffset = n)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): Expression =
    copy(child = newChildren.head)
}

/** Inclusive quantile read from a serialized sketch: smallest stored
  * value whose normalized rank ≥ q; null for an empty sketch.
  * CodegenFallback — used ONLY on dictionary-sized store frames
  * (≤|sources| rows), never in a corpus-sized hot path.
  */
case class KllQuantile(left: Expression, right: Expression)
    extends BinaryExpression with ImplicitCastInputTypes
    with CodegenFallback {
  override def inputTypes: Seq[DataType] =
    Seq(BinaryType, DoubleType)
  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true
  override def prettyName: String = "kll_quantile"

  override protected def nullSafeEval(sk: Any, q: Any): Any = {
    val sketch = KllDoublesSketch.heapify(
      Memory.wrap(sk.asInstanceOf[Array[Byte]]))
    if (sketch.isEmpty) null
    else sketch.getQuantile(q.asInstanceOf[Double])
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

object KllFunctions {
  val DefaultK: Int = 1024

  def kll_sketch_agg(value: Column, k: Int = DefaultK): Column =
    GraftExpressionBridge.column(
      KllAgg(GraftExpressionBridge.expression(value), k)
        .toAggregateExpression())

  def kll_merge_agg(sketch: Column, k: Int = DefaultK): Column =
    GraftExpressionBridge.column(
      KllMergeAgg(GraftExpressionBridge.expression(sketch), k)
        .toAggregateExpression())

  def kll_quantile(sketch: Column, q: Column): Column =
    GraftExpressionBridge.column(KllQuantile(
      GraftExpressionBridge.expression(sketch),
      GraftExpressionBridge.expression(q)))
}
