package graft.functions

import org.apache.datasketches.kll.KllDoublesSketch
import org.apache.datasketches.memory.Memory
import org.apache.datasketches.quantilescommon.QuantileSearchCriteria

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, ImplicitCastInputTypes}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.sql.types._

/** Mergeable quantile sketches (DataSketches KLL, Karnin-Lang-Liberty
  * 2016) — the PERCENTILE analogue of the `hll_sketch_agg`/`hll_union_agg`
  * rollup pair Spark ships for distinct counts, which it does NOT ship
  * for quantiles (`percentile_approx` returns final values; its internal
  * digest cannot be re-merged from SQL). Sketch each fine-grained group
  * ONCE with [[KllSketchAgg]], then [[KllMergeAgg]] combines the stored
  * sketch BYTES to any coarser grouping — daily→monthly percentile
  * rollups without rescanning the fact table, the warehouse pattern the
  * `percentile_rollup` contract query exercises.
  *
  * Both aggregates run with map-side partial aggregation: each task
  * reduces its rows to one ~O(k log n)-byte sketch and only sketches
  * cross the exchange. ACCURACY: a k-sized KLL answers any rank query
  * within ±getNormalizedRankError(k) with 99% confidence (~1.65% at the
  * default k = 200); KLL compaction is RANDOMIZED, so estimates vary
  * run-to-run within those bounds — contracts must assert rank BANDS
  * (with margin), never exact values. Nulls and NaNs are skipped like
  * every sketch in this package.
  */
case class KllSketchAgg(
    child: Expression, k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[KllDoublesSketch] {

  require(k >= 8 && k <= 65535, s"KLL k must be in [8, 65535], got $k")

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = false
  override def dataType: DataType = BinaryType
  override def prettyName: String = "kll_sketch"

  override def createAggregationBuffer(): KllDoublesSketch =
    KllDoublesSketch.newHeapInstance(k)

  override def update(buf: KllDoublesSketch, input: InternalRow): KllDoublesSketch = {
    val v = child.eval(input)
    if (v != null) {
      val d = v.asInstanceOf[Double]
      if (!d.isNaN) buf.update(d)
    }
    buf
  }

  override def merge(a: KllDoublesSketch, b: KllDoublesSketch): KllDoublesSketch = {
    a.merge(b); a
  }

  override def eval(buf: KllDoublesSketch): Any = buf.toByteArray

  override def serialize(buf: KllDoublesSketch): Array[Byte] = buf.toByteArray
  override def deserialize(bytes: Array[Byte]): KllDoublesSketch =
    KllDoublesSketch.heapify(Memory.wrap(bytes))

  override def withNewMutableAggBufferOffset(newOffset: Int): KllSketchAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): KllSketchAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): KllSketchAgg =
    copy(child = newChildren.head)
}

object KllSketchAgg {
  val DefaultK = 200
  def apply(value: Column, k: Int): Column =
    Bridge.column(KllSketchAgg(Bridge.expression(value), k)
      .toAggregateExpression(isDistinct = false))
}

/** Merges serialized KLL sketches (the [[KllSketchAgg]] output column) to
  * a coarser grouping — the `hll_union_agg` analogue. NULL inputs are
  * skipped; the result is the merged sketch's bytes. */
case class KllMergeAgg(
    child: Expression, k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[KllDoublesSketch] {

  require(k >= 8 && k <= 65535, s"KLL k must be in [8, 65535], got $k")

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = false
  override def dataType: DataType = BinaryType
  override def prettyName: String = "kll_merge"

  override def createAggregationBuffer(): KllDoublesSketch =
    KllDoublesSketch.newHeapInstance(k)

  override def update(buf: KllDoublesSketch, input: InternalRow): KllDoublesSketch = {
    val v = child.eval(input)
    if (v != null)
      buf.merge(KllDoublesSketch.heapify(Memory.wrap(v.asInstanceOf[Array[Byte]])))
    buf
  }

  override def merge(a: KllDoublesSketch, b: KllDoublesSketch): KllDoublesSketch = {
    a.merge(b); a
  }

  override def eval(buf: KllDoublesSketch): Any = buf.toByteArray

  override def serialize(buf: KllDoublesSketch): Array[Byte] = buf.toByteArray
  override def deserialize(bytes: Array[Byte]): KllDoublesSketch =
    KllDoublesSketch.heapify(Memory.wrap(bytes))

  override def withNewMutableAggBufferOffset(newOffset: Int): KllMergeAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): KllMergeAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): KllMergeAgg =
    copy(child = newChildren.head)
}

object KllMergeAgg {
  def apply(sketch: Column, k: Int): Column =
    Bridge.column(KllMergeAgg(Bridge.expression(sketch), k)
      .toAggregateExpression(isDistinct = false))
}

/** Quantile query over a serialized KLL sketch: `kll_quantile(bytes, q)`
  * with q in [0, 1] (inclusive search criteria). NULL for a NULL or
  * empty sketch.
  *
  * [[ImplicitCastInputTypes]] so the SQL face accepts the canonical call
  * shape: in Spark SQL a bare `0.5` parses as DECIMAL(1,1), which without
  * declared input types reached `nullSafeEval` uncast and threw
  * ClassCastException on the `asInstanceOf[Double]`. */
case class KllQuantileExpr(left: Expression, right: Expression)
    extends BinaryExpression with CodegenFallback with ImplicitCastInputTypes {

  override def inputTypes: Seq[Bridge.AbstractType] = Seq(BinaryType, DoubleType)
  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true
  override def prettyName: String = "kll_quantile"

  override def nullSafeEval(sketchAny: Any, qAny: Any): Any = {
    val sk = KllDoublesSketch.heapify(
      Memory.wrap(sketchAny.asInstanceOf[Array[Byte]]))
    val q = qAny.asInstanceOf[Double]
    if (sk.isEmpty || q < 0.0 || q > 1.0) null
    else sk.getQuantile(q, QuantileSearchCriteria.INCLUSIVE)
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): KllQuantileExpr =
    copy(left = newLeft, right = newRight)
}

object KllQuantileExpr {
  def apply(sketch: Column, q: Column): Column =
    Bridge.column(KllQuantileExpr(Bridge.expression(sketch),
      Bridge.expression(q)))
}

/** Normalized-rank query over a serialized KLL sketch:
  * `kll_rank(bytes, value)` → the estimated fraction of items ≤ value.
  * NULL for a NULL or empty sketch. Declares input types (see
  * [[KllQuantileExpr]]) so SQL integer/decimal values coerce to Double
  * instead of throwing in `nullSafeEval`. */
case class KllRankExpr(left: Expression, right: Expression)
    extends BinaryExpression with CodegenFallback with ImplicitCastInputTypes {

  override def inputTypes: Seq[Bridge.AbstractType] = Seq(BinaryType, DoubleType)
  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true
  override def prettyName: String = "kll_rank"

  override def nullSafeEval(sketchAny: Any, vAny: Any): Any = {
    val sk = KllDoublesSketch.heapify(
      Memory.wrap(sketchAny.asInstanceOf[Array[Byte]]))
    if (sk.isEmpty) null
    else sk.getRank(vAny.asInstanceOf[Double], QuantileSearchCriteria.INCLUSIVE)
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): KllRankExpr =
    copy(left = newLeft, right = newRight)
}

object KllRankExpr {
  def apply(sketch: Column, value: Column): Column =
    Bridge.column(KllRankExpr(Bridge.expression(sketch),
      Bridge.expression(value)))
}
