package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode, FalseLiteral}
import org.apache.spark.sql.catalyst.expressions.codegen.Block._
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.sql.types._

/** Z-VALUE (Morton) interleave over EQUI-DEPTH bucket ranks — the
  * multi-dimension data-layout key behind `Layout.zOrderUpsert` (the
  * public `OPTIMIZE ... ZORDER` pattern: Delta/Iceberg cluster files by
  * interleaved range-ids so range predicates on ANY clustered dimension
  * prune row groups; a single-column sort only serves its own column).
  *
  * Each input value maps to its bucket index via binary search over that
  * dimension's FROZEN cut points (fitted once by `Layout.fitZOrder` from
  * `approxQuantile` — equi-depth, so skewed columns still spread over the
  * full bucket range; the cut arrays ship with the serialized plan like
  * the BPE merge table and the IVF centroids). The bucket indices'
  * bits are then interleaved LSB-first across dimensions into one long:
  * rows close in every dimension land close in z, so sorting by z gives
  * every dimension range-locality. NULL (and NaN) values take bucket 0 —
  * they cluster together at the low end of their dimension rather than
  * scattering. Output is never null; one compiled row kernel
  * (`doGenCode`), no shuffle, no UDF. */
case class ZValueExpr(children: Seq[Expression],
                      boundaries: Seq[Array[Double]])
    extends Expression {

  require(children.nonEmpty && children.size == boundaries.size,
    "one boundary array per input column")
  require(boundaries.forall(_.nonEmpty), "empty cut-point array")

  override def dataType: DataType = LongType
  override def nullable: Boolean = false
  override def foldable: Boolean = false
  override def prettyName: String = "zvalue"

  override def checkInputDataTypes(): TypeCheckResult =
    if (children.forall(_.dataType == DoubleType)) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName needs double inputs (cast upstream), got " +
        children.map(_.dataType.simpleString).mkString(", "))

  /** Bits per dimension: enough for the widest bucket index; the total
    * interleave must fit one long. */
  private val bitsPerDim: Int = {
    val maxBucket = boundaries.map(_.length).max // index range is 0..len
    math.max(1, 64 - java.lang.Long.numberOfLeadingZeros(maxBucket.toLong))
  }
  require(bitsPerDim * children.size <= 64,
    s"z-value overflow: ${children.size} dims x $bitsPerDim bits > 64 " +
      "(use fewer buckets or dimensions)")

  @transient private lazy val bArr: Array[Array[Double]] = boundaries.toArray

  /** Bucket = number of cut points <= v (equal values go UP); NaN
    * compares false everywhere and lands in bucket 0, like NULL. */
  private def bucketOf(cuts: Array[Double], v: Double): Int = {
    var lo = 0
    var hi = cuts.length - 1
    var res = 0
    while (lo <= hi) {
      val mid = (lo + hi) >>> 1
      if (cuts(mid) <= v) { res = mid + 1; lo = mid + 1 } else hi = mid - 1
    }
    res
  }

  /** Public for the generated code's reference-object call. */
  def zvalue(vals: Array[Double], nulls: Array[Boolean]): Long = {
    val d = bArr.length
    var z = 0L
    var dim = 0
    while (dim < d) {
      val b = if (nulls(dim)) 0L else bucketOf(bArr(dim), vals(dim)).toLong
      var bit = 0
      while (bit < bitsPerDim) {
        z |= ((b >> bit) & 1L) << (bit * d + dim)
        bit += 1
      }
      dim += 1
    }
    z
  }

  override def eval(input: InternalRow): Any = {
    val n = children.size
    val vals = new Array[Double](n)
    val nulls = new Array[Boolean](n)
    var i = 0
    while (i < n) {
      val v = children(i).eval(input)
      if (v == null) nulls(i) = true
      else vals(i) = v.asInstanceOf[Double]
      i += 1
    }
    zvalue(vals, nulls)
  }

  override protected def doGenCode(ctx: CodegenContext,
                                   ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("zexpr", this, classOf[ZValueExpr].getName)
    val evs = children.map(_.genCode(ctx))
    val vals = ctx.freshName("zvals")
    val nulls = ctx.freshName("znulls")
    val fill = evs.zipWithIndex.map { case (e, i) =>
      s"""$nulls[$i] = ${e.isNull};
         |if (!${e.isNull}) $vals[$i] = ${e.value};""".stripMargin
    }.mkString("\n")
    ev.copy(
      code = code"""
        ${evs.map(_.code).reduce(_ + _)}
        double[] $vals = new double[${children.size}];
        boolean[] $nulls = new boolean[${children.size}];
        $fill
        long ${ev.value} = $ref.zvalue($vals, $nulls);
      """,
      isNull = FalseLiteral)
  }

  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): ZValueExpr =
    copy(children = newChildren)
}

object ZValueExpr {
  def apply(cols: Seq[Column], boundaries: Seq[Array[Double]]): Column =
    Bridge.column(ZValueExpr(cols.map(Bridge.expression), boundaries))
}
