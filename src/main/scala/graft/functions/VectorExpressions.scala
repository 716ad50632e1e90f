package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.sql.types._

/** Native Catalyst expressions for dense-vector math over `array<float>` /
  * `array<double>` columns. Arithmetic is bit-identical to the
  * higher-order-function formulations in [[VectorFunctions]] (left-to-right
  * f64 accumulation over float-widened elements) — required so the DuckDB
  * oracle comparisons keep hash-matching — but runs as one compiled loop
  * per row instead of interpreted lambdas per element. The sign-bucket
  * expression evaluates tables × planes dot products in a single pass,
  * which is what makes multi-table LSH amplification affordable scan-side.
  */
private object VecRead {
  /** Element accessor widening float→double (exact). */
  def get(arr: ArrayData, dt: DataType): Int => Double = dt match {
    case FloatType => i => arr.getFloat(i).toDouble
    case DoubleType => i => arr.getDouble(i)
    case other => throw new IllegalArgumentException(
      s"vector ops need array<float|double>, got $other")
  }
  def elemType(e: Expression): DataType =
    e.dataType.asInstanceOf[ArrayType].elementType
}

/** Left-to-right f64 dot product; null if either side is null or the
  * lengths mismatch. This is the engine's per-PAIR hot kernel (every
  * brute-force / exact-re-rank / quantizer-fit scoring path evaluates it
  * once per scored pair), so unlike the per-ROW sketch expressions it
  * implements real `doGenCode`: the loop compiles INTO the enclosing
  * whole-stage-codegen method instead of a per-pair interpreted `eval`
  * call through the fallback shim. The generated arithmetic is the same
  * left-to-right f64 accumulation over float-widened elements, so results
  * stay bit-identical to the interpreted path and the HOF spec. */
case class DotProductExpr(left: Expression, right: Expression)
    extends BinaryExpression {
  override def dataType: DataType = DoubleType
  // a length mismatch yields null even for non-null children, so this
  // must be nullable regardless of child nullability (and codegen's
  // isNull slot must be a real variable)
  override def nullable: Boolean = true
  override def prettyName: String = "vec_dot"

  // vec_dot is SQL-registered, so arbitrary element types reach it at
  // analysis time; reject anything but array<float|double> HERE, because
  // the codegen getter's getDouble on e.g. an array<int> column would
  // reinterpret raw bytes and return garbage rather than the interpreted
  // path's loud IllegalArgumentException
  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    def ok(dt: DataType): Boolean = dt match {
      case ArrayType(FloatType | DoubleType, _) => true
      case _ => false
    }
    if (ok(left.dataType) && ok(right.dataType))
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"$prettyName needs array<float|double> inputs, got " +
          s"${left.dataType.simpleString} and ${right.dataType.simpleString}")
  }

  override def nullSafeEval(a: Any, b: Any): Any = {
    val av = a.asInstanceOf[ArrayData]
    val bv = b.asInstanceOf[ArrayData]
    // length mismatch → null, matching the declarative spec (zip_with pads
    // the shorter side with null, which propagates through the sum) — a
    // silently-truncated dot would hand plausible-looking similarities to
    // callers on schema drift
    if (av.numElements() != bv.numElements()) return null
    val ga = VecRead.get(av, VecRead.elemType(left))
    val gb = VecRead.get(bv, VecRead.elemType(right))
    val n = av.numElements()
    var acc = 0.0
    var i = 0
    while (i < n) { acc += ga(i) * gb(i); i += 1 }
    acc
  }

  override protected def doGenCode(
      ctx: org.apache.spark.sql.catalyst.expressions.codegen.CodegenContext,
      ev: org.apache.spark.sql.catalyst.expressions.codegen.ExprCode)
      : org.apache.spark.sql.catalyst.expressions.codegen.ExprCode = {
    // explicit Float/Double dispatch mirroring VecRead.get — any other
    // element type is unreachable post-checkInputDataTypes, but throw
    // rather than default to getDouble so a future registration path that
    // skips analysis can't silently reinterpret raw bytes
    def getter(arr: String, idx: String, e: Expression): String =
      VecRead.elemType(e) match {
        case FloatType => s"(double) $arr.getFloat($idx)"
        case DoubleType => s"$arr.getDouble($idx)"
        case other => throw new IllegalArgumentException(
          s"vector ops need array<float|double>, got $other")
      }
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val acc = ctx.freshName("acc")
      s"""
         |if ($a.numElements() != $b.numElements()) {
         |  ${ev.isNull} = true;
         |} else {
         |  int $n = $a.numElements();
         |  double $acc = 0.0;
         |  for (int $i = 0; $i < $n; $i++) {
         |    $acc += ${getter(a, i, left)} * ${getter(b, i, right)};
         |  }
         |  ${ev.value} = $acc;
         |}
       """.stripMargin
    })
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): DotProductExpr =
    copy(left = newLeft, right = newRight)
}

/** One sign-projection bucket id per hyperplane table, all tables in one
  * pass: out(t) = Σ_i [dot(v, planes(t)(i)) ≥ 0] · 2^i. */
case class SignBucketsExpr(child: Expression,
                           planes: Array[Array[Array[Double]]])
    extends UnaryExpression with KernelCodegen {
  require(planes.nonEmpty && planes.forall(_.length <= 62),
    "at most 62 hyperplanes per bucket key")

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "sign_buckets"

  override def nullSafeEval(input: Any): Any = {
    val v = input.asInstanceOf[ArrayData]
    val gv = VecRead.get(v, VecRead.elemType(child))
    val n = v.numElements()
    val out = new Array[Any](planes.length)
    var t = 0
    while (t < planes.length) {
      val table = planes(t)
      var bucket = 0L
      var p = 0
      while (p < table.length) {
        val plane = table(p)
        // fail loudly on dimension mismatch: bucketing on a silently
        // truncated prefix would collapse recall with healthy-looking output
        if (n != plane.length) throw new IllegalArgumentException(
          s"sign_buckets: vector dim $n != hyperplane dim ${plane.length} " +
            "(pass the embedding dimension as `dim`)")
        var acc = 0.0
        var i = 0
        while (i < n) { acc += gv(i) * plane(i); i += 1 }
        if (acc >= 0) bucket += (1L << p)
        p += 1
      }
      out(t) = bucket
      t += 1
    }
    new GenericArrayData(out)
  }

  override protected def withNewChildInternal(newChild: Expression): SignBucketsExpr =
    copy(child = newChild)
}

/** Asymmetric-distance (ADC) dot for product quantization: codes is the
  * row's `array<int>` of m per-subspace codebook indices, flatLut the
  * query's flattened `array<double>` of m·ksub precomputed sub-dots
  * (LUT(j)(c) at index j·ksub + c). One primitive loop of m adds per
  * (row, query) pair — replacing the m-deep `element_at` tree over m
  * SEPARATE lut array columns, whose per-joined-row copy through the
  * broadcast nested-loop join dominated the ADC scan (measured 10x the
  * brute-force per-pair cost before this expression; the flat single
  * array also makes the broadcast row one contiguous copy). Null if
  * either side is null; malformed inputs (code out of range, lut length
  * not m·ksub) yield null rather than a scan-killing exception — the
  * [[AudioFeaturesExpr]] corrupt-input convention. */
case class PqAdcDotExpr(left: Expression, right: Expression, ksub: Int)
    extends BinaryExpression {
  require(ksub >= 1, "ksub must be >= 1")

  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true
  override def prettyName: String = "pq_adc_dot"

  override def nullSafeEval(codesAny: Any, lutAny: Any): Any = {
    val codes = codesAny.asInstanceOf[ArrayData]
    val lut = lutAny.asInstanceOf[ArrayData]
    val m = codes.numElements()
    if (lut.numElements() != m * ksub) return null
    var acc = 0.0
    var j = 0
    while (j < m) {
      val c = codes.getInt(j)
      if (c < 0 || c >= ksub) return null
      acc += lut.getDouble(j * ksub + c)
      j += 1
    }
    acc
  }

  // the ADC scan's per-pair kernel, same doGenCode rationale as
  // [[DotProductExpr]]: the m-add loop compiles into the enclosing
  // whole-stage method; malformed inputs null out via the isNull slot
  override protected def doGenCode(
      ctx: org.apache.spark.sql.catalyst.expressions.codegen.CodegenContext,
      ev: org.apache.spark.sql.catalyst.expressions.codegen.ExprCode)
      : org.apache.spark.sql.catalyst.expressions.codegen.ExprCode =
    nullSafeCodeGen(ctx, ev, (codes, lut) => {
      val m = ctx.freshName("m")
      val j = ctx.freshName("j")
      val c = ctx.freshName("c")
      val acc = ctx.freshName("acc")
      s"""
         |int $m = $codes.numElements();
         |if ($lut.numElements() != $m * $ksub) {
         |  ${ev.isNull} = true;
         |} else {
         |  double $acc = 0.0;
         |  for (int $j = 0; $j < $m && !${ev.isNull}; $j++) {
         |    int $c = $codes.getInt($j);
         |    if ($c < 0 || $c >= $ksub) {
         |      ${ev.isNull} = true;
         |    } else {
         |      $acc += $lut.getDouble($j * $ksub + $c);
         |    }
         |  }
         |  ${ev.value} = $acc;
         |}
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): PqAdcDotExpr =
    copy(left = newLeft, right = newRight)
}

/** Nearest-centroid argmin for quantizer ASSIGNMENT — the corpus-side
  * kernel of IVF build/append/maintain: one fused pass computing, per
  * centroid, d = ||c||² − 2·v·c (the row-independent ||v||² term cannot
  * change the order) and keeping the argmin, ties to the LOWEST cell id.
  * Replaces the declarative `element_at(array_sort(array(<nCells>
  * structs)), 1)` formulation, which allocated and sorted nCells structs
  * PER ROW — at the 256-cell default that is 256 allocations + an
  * O(c log c) sort per corpus row on every build/append/maintain pass;
  * here it is a primitive loop with zero allocation. Arithmetic is
  * bit-identical (same per-centroid expression order, same f64
  * accumulation, same tie rule), so assignments — and therefore probe
  * results and every IVF contract — are unchanged. NULL vector yields
  * NULL; a dimension mismatch fails loudly (a silently-truncated
  * assignment would collapse recall with healthy-looking output, the
  * [[SignBucketsExpr]] convention). */
case class NearestCellExpr(child: Expression, centroids: Array[Array[Double]])
    extends UnaryExpression {
  require(centroids.nonEmpty, "need at least one centroid")

  override def dataType: DataType = IntegerType
  override def nullable: Boolean = true
  override def prettyName: String = "nearest_cell"

  @transient private lazy val cNorm2: Array[Double] =
    centroids.map(_.map(x => x * x).sum)

  // element-type dispatch hoisted out of the row loop: a per-row
  // `VecRead.get` closure (one allocation per row + a megamorphic call
  // per element × per centroid) measurably REGRESSED the build pass it
  // was meant to speed up; a cached boolean branch keeps the inner loop
  // monomorphic primitive reads
  @transient private lazy val isFloat: Boolean =
    VecRead.elemType(child) match {
      case FloatType => true
      case DoubleType => false
      case other => throw new IllegalArgumentException(
        s"vector ops need array<float|double>, got $other")
    }

  override def nullSafeEval(input: Any): Any = {
    val v = input.asInstanceOf[ArrayData]
    val n = v.numElements()
    val fl = isFloat
    var best = 0
    var bestD = Double.PositiveInfinity
    var cIdx = 0
    while (cIdx < centroids.length) {
      val c = centroids(cIdx)
      if (n != c.length) throw new IllegalArgumentException(
        s"nearest_cell: vector dim $n != centroid dim ${c.length}")
      var dot = 0.0
      var i = 0
      if (fl) while (i < n) { dot += v.getFloat(i) * c(i); i += 1 }
      else while (i < n) { dot += v.getDouble(i) * c(i); i += 1 }
      val d = cNorm2(cIdx) - 2.0 * dot
      if (d < bestD) { bestD = d; best = cIdx }
      cIdx += 1
    }
    best
  }

  // assignment runs once per corpus row on every build/append/maintain
  // pass — worth compiling into the enclosing whole-stage method like the
  // per-pair kernels; the centroid matrix and its norms ride along as
  // referenced objects
  override protected def doGenCode(
      ctx: org.apache.spark.sql.catalyst.expressions.codegen.CodegenContext,
      ev: org.apache.spark.sql.catalyst.expressions.codegen.ExprCode)
      : org.apache.spark.sql.catalyst.expressions.codegen.ExprCode = {
    val cents = ctx.addReferenceObj("centroids", centroids, "double[][]")
    val norms = ctx.addReferenceObj("cNorm2", cNorm2, "double[]")
    val get = if (isFloat) "getFloat" else "getDouble"
    nullSafeCodeGen(ctx, ev, v => {
      val n = ctx.freshName("n")
      val c = ctx.freshName("c")
      val cv = ctx.freshName("cv")
      val dot = ctx.freshName("dot")
      val d = ctx.freshName("d")
      val i = ctx.freshName("i")
      val best = ctx.freshName("best")
      val bestD = ctx.freshName("bestD")
      s"""
         |int $n = $v.numElements();
         |int $best = 0;
         |double $bestD = Double.POSITIVE_INFINITY;
         |for (int $c = 0; $c < $cents.length; $c++) {
         |  double[] $cv = $cents[$c];
         |  if ($n != $cv.length) throw new IllegalArgumentException(
         |    "nearest_cell: vector dim " + $n + " != centroid dim " + $cv.length);
         |  double $dot = 0.0;
         |  for (int $i = 0; $i < $n; $i++) {
         |    $dot += ((double) $v.$get($i)) * $cv[$i];
         |  }
         |  double $d = $norms[$c] - 2.0 * $dot;
         |  if ($d < $bestD) { $bestD = $d; $best = $c; }
         |}
         |${ev.value} = $best;
       """.stripMargin
    })
  }

  override protected def withNewChildInternal(newChild: Expression): NearestCellExpr =
    copy(child = newChild)
}

object VectorExpressions {
  def dot(a: Column, b: Column): Column =
    Bridge.column(DotProductExpr(Bridge.expression(a), Bridge.expression(b)))

  def nearestCell(v: Column, centroids: Array[Array[Double]]): Column =
    Bridge.column(NearestCellExpr(Bridge.expression(v), centroids))

  def pqAdcDot(codes: Column, flatLut: Column, ksub: Int): Column =
    Bridge.column(PqAdcDotExpr(Bridge.expression(codes),
      Bridge.expression(flatLut), ksub))

  def signBuckets(v: Column, planes: Seq[Seq[Array[Double]]]): Column =
    Bridge.column(SignBucketsExpr(Bridge.expression(v),
      planes.map(_.toArray).toArray))
}
