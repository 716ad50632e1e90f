package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Ascending, Attribute, Descending, GenericInternalRow, JoinedRow, RowOrdering, SortOrder, UnsafeProjection}
import org.apache.spark.sql.catalyst.plans.physical.{ClusteredDistribution, Distribution, Partitioning}
import org.apache.spark.sql.execution.{BinaryExecNode, SparkPlan}
import org.apache.spark.sql.execution.metric.{SQLMetric, SQLMetrics}
import org.apache.spark.sql.types._

/** Physical as-of join: a CO-PARTITIONED per-partition streaming merge.
  *
  * The node declares `ClusteredDistribution` on its keys for BOTH
  * children and `(keys, ts)` child orderings, so `EnsureRequirements`
  * plans the exchanges and sorts exactly as it does for a sort-merge
  * join — ONE shuffle per side on the keys, no union, no window. The
  * merge itself is a single forward pass over each partition pair:
  * for every left row (ascending key, ts) the right pointer advances
  * monotonically, keeping O(1) state — the last right row at-or-before
  * the left timestamp (backward candidate) and the first strictly-after
  * row (the un-consumed head, the forward candidate). Cost per
  * partition: O(|left| + |right|) row visits and ONE `copy()` per right
  * row (the buffered head; left rows are consumed in place).
  *
  * Versus [[graft.operators.Joins.asOfJoin]]'s union-and-carry plan this
  * shuffles each input once on its own (typically smaller) schema
  * instead of unioning both into one padded-width exchange + window
  * sort, and `nearest` needs no second sort. The skew story is
  * unchanged — a hot key is still one partition's merge — and the
  * time-bucketed escape hatch ([[graft.operators.Joins.asOfJoinBucketed]])
  * remains the answer there.
  *
  * Tie rule parity: the right child's required ordering appends the
  * payload columns DESCENDING (nulls last) after the timestamp —
  * reversing every component of a lexicographic order reverses the
  * order — so the FIRST row of each (key, ts) tie group is the greatest
  * payload struct, replaying the window implementation's
  * `last(payload asc)` rule with no per-group scan. Non-orderable
  * payload columns are skipped (ties then resolve arbitrarily, the same
  * fallback the window form documents).
  *
  * NULL semantics match the window form: NULL keys compare equal and
  * join each other (the natural-ascending ordering used for the merge
  * groups NULLs, as `Window.partitionBy` does); a NULL right timestamp
  * can never match (skipped at the head buffer); a NULL left timestamp
  * yields a null match. A NaN timestamp (float/double ts columns) is
  * treated exactly like NULL on both sides — both implementations
  * enforce this, keeping the property-pinned parity on NaN data.
  *
  * Timestamp arithmetic is type-split ([[AsofJoinExec.algebraFor]]):
  * when BOTH ts columns are integral (timestamp/date/long/int/short/
  * byte) the merge compares and subtracts in exact LONG arithmetic over
  * the internal ordinal (micros for timestamps, days for dates, the raw
  * value for integrals) — bit-exact at any magnitude, matching the
  * window plan's native column arithmetic (property-pinned above 2^53
  * in `AsofMergeSpec`). Float/double ts columns (or a mixed
  * integral/floating pair) use double arithmetic — their values ARE
  * doubles, so that is the exact representation there.
  */
case class AsofJoinExec(
    left: SparkPlan,
    right: SparkPlan,
    leftKeys: Seq[Attribute],
    rightKeys: Seq[Attribute],
    leftTs: Attribute,
    rightTs: Attribute,
    payload: Seq[Attribute],
    direction: String,
    tolerance: Option[Double]) extends BinaryExecNode {

  override def output: Seq[Attribute] =
    left.output ++ payload.map(_.withNullability(true))

  override lazy val metrics: Map[String, SQLMetric] = Map(
    "numOutputRows" -> SQLMetrics.createMetric(sparkContext, "number of output rows"),
    "numMatchedRows" -> SQLMetrics.createMetric(sparkContext, "number of matched rows"))

  override def requiredChildDistribution: Seq[Distribution] =
    ClusteredDistribution(leftKeys) :: ClusteredDistribution(rightKeys) :: Nil

  override def requiredChildOrdering: Seq[Seq[SortOrder]] = Seq(
    leftKeys.map(SortOrder(_, Ascending)) :+ SortOrder(leftTs, Ascending),
    rightKeys.map(SortOrder(_, Ascending)) ++
      (SortOrder(rightTs, Ascending) +:
        payload.filter(p => RowOrdering.isOrderable(p.dataType))
          .map(SortOrder(_, Descending))))

  /** Left rows pass through partition-unchanged (one output row each). */
  override def outputPartitioning: Partitioning = left.outputPartitioning

  /** The left child's (keys, ts) sort survives the merge. */
  override def outputOrdering: Seq[SortOrder] = requiredChildOrdering.head

  override protected def withNewChildrenInternal(
      newLeft: SparkPlan, newRight: SparkPlan): AsofJoinExec =
    copy(left = newLeft, right = newRight)

  override protected def doExecute(): RDD[InternalRow] = {
    val numOutput = longMetric("numOutputRows")
    val numMatched = longMetric("numMatchedRows")
    val leftOut = left.output
    val rightOut = right.output
    val outAttrs = output
    val lKeyExprs = leftKeys
    val rKeyExprs = rightKeys
    val keyTypes = leftKeys.map(_.dataType)
    val lTsOrd = leftOut.indexWhere(_.exprId == leftTs.exprId)
    val rTsOrd = rightOut.indexWhere(_.exprId == rightTs.exprId)
    require(lTsOrd >= 0 && rTsOrd >= 0, "ts attributes must be child outputs")
    val lTsType = leftTs.dataType
    val rTsType = rightTs.dataType
    val dir = direction
    val alg = AsofJoinExec.algebraFor(lTsType, rTsType, tolerance)

    left.execute().zipPartitions(right.execute()) { (lIter, rIter) =>
      val lKeyProj = UnsafeProjection.create(lKeyExprs, leftOut)
      val rKeyProjHead = UnsafeProjection.create(rKeyExprs, rightOut)
      val rKeyProjCand = UnsafeProjection.create(rKeyExprs, rightOut)
      val keyOrd = RowOrdering.createNaturalAscendingOrdering(keyTypes)
      val lTsGet = alg.reader(lTsType)
      val rTsGet = alg.reader(rTsType)
      val lUsable = alg.usable(lTsType)
      val rUsable = alg.usable(rTsType)
      // bind payload references against NULLABLE right attributes: the
      // unmatched side substitutes an all-null row, and a non-nullable
      // input attr would bind to a null-check-free getter that reads
      // garbage zeros instead of nulls
      val resultProj = UnsafeProjection.create(outAttrs,
        leftOut ++ rightOut.map(_.withNullability(true)))
      val nullRight = new GenericInternalRow(rightOut.size)
      val joined = new JoinedRow

      new Iterator[InternalRow] {
        // the first not-yet-consumed right row (a stable copy), or null
        // once the right side is exhausted; rows with NULL ts are dropped
        // here — they can never satisfy an as-of predicate. Ts values are
        // the algebra's ENCODED Long ordinal (raw longs for integral
        // types, double bits for floating ones).
        private var rHead: InternalRow = _
        private var rHeadTs: Long = 0L
        // last right row with ts <= the current left ts (ownership moves
        // from rHead, so no extra copy); validity is re-checked against
        // the current left key at emit time
        private var backCand: InternalRow = _
        private var backCandTs: Long = 0L
        advanceRight()

        private def advanceRight(): Unit = {
          rHead = null
          while (rHead == null && rIter.hasNext) {
            val r = rIter.next()
            // a NULL or NaN ts (float/double ts columns) can never
            // satisfy an as-of predicate — dropped here, matching the
            // window form's explicit filter
            if (!r.isNullAt(rTsOrd) && rUsable(r, rTsOrd)) {
              rHead = r.copy()
              rHeadTs = rTsGet(r, rTsOrd)
            }
          }
        }

        override def hasNext: Boolean = lIter.hasNext

        override def next(): InternalRow = {
          val lRow = lIter.next()
          var matched: InternalRow = null
          // NaN left ts = NULL left ts: no as-of predicate can hold
          if (!lRow.isNullAt(lTsOrd) && lUsable(lRow, lTsOrd)) {
            val lTs = lTsGet(lRow, lTsOrd)
            val lKey = lKeyProj(lRow)
            var cmp =
              if (rHead == null) 1 else keyOrd.compare(rKeyProjHead(rHead), lKey)
            // skip right keys below the current left key
            while (rHead != null && cmp < 0) {
              backCand = null
              advanceRight()
              cmp = if (rHead == null) 1
                    else keyOrd.compare(rKeyProjHead(rHead), lKey)
            }
            // consume this key's rows with ts <= lTs; the FIRST row of a
            // ts tie group sticks (right ordering makes it the greatest
            // payload), later equal-ts rows don't displace it
            while (rHead != null && cmp == 0 && alg.lte(rHeadTs, lTs)) {
              val keep = backCand != null && alg.eqv(backCandTs, rHeadTs) &&
                keyOrd.compare(rKeyProjCand(backCand), lKey) == 0
              if (!keep) { backCand = rHead; backCandTs = rHeadTs }
              advanceRight()
              cmp = if (rHead == null) 1
                    else keyOrd.compare(rKeyProjHead(rHead), lKey)
            }
            val backOk = backCand != null &&
              keyOrd.compare(rKeyProjCand(backCand), lKey) == 0
            // forward candidate: the equal-ts backward row if one exists
            // (rows at ts == lTs satisfy BOTH directions and were already
            // consumed), else the un-consumed head of this key
            val fwdRow =
              if (backOk && alg.eqv(backCandTs, lTs)) backCand
              else if (rHead != null && cmp == 0) rHead
              else null
            val fwdTs = if (fwdRow eq backCand) backCandTs else rHeadTs
            matched = dir match {
              case "backward" =>
                if (backOk && alg.within(lTs, backCandTs)) backCand else null
              case "forward" =>
                if (fwdRow != null && alg.within(fwdTs, lTs)) fwdRow else null
              case _ => // nearest: closer wins, equidistant ties backward
                val bOk = backOk && alg.within(lTs, backCandTs)
                val fOk = fwdRow != null && alg.within(fwdTs, lTs)
                if (bOk && (!fOk || alg.closerOrTied(lTs, backCandTs, fwdTs, lTs)))
                  backCand
                else if (fOk) fwdRow
                else null
            }
          }
          numOutput += 1
          if (matched != null) {
            numMatched += 1
            resultProj(joined(lRow, matched))
          } else {
            resultProj(joined(lRow, nullRight))
          }
        }
      }
    }
  }
}

object AsofJoinExec {

  /** Orderable-and-subtractable ts column types for the merge. */
  def supportsTsType(dt: DataType): Boolean = dt match {
    case TimestampType | TimestampNTZType | DateType => true
    case LongType | IntegerType | ShortType | ByteType => true
    case DoubleType | FloatType => true
    case _ => false
  }

  private def isIntegralTs(dt: DataType): Boolean = dt match {
    case TimestampType | TimestampNTZType | DateType => true
    case LongType | IntegerType | ShortType | ByteType => true
    case _ => false
  }

  /** Primitive ts algebra for the merge. Values are read into an ENCODED
    * Long ordinal so the iterator's candidate state is a primitive var
    * on both paths: raw internal longs for integral ts types (exact at
    * any magnitude), `doubleToLongBits` for float/double ts columns
    * (decoded at every comparison — the double IS the exact value
    * there). Two implementations only, so every call site stays
    * bimorphic for the JIT. */
  private[plans] sealed abstract class TsAlgebra extends Serializable {
    def reader(dt: DataType): (InternalRow, Int) => Long
    /** False when the value can never satisfy an as-of predicate (NaN on
      * float/double columns — NULLs are checked separately). */
    def usable(dt: DataType): (InternalRow, Int) => Boolean
    def lte(a: Long, b: Long): Boolean
    def eqv(a: Long, b: Long): Boolean
    /** (hi - lo) <= tolerance; true when no tolerance. Needs lte(lo, hi). */
    def within(hi: Long, lo: Long): Boolean
    /** (bHi - bLo) <= (fHi - fLo): nearest's backward-wins-ties rule. */
    def closerOrTied(bHi: Long, bLo: Long, fHi: Long, fLo: Long): Boolean
  }

  /** Exact long path when BOTH ts columns are integral; double path
    * (the pre-existing arithmetic) when either side is float/double. */
  private[plans] def algebraFor(lt: DataType, rt: DataType,
                                tol: Option[Double]): TsAlgebra =
    if (isIntegralTs(lt) && isIntegralTs(rt)) new LongTsAlgebra(tol)
    else new DoubleTsAlgebra(tol)

  private def badTsType(other: DataType): Nothing =
    throw new IllegalArgumentException(
      s"as-of merge join needs a timestamp, date or numeric ts column, got $other")

  private[plans] final class LongTsAlgebra(tol: Option[Double])
      extends TsAlgebra {
    // dist <= tol with integral dist ⇔ dist <= floor(tol): exact for
    // every tolerance the resolver emits (whole micros / fractional days
    // floor to the same admissible integral distances)
    private val hasTol = tol.isDefined
    private val tolL: Long = tol.fold(0L)(t =>
      if (t >= Long.MaxValue.toDouble) Long.MaxValue
      else math.floor(t).toLong)
    def reader(dt: DataType): (InternalRow, Int) => Long = dt match {
      case TimestampType | TimestampNTZType | LongType => (r, i) => r.getLong(i)
      case IntegerType | DateType => (r, i) => r.getInt(i).toLong
      case ShortType => (r, i) => r.getShort(i).toLong
      case ByteType => (r, i) => r.getByte(i).toLong
      case other => badTsType(other)
    }
    def usable(dt: DataType): (InternalRow, Int) => Boolean = (_, _) => true
    def lte(a: Long, b: Long): Boolean = a <= b
    def eqv(a: Long, b: Long): Boolean = a == b
    // hi >= lo by contract, so a wrapped (sign-flipped) difference means
    // the true distance exceeds Long range — saturate, never wrap
    private def dist(hi: Long, lo: Long): Long = {
      val d = hi - lo
      if (((hi ^ lo) & (hi ^ d)) < 0) Long.MaxValue else d
    }
    def within(hi: Long, lo: Long): Boolean =
      !hasTol || dist(hi, lo) <= tolL
    def closerOrTied(bHi: Long, bLo: Long, fHi: Long, fLo: Long): Boolean =
      dist(bHi, bLo) <= dist(fHi, fLo)
  }

  private[plans] final class DoubleTsAlgebra(tol: Option[Double])
      extends TsAlgebra {
    private def get(dt: DataType): (InternalRow, Int) => Double = dt match {
      case TimestampType | TimestampNTZType => (r, i) => r.getLong(i).toDouble
      case LongType => (r, i) => r.getLong(i).toDouble
      case IntegerType => (r, i) => r.getInt(i).toDouble
      case DateType => (r, i) => r.getInt(i).toDouble
      case ShortType => (r, i) => r.getShort(i).toDouble
      case ByteType => (r, i) => r.getByte(i).toDouble
      case DoubleType => (r, i) => r.getDouble(i)
      case FloatType => (r, i) => r.getFloat(i).toDouble
      case other => badTsType(other)
    }
    def reader(dt: DataType): (InternalRow, Int) => Long = {
      val g = get(dt)
      (r, i) => java.lang.Double.doubleToLongBits(g(r, i))
    }
    def usable(dt: DataType): (InternalRow, Int) => Boolean = dt match {
      case DoubleType => (r, i) => !java.lang.Double.isNaN(r.getDouble(i))
      case FloatType => (r, i) => !java.lang.Float.isNaN(r.getFloat(i))
      case _ => (_, _) => true
    }
    private def d(bits: Long): Double = java.lang.Double.longBitsToDouble(bits)
    def lte(a: Long, b: Long): Boolean = d(a) <= d(b)
    def eqv(a: Long, b: Long): Boolean = d(a) == d(b)
    def within(hi: Long, lo: Long): Boolean = tol.forall(d(hi) - d(lo) <= _)
    def closerOrTied(bHi: Long, bLo: Long, fHi: Long, fLo: Long): Boolean =
      d(bHi) - d(bLo) <= d(fHi) - d(fLo)
  }
}
