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
  * Timestamps are merged in DOUBLE arithmetic over their internal
  * ordinal (micros for timestamp types, days for dates, the raw value
  * for numerics) — exact below 2^53 (micros reach that in year ~2255);
  * a LONG ts column whose magnitudes exceed 2^53 would lose tolerance /
  * nearest-distance precision, documented rather than silently wrong.
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
    val tol = tolerance

    left.execute().zipPartitions(right.execute()) { (lIter, rIter) =>
      val lKeyProj = UnsafeProjection.create(lKeyExprs, leftOut)
      val rKeyProjHead = UnsafeProjection.create(rKeyExprs, rightOut)
      val rKeyProjCand = UnsafeProjection.create(rKeyExprs, rightOut)
      val keyOrd = RowOrdering.createNaturalAscendingOrdering(keyTypes)
      val lTsGet = AsofJoinExec.tsReader(lTsType)
      val rTsGet = AsofJoinExec.tsReader(rTsType)
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
        // here — they can never satisfy an as-of predicate
        private var rHead: InternalRow = _
        private var rHeadTs: Double = 0.0
        // last right row with ts <= the current left ts (ownership moves
        // from rHead, so no extra copy); validity is re-checked against
        // the current left key at emit time
        private var backCand: InternalRow = _
        private var backCandTs: Double = 0.0
        advanceRight()

        private def advanceRight(): Unit = {
          rHead = null
          while (rHead == null && rIter.hasNext) {
            val r = rIter.next()
            if (!r.isNullAt(rTsOrd)) {
              val ts = rTsGet(r, rTsOrd)
              // a NaN ts (float/double ts columns) can never satisfy an
              // as-of predicate — treated exactly like NULL, matching the
              // window form's explicit NaN filter
              if (!java.lang.Double.isNaN(ts)) {
                rHead = r.copy()
                rHeadTs = ts
              }
            }
          }
        }

        override def hasNext: Boolean = lIter.hasNext

        override def next(): InternalRow = {
          val lRow = lIter.next()
          var matched: InternalRow = null
          // NaN left ts = NULL left ts: no as-of predicate can hold
          if (!lRow.isNullAt(lTsOrd) &&
              !java.lang.Double.isNaN(lTsGet(lRow, lTsOrd))) {
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
            while (rHead != null && cmp == 0 && rHeadTs <= lTs) {
              val keep = backCand != null && backCandTs == rHeadTs &&
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
              if (backOk && backCandTs == lTs) backCand
              else if (rHead != null && cmp == 0) rHead
              else null
            val fwdTs = if (fwdRow eq backCand) backCandTs else rHeadTs
            def inTol(dist: Double): Boolean = tol.forall(dist <= _)
            matched = dir match {
              case "backward" =>
                if (backOk && inTol(lTs - backCandTs)) backCand else null
              case "forward" =>
                if (fwdRow != null && inTol(fwdTs - lTs)) fwdRow else null
              case _ => // nearest: closer wins, equidistant ties backward
                val bOk = backOk && inTol(lTs - backCandTs)
                val fOk = fwdRow != null && inTol(fwdTs - lTs)
                if (bOk && (!fOk || lTs - backCandTs <= fwdTs - lTs)) backCand
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

  /** Reader from a row ordinal to the merge's uniform double ordinal
    * (internal micros for timestamps, days for dates, raw numerics). */
  private[plans] def tsReader(dt: DataType): (InternalRow, Int) => Double =
    dt match {
      case TimestampType | TimestampNTZType => (r, i) => r.getLong(i).toDouble
      case LongType => (r, i) => r.getLong(i).toDouble
      case IntegerType => (r, i) => r.getInt(i).toDouble
      case DateType => (r, i) => r.getInt(i).toDouble
      case ShortType => (r, i) => r.getShort(i).toDouble
      case ByteType => (r, i) => r.getByte(i).toDouble
      case DoubleType => (r, i) => r.getDouble(i)
      case FloatType => (r, i) => r.getFloat(i).toDouble
      case other => throw new IllegalArgumentException(
        s"as-of merge join needs a timestamp, date or numeric ts column, got $other")
    }
}
