package graft.plans

import org.apache.spark.sql.catalyst.expressions.{Attribute, AttributeSet}
import org.apache.spark.sql.catalyst.plans.logical.{BinaryNode, LogicalPlan}

/** Logical as-of join: for every left row, the single right row with the
  * greatest `rightTs` <= `leftTs` (backward), the smallest `rightTs` >=
  * `leftTs` (forward), or the closer of the two (nearest; equidistant
  * ties backward), matching on the key attributes — the WHOLE-OPERATOR
  * form of [[graft.operators.Joins.asOfJoin]]'s union-and-carry
  * composition, planned by [[AsofJoinStrategy]] into a co-partitioned
  * streaming merge ([[AsofJoinExec]]).
  *
  * The node is constructed POST-analysis from resolved child plans (see
  * `Joins.asOfJoinMerge`): every expression argument is already a bound
  * `Attribute`, so the default `resolved` derivation holds and the
  * analyzer passes the node through untouched. The right side arrives
  * pre-projected to `rightKeys ++ payload` with FRESH aliases (the
  * wrapper's projection), which keeps left/right expr-ids disjoint even
  * for self-joins without leaning on `DeduplicateRelations` internals.
  *
  * Output: `left.output ++ payload` (payload forced nullable — left-outer
  * semantics: unmatched left rows carry nulls). `payload` always contains
  * the matched-timestamp column, so tolerance trimming can compose on
  * top.
  *
  * `tolerance` is in the merge's uniform ts algebra — MICROSECONDS for
  * timestamp columns, the column's own units for numeric ts columns
  * (converted to double; exact below 2^53, i.e. beyond year 2255 for
  * micros — see [[AsofJoinExec]]).
  */
case class AsofJoin(
    left: LogicalPlan,
    right: LogicalPlan,
    leftKeys: Seq[Attribute],
    rightKeys: Seq[Attribute],
    leftTs: Attribute,
    rightTs: Attribute,
    payload: Seq[Attribute],
    direction: String,
    tolerance: Option[Double]) extends BinaryNode {

  require(leftKeys.size == rightKeys.size && leftKeys.nonEmpty,
    "as-of join needs one or more key pairs")
  require(AsofJoin.Directions.contains(direction),
    s"direction must be one of ${AsofJoin.Directions.mkString("/")}, got '$direction'")

  override def output: Seq[Attribute] =
    left.output ++ payload.map(_.withNullability(true))

  /** One output row per left row — the optimizer can reuse the left
    * side's row-count bound (e.g. for LIMIT planning above the join). */
  override def maxRows: Option[Long] = left.maxRows

  override def references: AttributeSet =
    AttributeSet(leftKeys ++ rightKeys ++ Seq(leftTs, rightTs) ++ payload)

  override protected def withNewChildrenInternal(
      newLeft: LogicalPlan, newRight: LogicalPlan): AsofJoin =
    copy(left = newLeft, right = newRight)
}

object AsofJoin {
  val Directions: Set[String] = Set("backward", "forward", "nearest")
}
