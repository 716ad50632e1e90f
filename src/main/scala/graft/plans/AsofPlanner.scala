package graft.plans

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions.{And, Attribute, AttributeSet, Expression}
import org.apache.spark.sql.catalyst.plans.logical.{Aggregate, Filter, LogicalPlan, Project}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.execution.{SparkPlan, SparkStrategy}
import org.apache.spark.sql.graftbridge.Bridge

/** Planner strategy for the [[AsofJoin]] logical node: a one-case match
  * producing [[AsofJoinExec]], with `planLater` handing the children back
  * to the full planner — exchanges and sorts are NOT planned here; the
  * exec node's required distribution/ordering lets `EnsureRequirements`
  * place them (and AQE re-place them at runtime). */
object AsofJoinStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case AsofJoin(l, r, lk, rk, lts, rts, payload, dir, tol) =>
      AsofJoinExec(planLater(l), planLater(r), lk, rk, lts, rts, payload,
        dir, tol) :: Nil
    case _ => Nil
  }
}

/** Optimizer support Catalyst can't provide for a node it doesn't know:
  *
  *  - JOIN ELIMINATION: when the consumer above the join references NONE
  *    of the carried payload columns, the join is dead weight — an as-of
  *    join emits exactly one output row per left row with the left
  *    columns unchanged (left-outer carry), so `Project`/`Aggregate`
  *    parents that only read left columns see an identical input from
  *    the bare left child. The whole right side (its scan, both
  *    exchanges, the merge) disappears from the plan. This is the
  *    custom-node analog of Catalyst's own unreferenced-outer-join
  *    elimination (`RemoveNoopOperators`/`ColumnPruning` family), which
  *    cannot fire on a node it doesn't know; at warehouse scale it is
  *    the difference between a metadata-only count and a full join for
  *    the star-schema queries BI layers generate.
  *  - FILTER PUSHDOWN: deterministic conjuncts over left-side columns
  *    move below the join into the left child. Sound because the as-of
  *    join emits exactly one row per left row and a left row's match
  *    depends on no other left row — filtering before or after is
  *    row-identical. Right-side (payload) predicates are NOT pushed:
  *    like any outer join, dropping candidate right rows would promote
  *    the next-best candidate instead of nulling the match.
  *  - COLUMN PRUNING: when a Project above the join uses only a subset
  *    of the left columns, the left child shrinks to that subset (plus
  *    the join's own keys and ts). The node's output is derived from
  *    `left.output`, so the narrowed child narrows the join itself.
  *
  * The pushdown/pruning rewrites land Filter/Project chains directly
  * over the left child; `PhysicalOperation` collapses them into the scan
  * at planning time, so pushed predicates reach `PushedFilters` and
  * pruned columns shrink `ReadSchema` exactly as they do for built-in
  * operators (plan-asserted in `AsofMergeSpec`, as is elimination). */
object AsofJoinOptimizations extends Rule[LogicalPlan] {

  private def conjuncts(e: Expression): Seq[Expression] = e match {
    case And(l, r) => conjuncts(l) ++ conjuncts(r)
    case other => Seq(other)
  }

  /** True when `consumerRefs` can be served by the join's left child
    * alone: no payload column is referenced. (Payload attrs are exactly
    * the join's non-left output; left attrs keep their expr-ids through
    * the join, so subset-of-left-output is the precise test.) */
  private def payloadUnused(aj: AsofJoin, consumerRefs: AttributeSet): Boolean =
    consumerRefs.subsetOf(aj.left.outputSet)

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transformUp {
    // elimination first: a Project/Aggregate that reads no payload makes
    // the narrowing rewrites below moot
    case p @ Project(_, aj: AsofJoin) if payloadUnused(aj, p.references) =>
      p.withNewChildren(Seq(aj.left))
    case a @ Aggregate(_, _, aj: AsofJoin, _) if payloadUnused(aj, a.references) =>
      a.withNewChildren(Seq(aj.left))
    case f @ Filter(cond, aj: AsofJoin) =>
      val (push, keep) = conjuncts(cond).partition(p =>
        p.deterministic && p.references.subsetOf(aj.left.outputSet))
      if (push.isEmpty) f
      else {
        val pushed = aj.copy(left = Filter(push.reduce(And), aj.left))
        keep.reduceOption(And).map(Filter(_, pushed)).getOrElse(pushed)
      }
    case p @ Project(_, aj: AsofJoin) =>
      val needed: AttributeSet =
        AttributeSet(aj.leftKeys :+ aj.leftTs) ++ p.references
      val keptLeft: Seq[Attribute] = aj.left.output.filter(needed.contains)
      if (keptLeft.size < aj.left.output.size)
        p.withNewChildren(Seq(aj.copy(left = Project(keptLeft, aj.left))))
      else p
  }
}

/** Imperative registration for sessions built without
  * `spark.sql.extensions=graft.GraftExtensions`: appends the strategy
  * and the optimizer rule to the session's `ExperimentalMethods`
  * (idempotent; `Joins.asOfJoinMerge` calls it on every use, so the
  * operator is self-contained). */
object AsofPlanner {
  def ensure(spark: SparkSession): Unit = synchronized {
    val exp = Bridge.experimental(spark)
    if (!exp.extraStrategies.contains(AsofJoinStrategy))
      exp.extraStrategies = exp.extraStrategies :+ AsofJoinStrategy
    if (!exp.extraOptimizations.contains(AsofJoinOptimizations))
      exp.extraOptimizations = exp.extraOptimizations :+ AsofJoinOptimizations
  }
}
