package org.apache.spark.sql.graftbridge

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Spark 4 removed the public `new Column(expr)` constructor; the blessed
  * conversion lives in `private[sql]` ExpressionUtils. This bridge sits in a
  * subpackage of `org.apache.spark.sql` to re-export the two conversions a
  * library of custom Catalyst expressions needs. (The standard technique
  * for Spark extension libraries that ship native expressions.)
  */
object Bridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)

  /** `AbstractDataType` is `private[sql]`, but expressions mixing in
    * `ImplicitCastInputTypes` must name it in their `inputTypes`
    * signature; this public alias lets library expressions declare
    * coercible input types (e.g. a SQL DECIMAL literal coercing to the
    * DoubleType a sketch query expects). */
  type AbstractType = org.apache.spark.sql.types.AbstractDataType

  /** Whether the session holds any cached (persisted) relations — lets
    * tests observe that operator-internal caches were released without
    * reaching into `private[sql]` state themselves. */
  def hasCachedData(spark: org.apache.spark.sql.SparkSession): Boolean =
    !spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession]
      .sharedState.cacheManager.isEmpty

  /** Clone a session: same SparkContext, cache and (copied) session
    * state, but an ISOLATED SQLConf — runtime conf mutations on the clone
    * are invisible to the parent. `SparkSession.newSession()` is the
    * public cousin but resets runtime-set confs to SparkConf defaults;
    * the clone preserves them (the same mechanism Structured Streaming
    * uses for its per-run sessions). */
  def cloneSession(spark: org.apache.spark.sql.SparkSession)
      : org.apache.spark.sql.SparkSession =
    spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession]
      .cloneSession()

  /** Re-bind a DataFrame's logical plan to another session (of the same
    * SparkContext) so it executes under THAT session's conf. */
  def rebind(df: org.apache.spark.sql.DataFrame,
             target: org.apache.spark.sql.SparkSession)
      : org.apache.spark.sql.DataFrame = {
    val cds = df.asInstanceOf[
      org.apache.spark.sql.classic.Dataset[org.apache.spark.sql.Row]]
    org.apache.spark.sql.classic.Dataset.ofRows(
      target.asInstanceOf[org.apache.spark.sql.classic.SparkSession],
      cds.queryExecution.logical)
  }

  /** Wrap a (resolved) logical plan as a DataFrame on `spark` — the hook a
    * library needs to hand a CUSTOM LogicalPlan node to the session's
    * analyzer/optimizer/planner pipeline. */
  def ofRows(spark: org.apache.spark.sql.SparkSession,
             plan: org.apache.spark.sql.catalyst.plans.logical.LogicalPlan)
      : org.apache.spark.sql.DataFrame =
    org.apache.spark.sql.classic.Dataset.ofRows(
      spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession], plan)

  /** The session's `ExperimentalMethods` (extraStrategies /
    * extraOptimizations) — the imperative registration point for planner
    * strategies and optimizer rules on sessions that were built without
    * `spark.sql.extensions` (the `SparkSessionExtensions` path only sees
    * sessions created AFTER the conf is set). */
  def experimental(spark: org.apache.spark.sql.SparkSession)
      : org.apache.spark.sql.ExperimentalMethods =
    spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession].experimental

  /** Test-only visibility into a `SparkSessionExtensions` instance: the
    * strategies / optimizer rules a builder function injected (the build*
    * methods are `private[sql]`). */
  def builtStrategies(ext: org.apache.spark.sql.SparkSessionExtensions,
                      spark: org.apache.spark.sql.SparkSession)
      : Seq[org.apache.spark.sql.execution.SparkStrategy] =
    ext.buildPlannerStrategies(spark)

  def builtOptimizerRules(ext: org.apache.spark.sql.SparkSessionExtensions,
                          spark: org.apache.spark.sql.SparkSession)
      : Seq[org.apache.spark.sql.catalyst.rules.Rule[
        org.apache.spark.sql.catalyst.plans.logical.LogicalPlan]] =
    ext.buildOptimizerRules(spark)

  /** Install a function builder into an existing session's registry (the
    * per-creation `SparkSessionExtensions` path can't reach sessions that
    * already exist). */
  def registerFunction(
      spark: org.apache.spark.sql.SparkSession,
      ident: org.apache.spark.sql.catalyst.FunctionIdentifier,
      info: org.apache.spark.sql.catalyst.expressions.ExpressionInfo,
      builder: Seq[Expression] => Expression): Unit =
    spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession]
      .sessionState.functionRegistry.registerFunction(ident, info, builder)
}
