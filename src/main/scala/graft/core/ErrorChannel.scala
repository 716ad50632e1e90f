package graft.core

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Error-as-data side channel, the reference's `yield exc` contract
  * (`/root/reference/bonobo_sqlalchemy/writers.py:94-95`): a failing row
  * must not kill the batch — it is routed downstream as data. Spark rows
  * cannot carry `Throwable`s through exchanges, so errors are serialized to
  * a message column and split into a side output (SURVEY.md §1.3).
  */
object ErrorChannel {

  /** A dataflow split: `ok` rows continue down the chain; `errors` carries
    * (error message + the offending row's columns). */
  final case class Split(ok: DataFrame, errors: DataFrame)

  /** Route rows failing `valid` to the error channel with `message`.
    * Both outputs derive from one scan (Catalyst shares it); no action is
    * triggered. */
  def split(df: DataFrame, valid: Column, message: Column): Split =
    Split(
      ok = df.filter(valid),
      errors = df.filter(!coalesce(valid, lit(false)))
        .select((message.cast("string").as("error") +: df.columns.toIndexedSeq.map(col)): _*))

  def split(df: DataFrame, valid: Column, message: String): Split =
    split(df, valid, lit(message))

  /** Guard a computed column: rows where `expr` evaluates to null (e.g. a
    * failed cast/parse under `try_*` semantics) go to the error channel;
    * surviving rows carry the computed value as `as`. */
  def guarded(df: DataFrame, e: Column, as: String, message: String): Split = {
    val computed = df.withColumn(as, e)
    split(computed, col(as).isNotNull, message)
  }
}
