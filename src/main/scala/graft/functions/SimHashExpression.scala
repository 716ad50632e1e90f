package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression, XXH64}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.sql.types.{DataType, LongType}

/** Native 64-bit SimHash over a token array, one compiled pass per
  * document: per token, xxhash64 (seed 42 — identical values to Spark's
  * `xxhash64` function) casts ±1 votes on each bit position; the sketch
  * sets bit i iff the vote sum is strictly positive. Value-equivalent to
  * [[HashFunctions.simHash]] (the HOF fold spec) and to the explode +
  * 64-sum-aggregate formulation, but with no interpreted lambdas, no
  * token explosion, and no shuffle — sketching stays entirely scan-side.
  */
case class SimHashExpr(child: Expression)
    extends UnaryExpression with KernelCodegen {

  override def dataType: DataType = LongType
  override def prettyName: String = "simhash64"

  override def nullSafeEval(input: Any): Any = {
    val tokens = input.asInstanceOf[ArrayData]
    val n = tokens.numElements()
    val votes = new Array[Int](64)
    var t = 0
    while (t < n) {
      // null elements are skipped (the SQL-registered function can receive
      // arrays built with explicit NULLs; concat_ws-style skip semantics)
      val s = tokens.getUTF8String(t)
      if (s != null) {
        val h = XXH64.hashUTF8String(s, 42L)
        var i = 0
        while (i < 64) {
          if (((h >>> i) & 1L) == 1L) votes(i) += 1 else votes(i) -= 1
          i += 1
        }
      }
      t += 1
    }
    var sketch = 0L
    var i = 0
    while (i < 64) {
      if (votes(i) > 0) sketch |= (1L << i)
      i += 1
    }
    sketch
  }

  override protected def withNewChildInternal(newChild: Expression): SimHashExpr =
    copy(child = newChild)
}

object SimHashExpr {
  def apply(tokens: Column): Column =
    Bridge.column(SimHashExpr(Bridge.expression(tokens)))
}
