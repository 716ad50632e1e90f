package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Scan-side char-n-gram LM scoring against a FROZEN model — the
  * zero-shuffle apply half of [[graft.operators.CorpusStats.charLmScore]]:
  * one compiled pass per document slides the same code-point windows as
  * [[CharGramsExpr]] (so gram boundaries are bit-identical to the exploded
  * path) and accumulates `(n_grams, freq_sum, oov)` through a hash-map
  * lookup per window, emitting the triple as one struct. No
  * per-gram explode, no model join, no per-document re-aggregation, no
  * join-back exchange — the whole score is a projection inside the scan,
  * which also makes it STREAM-NATIVE. The model ships with the serialized
  * plan like the BPE merge table and the boilerplate line set; use the
  * join-based [[graft.operators.CorpusStats.charLmApply]] when the model
  * must stay a relation (unbounded or not driver-resident).
  * Texts shorter than `n` score (0, 0, 0); NULL text yields NULL (the
  * operator coalesces, matching the join path's join-back zeros). */
case class CharLmScoreExpr(child: Expression, model: Seq[(String, Long)],
                           n: Int)
    extends UnaryExpression with KernelCodegen {

  require(n >= 1, "n-gram size must be >= 1")

  override def dataType: DataType = CharLmScoreExpr.schema
  override def nullable: Boolean = true
  override def prettyName: String = "char_lm_score"

  @transient private lazy val counts: java.util.HashMap[UTF8String, java.lang.Long] = {
    val m = new java.util.HashMap[UTF8String, java.lang.Long](model.size * 2)
    model.foreach { case (g, c) => m.put(UTF8String.fromString(g), c) }
    m
  }

  override def nullSafeEval(input: Any): Any = {
    val s = input.asInstanceOf[UTF8String]
    val len = s.numChars()
    if (len < n) InternalRow(0L, 0L, 0L)
    else {
      val grams = len - n + 1
      var freq = 0L
      var oov = 0L
      var i = 0
      while (i < grams) {
        val c = counts.get(s.substringSQL(i + 1, n))
        if (c == null) oov += 1L else freq += c.longValue()
        i += 1
      }
      InternalRow(grams.toLong, freq, oov)
    }
  }

  override protected def withNewChildInternal(
      newChild: Expression): CharLmScoreExpr =
    copy(child = newChild)
}

object CharLmScoreExpr {
  val schema: StructType = StructType(Seq(
    StructField("n_grams", LongType),
    StructField("freq_sum", LongType),
    StructField("oov", LongType)))

  def apply(text: Column, model: Seq[(String, Long)], n: Int): Column =
    Bridge.column(CharLmScoreExpr(Bridge.expression(text), model, n))
}
