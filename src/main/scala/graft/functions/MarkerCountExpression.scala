package graft.functions

import org.apache.spark.sql.Column

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.sql.types.{ArrayType, DataType, IntegerType}
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst expression counting, per marker list, how many tokens of
  * the input array belong to that list — the language-ID / stopword-count
  * primitive. Returns `array<int>` with one count per list (same contract
  * as [[TextFunctions.langScoreHof]] applied per language).
  *
  * Why a custom expression: the HOF spec evaluates a `filter` lambda with a
  * per-language OR-chain through an interpreted projection per token — for
  * language-ID over five languages that is 5 × tokens interpreted steps per
  * document (plus a re-tokenize per language), and it sits on the scan-side
  * path of every curation query (language-ID, stopword ratio, quality
  * score). This expression makes ONE compiled pass over the token array
  * with a hash-map marker lookup, producing every language's count at once.
  * Invoked through [[KernelCodegen]] so the enclosing projection stays
  * inside its WholeStageCodegen span; the loop body is compiled Scala.
  */
case class MarkerCountsExpr(child: Expression, markers: Seq[Seq[String]])
    extends UnaryExpression with KernelCodegen {

  require(markers.nonEmpty, "at least one marker list")

  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  override def prettyName: String = "marker_counts"

  // token -> indices of every marker list containing it (a marker like
  // "la" may belong to several languages)
  @transient private lazy val lookup: java.util.HashMap[UTF8String, Array[Int]] = {
    val m = new java.util.HashMap[UTF8String, Array[Int]]()
    markers.zipWithIndex.foreach { case (ws, i) =>
      ws.foreach { w =>
        val k = UTF8String.fromString(w)
        val prev = m.get(k)
        m.put(k, if (prev == null) Array(i) else prev :+ i)
      }
    }
    m
  }

  override def nullSafeEval(input: Any): Any = {
    val tokens = input.asInstanceOf[ArrayData]
    val counts = new Array[Int](markers.size)
    val n = tokens.numElements()
    var i = 0
    while (i < n) {
      val t = tokens.getUTF8String(i)
      if (t != null) {
        val hits = lookup.get(t)
        if (hits != null) {
          var j = 0
          while (j < hits.length) { counts(hits(j)) += 1; j += 1 }
        }
      }
      i += 1
    }
    val out = new Array[AnyRef](counts.length)
    var k = 0
    while (k < counts.length) { out(k) = Int.box(counts(k)); k += 1 }
    new GenericArrayData(out)
  }

  override protected def withNewChildInternal(newChild: Expression): MarkerCountsExpr =
    copy(child = newChild)
}

object MarkerCountsExpr {
  def apply(tokens: Column, markers: Seq[Seq[String]]): Column =
    Bridge.column(MarkerCountsExpr(Bridge.expression(tokens), markers))
}
