package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Scan-side byte-pair-encoding tokenizer (Sennrich, Haddow & Birch 2016 —
  * the public BPE algorithm): whitespace pre-tokenization identical to
  * [[TextFunctions.tokens]] (`split(trim(text), "\\s+")`), then each word
  * is greedily merged under the FROZEN `merges` table — repeatedly find
  * the adjacent symbol pair with the lowest merge rank and fuse every
  * (left-to-right, non-overlapping) occurrence — until no listed pair
  * remains. Output is the concatenated token sequence across words
  * (`array<string>`); token COUNT is `size(...)` of it, the quantity a
  * training-data pipeline budgets in ([[graft.operators.Selection
  * .tokenBudgetPerStratum]], [[graft.operators.Packing.packSequences]])
  * once whitespace counts stop being model-true.
  *
  * The merge table is a frozen MODEL carried in the expression (the
  * [[graft.operators.Similarity]] centroid pattern, not a per-row column):
  * train it once with [[graft.operators.Bpe.train]], embed, and the
  * encode runs inside the scan projection — no UDF serialization, no
  * shuffle, no driver round-trips; executors receive the table with the
  * serialized plan and build the rank map once per task via the transient
  * lazy field. NULL text yields NULL; blank text yields an empty array.
  *
  * TWO SYMBOL MODES, matching the two public tokenizer families:
  *  - `byteLevel = false` (default): symbols are Java chars (UTF-16
  *    units) — the original Sennrich-style character BPE, matching the
  *    engine's `length`/`substring` arithmetic on BMP text. Non-BMP
  *    input splits surrogate pairs into invalid INTERMEDIATE tokens
  *    (still lossless on re-concat; the fixtures are BMP).
  *  - `byteLevel = true`: symbols are the word's UTF-8 BYTES, each
  *    carried as the Latin-1 char of its value — GPT-2-style byte-level
  *    BPE (Radford et al. 2019), robust for ARBITRARY Unicode including
  *    non-BMP: every token boundary is a byte boundary, and mapping
  *    token chars back to bytes always reassembles the exact original
  *    UTF-8 sequence (property-tested over surrogate-pair text in
  *    `PropertySpec`). The identity byte→char mapping is functionally
  *    GPT-2's `bytes_to_unicode` minus the cosmetic printable
  *    remapping, which only matters for human-readable vocab dumps. */
case class BpeEncodeExpr(child: Expression, merges: Seq[(String, String)],
                         byteLevel: Boolean = false)
    extends UnaryExpression with KernelCodegen {

  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def nullable: Boolean = true
  override def prettyName: String = "bpe_encode"

  @transient private lazy val rankOf: Map[(String, String), Int] =
    merges.zipWithIndex.toMap

  override def nullSafeEval(input: Any): Any = {
    val text = input.asInstanceOf[UTF8String].toString
    val out = scala.collection.mutable.ArrayBuffer.empty[UTF8String]
    text.trim.split("\\s+").foreach { w =>
      if (w.nonEmpty)
        encodeWord(w).foreach(t => out += UTF8String.fromString(t))
    }
    new GenericArrayData(out.toArray[Any])
  }

  /** Greedy rank-priority merging of one word. Cost per word is
    * O(len · applied merges) in the worst case — the same class as the
    * reference BPE implementations — and words are short, so the scan
    * stays row-local and bounded. */
  private def encodeWord(w: String): Seq[String] = {
    var syms = new scala.collection.mutable.ArrayBuffer[String](w.length)
    if (byteLevel) {
      val bs = w.getBytes(java.nio.charset.StandardCharsets.UTF_8)
      var bi = 0
      while (bi < bs.length) {
        syms += String.valueOf((bs(bi) & 0xff).toChar); bi += 1
      }
    } else {
      var ci = 0
      while (ci < w.length) { syms += String.valueOf(w.charAt(ci)); ci += 1 }
    }
    var done = syms.length < 2
    while (!done) {
      // lowest-rank pair currently present
      var bestRank = Int.MaxValue
      var i = 0
      while (i < syms.length - 1) {
        val r = rankOf.getOrElse((syms(i), syms(i + 1)), Int.MaxValue)
        if (r < bestRank) bestRank = r
        i += 1
      }
      if (bestRank == Int.MaxValue) done = true
      else {
        // fuse every left-to-right occurrence of that pair in one pass
        val (l, r) = merges(bestRank)
        val next = new scala.collection.mutable.ArrayBuffer[String](syms.length)
        var j = 0
        while (j < syms.length) {
          if (j < syms.length - 1 && syms(j) == l && syms(j + 1) == r) {
            next += l + r
            j += 2
          } else {
            next += syms(j)
            j += 1
          }
        }
        syms = next
        if (syms.length < 2) done = true
      }
    }
    syms.toSeq
  }

  override protected def withNewChildInternal(newChild: Expression): BpeEncodeExpr =
    copy(child = newChild)
}

object BpeEncodeExpr {
  def apply(text: Column, merges: Seq[(String, String)]): Column =
    Bridge.column(BpeEncodeExpr(Bridge.expression(text), merges))
  def apply(text: Column, merges: Seq[(String, String)],
            byteLevel: Boolean): Column =
    Bridge.column(BpeEncodeExpr(Bridge.expression(text), merges, byteLevel))
}
