package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Scan-side boilerplate-line removal against a FROZEN line set — the
  * zero-shuffle apply half of [[graft.operators.Dedup
  * .dropBoilerplateLines]]: one compiled pass per document splits on
  * newlines, drops every line whose trimmed form is in the (hash-set)
  * model, and re-joins the survivors in order, emitting
  * `(text, n_lines, n_dropped)` as one struct. No explode, no
  * doc-frequency join, no reassembly exchange — the whole clean is a
  * projection inside the scan, which also makes it STREAM-NATIVE (a plain
  * stateless select on a streaming DataFrame). The model ships with the
  * serialized plan like the BPE merge table and the IVF centroids; use
  * the join-based operator when the model must stay a relation (unbounded
  * or data-dependent boilerplate). NULL text yields NULL. */
// CodegenFallback here is DELIBERATE (r22 A/B): this kernel is expensive
// per row (real decode / line-split work), and inside a fused
// whole-stage span its evaluation can be duplicated across the filter
// and projection consumers of the output column — the focused bench read
// image_pairs 2.5 -> 3.3 s and corpus_dedup 3.5 -> 4.2 s with real
// doGenCode (KernelCodegen) before this was reverted. The fallback's
// forced materialization evaluates the kernel once per row; the span
// break it causes is noise next to the kernel's own cost. The CHEAP
// arithmetic kernels (shingles, signatures, hashes) take the opposite
// trade — see KernelCodegen.
case class BoilerplateFilterExpr(child: Expression, boiler: Seq[String])
    extends UnaryExpression with CodegenFallback {

  override def dataType: DataType = BoilerplateFilterExpr.schema
  override def nullable: Boolean = true
  override def prettyName: String = "drop_boilerplate_lines"

  @transient private lazy val set: java.util.HashSet[String] = {
    val s = new java.util.HashSet[String](boiler.size * 2)
    boiler.foreach(l => s.add(l.trim))
    s
  }

  override def nullSafeEval(input: Any): Any = {
    val text = input.asInstanceOf[UTF8String].toString
    val lines = text.split("\n", -1)
    val kept = new StringBuilder
    var nKept = 0
    var i = 0
    while (i < lines.length) {
      if (!set.contains(lines(i).trim)) {
        if (nKept > 0) kept.append('\n')
        kept.append(lines(i))
        nKept += 1
      }
      i += 1
    }
    InternalRow(UTF8String.fromString(kept.toString),
      lines.length.toLong, (lines.length - nKept).toLong)
  }

  override protected def withNewChildInternal(
      newChild: Expression): BoilerplateFilterExpr =
    copy(child = newChild)
}

object BoilerplateFilterExpr {
  val schema: StructType = StructType(Seq(
    StructField("text", StringType),
    StructField("n_lines", LongType),
    StructField("n_dropped", LongType)))

  def apply(text: Column, boiler: Seq[String]): Column =
    Bridge.column(BoilerplateFilterExpr(Bridge.expression(text), boiler))
}
