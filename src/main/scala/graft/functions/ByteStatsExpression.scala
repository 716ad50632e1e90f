package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.sql.types.{DataType, DoubleType}

/** Mean unsigned-byte value of a binary payload (0.0 for empty) — the
  * "mean intensity" of the multimodal decode stub, as a native expression
  * so the decode path stays a pure column pipeline (no RDD detour, scan
  * stays columnar/whole-stage). A real decoder would replace this with a
  * codec call of the same shape. */
case class MeanBytesExpr(child: Expression)
    extends UnaryExpression with KernelCodegen {

  override def dataType: DataType = DoubleType
  override def prettyName: String = "mean_bytes"

  override def nullSafeEval(input: Any): Any = {
    val bytes = input.asInstanceOf[Array[Byte]]
    if (bytes.isEmpty) 0.0
    else {
      var acc = 0L
      var i = 0
      while (i < bytes.length) { acc += (bytes(i) & 0xff); i += 1 }
      acc.toDouble / bytes.length
    }
  }

  override protected def withNewChildInternal(newChild: Expression): MeanBytesExpr =
    copy(child = newChild)
}

object MeanBytesExpr {
  def apply(payload: Column): Column =
    Bridge.column(MeanBytesExpr(Bridge.expression(payload)))
}
