package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.sql.types.{DataType, LongType}
import org.apache.spark.unsafe.types.UTF8String

/** Rabin–Karp polynomial rolling hash over a string's UTF-8 bytes:
  * h = Σ h·31 + byte, with natural 64-bit overflow — the classic document
  * fingerprint (order-sensitive, unlike a bag-of-shingles hash), computed
  * in one compiled pass. Base 31 matches the JVM's String.hashCode family
  * of hashes; operating on bytes keeps it encoding-deterministic across
  * languages. */
case class PolyHashExpr(child: Expression)
    extends UnaryExpression with KernelCodegen {

  override def dataType: DataType = LongType
  override def prettyName: String = "poly_hash"

  override def nullSafeEval(input: Any): Any = {
    val bytes = input.asInstanceOf[UTF8String].getBytes
    var h = 0L
    var i = 0
    while (i < bytes.length) { h = h * 31L + (bytes(i) & 0xff); i += 1 }
    h
  }

  override protected def withNewChildInternal(newChild: Expression): PolyHashExpr =
    copy(child = newChild)
}

object PolyHashExpr {
  def apply(s: Column): Column = Bridge.column(PolyHashExpr(Bridge.expression(s)))
}
