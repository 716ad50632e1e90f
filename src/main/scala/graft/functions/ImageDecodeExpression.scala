package graft.functions

import java.io.ByteArrayInputStream

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.sql.types._

/** Real image decode, scan-side, JDK-only: parses the payload bytes with
  * `javax.imageio.ImageIO` (PNG/JPEG/BMP/GIF — the readers bundled with
  * the JDK, no external imaging libraries) and emits the same feature
  * shape as [[graft.operators.Multimodal.featureSchema]]:
  * `(width, height, n_bytes, mean_intensity)`, where mean intensity is
  * the mean of the sRGB channel values over all pixels (0–255 scale).
  * Bytes that no reader recognizes — or that fail mid-decode — yield NULL
  * instead of failing the task, so one corrupt blob cannot kill a 100 TB
  * scan; callers separate decodable from non-decodable rows with a null
  * filter. Decoding runs inside the scan projection (one pass per row, no
  * UDF serialization, no shuffle), the same shape as the stub pipeline it
  * upgrades. */
case class ImageFeaturesExpr(child: Expression)
    extends UnaryExpression with CodegenFallback {

  override def dataType: DataType = ImageFeaturesExpr.schema
  override def nullable: Boolean = true
  override def prettyName: String = "image_features"

  override def nullSafeEval(input: Any): Any = {
    val bytes = input.asInstanceOf[Array[Byte]]
    try {
      val img = javax.imageio.ImageIO.read(new ByteArrayInputStream(bytes))
      if (img == null) null
      else {
        val w = img.getWidth
        val h = img.getHeight
        var sum = 0L
        var y = 0
        while (y < h) {
          var x = 0
          while (x < w) {
            val rgb = img.getRGB(x, y)
            sum += ((rgb >> 16) & 0xff) + ((rgb >> 8) & 0xff) + (rgb & 0xff)
            x += 1
          }
          y += 1
        }
        val pixels = w.toLong * h
        InternalRow(w, h, bytes.length.toLong,
          if (pixels == 0) 0.0 else sum.toDouble / (3.0 * pixels))
      }
    } catch { case _: Exception => null }
  }

  override protected def withNewChildInternal(newChild: Expression): ImageFeaturesExpr =
    copy(child = newChild)
}

object ImageFeaturesExpr {
  val schema: StructType = StructType(Seq(
    StructField("width", IntegerType, nullable = false),
    StructField("height", IntegerType, nullable = false),
    StructField("n_bytes", LongType, nullable = false),
    StructField("mean_intensity", DoubleType, nullable = false)))

  def apply(payload: Column): Column =
    Bridge.column(ImageFeaturesExpr(Bridge.expression(payload)))
}
