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
    ImageDecode.withGuardedReader(bytes) { (reader, w, h) =>
      val img = reader.read(0)
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
      InternalRow(w, h, bytes.length.toLong,
        sum.toDouble / (3.0 * (w.toLong * h)))
    }
  }

  override protected def withNewChildInternal(newChild: Expression): ImageFeaturesExpr =
    copy(child = newChild)
}

/** Scan-side image resize, JDK-only: decodes the payload (same readers
  * and decode-bomb guards as [[ImageFeaturesExpr]]), scales it to
  * `width` × `height` with bilinear interpolation, and re-encodes as PNG
  * bytes — the thumbnail/normalize step of a multimodal training
  * pipeline, run where the bytes already live (no UDF serialization, no
  * shuffle). Non-decodable or over-sized payloads yield NULL, so corrupt
  * blobs pass through as rows to filter, not task failures. */
case class ImageResizeExpr(child: Expression, targetWidth: Int, targetHeight: Int)
    extends UnaryExpression with CodegenFallback {
  require(targetWidth > 0 && targetHeight > 0, "resize dimensions must be positive")

  override def dataType: DataType = BinaryType
  override def nullable: Boolean = true
  override def prettyName: String = "image_resize"

  override def nullSafeEval(input: Any): Any = {
    val bytes = input.asInstanceOf[Array[Byte]]
    ImageDecode.withGuardedReader(bytes) { (reader, _, _) =>
      val src = reader.read(0)
      val dst = new java.awt.image.BufferedImage(targetWidth,
        targetHeight, java.awt.image.BufferedImage.TYPE_INT_RGB)
      val g = dst.createGraphics()
      try {
        g.setRenderingHint(
          java.awt.RenderingHints.KEY_INTERPOLATION,
          java.awt.RenderingHints.VALUE_INTERPOLATION_BILINEAR)
        g.drawImage(src, 0, 0, targetWidth, targetHeight, null)
      } finally g.dispose()
      val out = new java.io.ByteArrayOutputStream()
      javax.imageio.ImageIO.write(dst, "png", out)
      out.toByteArray
    }
  }

  override protected def withNewChildInternal(newChild: Expression): ImageResizeExpr =
    copy(child = newChild)
}

object ImageResizeExpr {
  def apply(payload: Column, width: Int, height: Int): Column =
    Bridge.column(ImageResizeExpr(Bridge.expression(payload), width, height))
}

/** Shared reader scaffolding of the image expressions. */
private[functions] object ImageDecode {

  /** Opens the payload with an in-memory ImageIO stream, applies the
    * decode-bomb guards, and hands the positioned reader (plus the
    * header's declared width/height) to `f`. Returns null — never throws —
    * for unrecognized, over-sized, or mid-decode-failing payloads, so one
    * corrupt blob cannot kill a scan task.
    *
    * MemoryCacheImageInputStream keeps decoding fully in memory —
    * `ImageIO.read(InputStream)` would otherwise spill a temp cache FILE
    * per row into java.io.tmpdir (`ImageIO.getUseCache` defaults true),
    * putting filesystem churn on the scan's hot path. The decode-bomb
    * guard reads the header's DECLARED dimensions without decoding a
    * pixel: a few-KB payload claiming 60000² pixels would otherwise
    * allocate a multi-GB raster and kill the task with an
    * OutOfMemoryError no Exception handler sees. */
  def withGuardedReader(bytes: Array[Byte])(
      f: (javax.imageio.ImageReader, Int, Int) => Any): Any = {
    val stream = new javax.imageio.stream.MemoryCacheImageInputStream(
      new ByteArrayInputStream(bytes))
    try {
      val readers = javax.imageio.ImageIO.getImageReaders(stream)
      if (!readers.hasNext) null
      else {
        val reader = readers.next()
        try {
          reader.setInput(stream, true, true)
          val w = reader.getWidth(0)
          val h = reader.getHeight(0)
          if (w <= 0 || h <= 0 || w.toLong * h > ImageFeaturesExpr.MaxPixels) null
          else f(reader, w, h)
        } finally reader.dispose()
      }
    } catch { case _: Exception => null }
    finally stream.close()
  }
}

object ImageFeaturesExpr {
  /** Largest DECLARED pixel count this expression will decode (64 M px ≈
    * a 256 MB ARGB raster) — payloads claiming more are treated as
    * non-decodable rather than allocated. */
  val MaxPixels: Long = 64L * 1024 * 1024

  val schema: StructType = StructType(Seq(
    StructField("width", IntegerType, nullable = false),
    StructField("height", IntegerType, nullable = false),
    StructField("n_bytes", LongType, nullable = false),
    StructField("mean_intensity", DoubleType, nullable = false)))

  def apply(payload: Column): Column =
    Bridge.column(ImageFeaturesExpr(Bridge.expression(payload)))
}
