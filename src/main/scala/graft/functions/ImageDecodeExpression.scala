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

/** Scan-side perceptual image hash (dHash), JDK-only: decodes the payload
  * (same readers and decode-bomb guards as [[ImageFeaturesExpr]]),
  * area-averages the grayscale pixels into a 9×8 grid, and emits a 64-bit
  * hash — bit (r, c) set iff grid(r, c) < grid(r, c+1), the row-wise
  * brightness gradient. Near-duplicate images (resizes, re-encodes, mild
  * edits) land within a few bits of each other, so the existing 64-bit
  * chunk-LSH banding ([[graft.operators.Dedup.hamming64Pairs]]) finds
  * image near-duplicates exactly like SimHash finds text ones. The
  * downscale is an explicit box average over integer cell boundaries —
  * not Graphics2D resampling — so the hash is a pure arithmetic function
  * of the decoded pixels. Non-decodable payloads yield NULL, not task
  * failures. */
case class ImageDHashExpr(child: Expression)
    extends UnaryExpression with CodegenFallback {

  override def dataType: DataType = LongType
  override def nullable: Boolean = true
  override def prettyName: String = "image_dhash"

  override def nullSafeEval(input: Any): Any = {
    val bytes = input.asInstanceOf[Array[Byte]]
    ImageDecode.withGuardedReader(bytes) { (reader, w, h) =>
      val img = reader.read(0)
      val cols = 9; val rows = 8
      val sums = Array.ofDim[Double](rows, cols)
      val counts = Array.ofDim[Long](rows, cols)
      var y = 0
      while (y < h) {
        // target row: floor(y * rows / h) — every source pixel lands in
        // exactly one cell, so the grid is a partition (a true box filter)
        val r = (y.toLong * rows / h).toInt
        var x = 0
        while (x < w) {
          val c = (x.toLong * cols / w).toInt
          val rgb = img.getRGB(x, y)
          val gray = (((rgb >> 16) & 0xff) + ((rgb >> 8) & 0xff) + (rgb & 0xff)) / 3.0
          sums(r)(c) += gray
          counts(r)(c) += 1
          x += 1
        }
        y += 1
      }
      var hash = 0L
      var r = 0
      while (r < rows) {
        var c = 0
        while (c < cols - 1) {
          // empty cells (w < 9 or h < 8) average to 0 — deterministic
          val a = if (counts(r)(c) == 0) 0.0 else sums(r)(c) / counts(r)(c)
          val b = if (counts(r)(c + 1) == 0) 0.0 else sums(r)(c + 1) / counts(r)(c + 1)
          if (a < b) hash |= 1L << (r * (cols - 1) + c)
          c += 1
        }
        r += 1
      }
      hash
    }
  }

  override protected def withNewChildInternal(newChild: Expression): ImageDHashExpr =
    copy(child = newChild)
}

object ImageDHashExpr {
  def apply(payload: Column): Column =
    Bridge.column(ImageDHashExpr(Bridge.expression(payload)))
}

/** Deterministic grayscale-PNG synthesis: interprets the payload bytes as
  * 8-bit gray intensities tiled row-major (cyclically) over a `imgWidth` ×
  * `imgHeight` canvas and encodes a real PNG through `javax.imageio` —
  * genuine image bytes fabricated from any deterministic byte source, so
  * contract queries and specs can exercise the REAL decode/resize/hash
  * path on tables that ship no image columns. `blockSize` > 1 paints each
  * byte as a `blockSize`-square block instead of a single pixel, giving
  * the image the low-frequency structure natural photos have — byte-per-
  * pixel output is white noise, which no resampling-stable perceptual
  * hash can survive (measured: dHash hamming ~15/64 after a 2:1 resize of
  * noise vs ~1/64 of block texture). Gray PNG encoding is lossless, so
  * the decoded pixels are exactly the painted intensities.
  *
  * `srgb = true` paints the same intensities as r=g=b pixels of an sRGB
  * (TYPE_INT_RGB) image instead of a gray-colorspace one. The gray
  * variant is right for the perceptual-hash paths (dHash reads raster
  * samples), but `getRGB` over decoded GRAY pixels passes through Java's
  * linear-gray → sRGB conversion (measured: sample 10 reads back 56), so
  * [[ImageFeaturesExpr]]'s mean_intensity over a gray synthesis is a
  * gamma-bent mean no SQL oracle can replay; over an sRGB synthesis the
  * channel values round-trip IDENTICALLY (PNG lossless, no colorspace
  * conversion), making mean_intensity exactly the payload-byte mean. */
case class GrayPngExpr(child: Expression, imgWidth: Int, imgHeight: Int,
                       blockSize: Int = 1, srgb: Boolean = false)
    extends UnaryExpression with CodegenFallback {
  require(imgWidth > 0 && imgHeight > 0, "image dimensions must be positive")
  require(blockSize > 0, "blockSize must be positive")
  require(imgWidth.toLong * imgHeight <= ImageFeaturesExpr.MaxPixels,
    "refusing to synthesize an image larger than the decode-bomb guard")

  override def dataType: DataType = BinaryType
  override def nullable: Boolean = true
  override def prettyName: String = "gray_png"

  override def nullSafeEval(input: Any): Any = {
    val bytes = input.asInstanceOf[Array[Byte]]
    if (bytes.isEmpty) null
    else {
      val img = new java.awt.image.BufferedImage(imgWidth, imgHeight,
        if (srgb) java.awt.image.BufferedImage.TYPE_INT_RGB
        else java.awt.image.BufferedImage.TYPE_BYTE_GRAY)
      val raster = img.getRaster
      // ceil division: a partial right-edge column is its own block — an
      // integer floor here would alias it onto the next block-row's first
      // byte whenever blockSize does not divide imgWidth
      val blocksPerRow = (imgWidth + blockSize - 1) / blockSize
      var y = 0
      while (y < imgHeight) {
        var x = 0
        while (x < imgWidth) {
          val block = (y / blockSize) * blocksPerRow + (x / blockSize)
          val v = bytes(block % bytes.length) & 0xff
          if (srgb) img.setRGB(x, y, (v << 16) | (v << 8) | v)
          else raster.setSample(x, y, 0, v)
          x += 1
        }
        y += 1
      }
      val out = new java.io.ByteArrayOutputStream()
      javax.imageio.ImageIO.write(img, "png", out)
      out.toByteArray
    }
  }

  override protected def withNewChildInternal(newChild: Expression): GrayPngExpr =
    copy(child = newChild)
}

object GrayPngExpr {
  def apply(payload: Column, width: Int, height: Int): Column =
    Bridge.column(GrayPngExpr(Bridge.expression(payload), width, height, 1))
  def apply(payload: Column, width: Int, height: Int, blockSize: Int): Column =
    Bridge.column(GrayPngExpr(Bridge.expression(payload), width, height,
      blockSize))
  def srgb(payload: Column, width: Int, height: Int, blockSize: Int): Column =
    Bridge.column(GrayPngExpr(Bridge.expression(payload), width, height,
      blockSize, srgb = true))
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
