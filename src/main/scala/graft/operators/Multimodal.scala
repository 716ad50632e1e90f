package graft.operators

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal-column plumbing: image/audio/video payloads are opaque
  * `binary` columns with a typed metadata struct riding alongside. The
  * Spark-side mechanics — schema, partition-parallel batched decode,
  * feature extraction shape — are real and tested. Two codec paths exist:
  * [[decodeImageFeatures]] REALLY decodes PNG/JPEG/BMP/GIF through the
  * JDK's `javax.imageio` (no external libraries needed) — it carries the
  * `multimodal_decode` and `image_pairs` contracts; the clearly-marked
  * DETERMINISTIC STUB (`fakeDecode`/[[decodeFeatures]]) remains only for
  * non-image media (no audio/video libraries exist in this container)
  * and as the spec's cross-check helper. Swapping in a richer decoder
  * only replaces the codec expression; every plan around it is unchanged.
  */
object Multimodal {

  /** Schema of a decoded-media feature row. */
  val featureSchema: StructType = StructType(Seq(
    StructField("width", IntegerType, nullable = false),
    StructField("height", IntegerType, nullable = false),
    StructField("n_bytes", LongType, nullable = false),
    StructField("mean_intensity", DoubleType, nullable = false)
  ))

  /** Wrap a string column as an opaque binary payload + metadata — the shape
    * a real pipeline gets from `spark.read.format("binaryFile")` or a
    * parquet `binary` column. Used by tests to fabricate media rows. */
  def asBinaryPayload(df: DataFrame, srcCol: String, mime: String): DataFrame =
    df.withColumn("payload", encode(col(srcCol), "UTF-8"))
      .withColumn("media_meta", struct(
        lit(mime).as("mime"),
        octet_length(encode(col(srcCol), "UTF-8")).cast("long").as("n_bytes")))

  /** DETERMINISTIC STUB decoder — a TEST FIXTURE SHAPE, not the
    * production path: the real decoder is [[decodeImageFeatures]] (native
    * [[graft.functions.ImageFeaturesExpr]], a true `javax.imageio` PNG/
    * JPEG/BMP/GIF decode with decode-bomb guards) — reach for that in any
    * pipeline. This stub derives fake width/height from the byte length
    * and a fake mean intensity from the byte sum — fully deterministic so
    * tests and oracles covering the PLUMBING (schema, partitioning, batch
    * shape) stay stable on non-image payloads. */
  def fakeDecode(bytes: Array[Byte]): Row = {
    val n = bytes.length.toLong
    val width = math.max(1, math.sqrt(n.toDouble).toInt)
    val height = math.max(1, (n / math.max(width, 1)).toInt)
    val mean =
      if (n == 0) 0.0
      else bytes.foldLeft(0L)((acc, b) => acc + (b & 0xff)).toDouble / n
    Row(width, height, n, mean)
  }

  /** Partition-parallel decode/feature-extract as a pure column pipeline:
    * geometry derives from `octet_length`, intensity from the native
    * [[graft.functions.MeanBytesExpr]] — the plan stays columnar and
    * whole-stage (an RDD mapPartitions would break both), and a real codec
    * slots in as another native expression of the same shape. Appends the
    * [[featureSchema]] fields; value-equivalent to [[fakeDecode]]
    * (cross-checked in tests). */
  def decodeFeatures(df: DataFrame, payloadCol: String): DataFrame = {
    val n = coalesce(octet_length(col(payloadCol)), lit(0)).cast("long")
    val width = greatest(lit(1), floor(sqrt(n.cast("double"))).cast("int"))
    df.withColumn("width", width)
      .withColumn("height", greatest(lit(1), (n / col("width")).cast("int")))
      .withColumn("n_bytes", n)
      .withColumn("mean_intensity",
        graft.functions.MeanBytesExpr(coalesce(col(payloadCol), lit(Array.empty[Byte]))))
  }

  /** REAL image decode branch (not a stub): payloads that are genuine
    * PNG/JPEG/BMP/GIF bytes decode scan-side through the JDK's
    * `javax.imageio` readers via the native
    * [[graft.functions.ImageFeaturesExpr]], producing a nullable
    * `img_features` struct with the [[featureSchema]] fields measured from
    * ACTUAL pixels; non-decodable payloads get NULL rather than failing
    * the task. Complements [[decodeFeatures]] (the deterministic stub for
    * synthetic fixtures): route rows by whether `img_features` is null to
    * get real features where the bytes allow and the stub elsewhere. */
  def decodeImageFeatures(df: DataFrame, payloadCol: String): DataFrame =
    df.withColumn("img_features",
      graft.functions.ImageFeaturesExpr(col(payloadCol)))

  /** REAL image resize (the thumbnail/normalize step): decodable payloads
    * are scaled to `width` × `height` (bilinear) and re-encoded as PNG
    * bytes via the native [[graft.functions.ImageResizeExpr]]; others get
    * NULL. Same decode-bomb guards as [[decodeImageFeatures]]. */
  def resizeImages(df: DataFrame, payloadCol: String,
                   width: Int, height: Int): DataFrame =
    df.withColumn("resized",
      graft.functions.ImageResizeExpr(col(payloadCol), width, height))

  /** Frame-sampling stub for video-like payloads: split the payload into
    * `frames` equal byte slices ("frames"), explode one row per sampled
    * frame with its index — the real partitioning/explode shape of a video
    * pipeline, with slicing standing in for frame extraction. */
  def sampleFrames(df: DataFrame, payloadCol: String, frames: Int): DataFrame = {
    val frameIdx = sequence(lit(0), lit(frames - 1))
    val total = octet_length(col(payloadCol))
    df.withColumn("frame_id", explode(frameIdx))
      .withColumn("frame_bytes",
        col(payloadCol).substr(
          (col("frame_id") * (total / frames) + 1).cast("int"),
          greatest((total / frames).cast("int"), lit(1))))
  }
}
