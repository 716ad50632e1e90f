package graft

import org.apache.spark.sql.functions._

import graft.operators.Multimodal

class MultimodalSpec extends SparkSpec {
  import spark.implicits._

  private val docs = Seq((1L, "hello world"), (2L, ""), (3L, "héllo wörld"))
    .toDF("doc_id", "text")

  test("decodeFeatures column pipeline matches the fakeDecode spec per row") {
    val payload = Multimodal.asBinaryPayload(docs, "text", "text/plain")
    val out = payload.transform(Multimodal.decodeFeatures(_, "payload"))
      .select("doc_id", "width", "height", "n_bytes", "mean_intensity")
      .orderBy("doc_id").collect()
    val expected = payload.select("doc_id", "payload").orderBy("doc_id")
      .collect().map { r =>
        val f = Multimodal.fakeDecode(r.getAs[Array[Byte]](1))
        (r.getLong(0), f.getInt(0), f.getInt(1), f.getLong(2), f.getDouble(3))
      }
    out.map(r => (r.getLong(0), r.getInt(1), r.getInt(2), r.getLong(3),
      r.getDouble(4))) shouldBe expected
  }

  test("multibyte text: n_bytes counts UTF-8 bytes, not characters") {
    val payload = Multimodal.asBinaryPayload(docs, "text", "text/plain")
    val r = payload.transform(Multimodal.decodeFeatures(_, "payload"))
      .filter(col("doc_id") === 3L).select("n_bytes").head()
    r.getLong(0) shouldBe 13L // 11 chars, 2 of them 2-byte
  }

  test("sRGB synthesis round-trips intensities through the real codec " +
    "exactly: ImageFeaturesExpr mean == payload byte mean (the gray " +
    "variant gamma-bends it through the linear-gray -> sRGB conversion)") {
    import graft.functions.{GrayPngExpr, ImageFeaturesExpr}
    val payload = Array[Byte](10, 100, -128, -1) // 10, 100, 128, 255
    val rawMean = Seq(10, 100, 128, 255).sum / 4.0
    val means = Seq((1L, payload)).toDF("id", "p").select(
        ImageFeaturesExpr(GrayPngExpr.srgb(col("p"), 4, 4, 2))
          .getField("mean_intensity").as("srgb_mean"),
        ImageFeaturesExpr(GrayPngExpr(col("p"), 4, 4, 2))
          .getField("mean_intensity").as("gray_mean"))
      .head()
    means.getDouble(0) shouldBe rawMean // exact: fp sums /256 are exact
    means.getDouble(1) should be > rawMean // gamma lifts midtones
  }

  test("decodeImageFeatures REALLY decodes a PNG (javax.imageio) and NULLs " +
    "non-decodable payloads instead of failing the scan") {
    // build a genuine 2x2 PNG in memory: channel means are exactly computable
    val img = new java.awt.image.BufferedImage(2, 2,
      java.awt.image.BufferedImage.TYPE_INT_RGB)
    img.setRGB(0, 0, 0xffffff)  // (255,255,255)
    img.setRGB(1, 0, 0x000000)  // (0,0,0)
    img.setRGB(0, 1, 0xff0000)  // (255,0,0)
    img.setRGB(1, 1, 0x00ff00)  // (0,255,0)
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", bos)
    val png = bos.toByteArray
    val rows = Seq((1L, png), (2L, "not an image".getBytes("UTF-8")))
      .toDF("doc_id", "payload")
    val out = Multimodal.decodeImageFeatures(rows, "payload")
      .select("doc_id", "img_features").orderBy("doc_id").collect()
    val feat = out(0).getStruct(1)
    feat.getInt(0) shouldBe 2                 // width
    feat.getInt(1) shouldBe 2                 // height
    feat.getLong(2) shouldBe png.length.toLong
    // mean over 12 channel values: (3*255 + 0 + 255 + 255) / 12 = 106.25
    feat.getDouble(3) shouldBe 106.25 +- 1e-9
    out(1).isNullAt(1) shouldBe true          // junk bytes -> NULL, no failure
  }

  test("resizeImages scales a real PNG to the target geometry (round-trip " +
    "decodable) and NULLs junk payloads") {
    val img = new java.awt.image.BufferedImage(4, 4,
      java.awt.image.BufferedImage.TYPE_INT_RGB)
    (0 until 4).foreach(y => (0 until 4).foreach(x =>
      img.setRGB(x, y, if ((x + y) % 2 == 0) 0xffffff else 0x000000)))
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", bos)
    val rows = Seq((1L, bos.toByteArray), (2L, "junk".getBytes("UTF-8")))
      .toDF("doc_id", "payload")
    val out = Multimodal.resizeImages(rows, "payload", 2, 2)
      .select("doc_id", "resized").orderBy("doc_id").collect()
    val resized = javax.imageio.ImageIO.read(
      new java.io.ByteArrayInputStream(out(0).getAs[Array[Byte]](1)))
    resized.getWidth shouldBe 2
    resized.getHeight shouldBe 2
    out(1).isNullAt(1) shouldBe true
  }

  test("imageDHashPairs finds a real resized-duplicate PNG and leaves an " +
    "unrelated image unpaired") {
    val rows = Seq((1L, ImageFixtures.photo), (3L, ImageFixtures.other),
      (4L, "junk".getBytes("UTF-8")))
      .toDF("doc_id", "payload")
    val resized = graft.operators.Multimodal.resizeImages(
        rows.filter(col("doc_id") === 1L), "payload", 32, 32)
      .select(lit(2L).as("doc_id"), col("resized").as("payload"))
    val all = rows.unionByName(resized)
    val pairs = graft.operators.Dedup.imageDHashPairs(all, "payload", "doc_id")
      .collect()
    // exactly the planted (original, half-size copy) pair — the unrelated
    // image pairs with nothing and the junk payload hashes to NULL
    pairs.map(r => (r.getLong(0), r.getLong(1))) shouldBe Array((1L, 2L))
    pairs.head.getAs[Number]("hamming").intValue should be <= 6
  }

  test("image dHash properties: deterministic, brightness-shift invariant, " +
    "NULL on junk/empty, and GrayPng round-trips its painted pixels") {
    import graft.functions.{GrayPngExpr, ImageDHashExpr}
    val rows = Seq(
      (1L, "some document text"),
      (2L, "other words entirely different"),
      (3L, "")).toDF("doc_id", "text")
    val pngs = rows.select(col("doc_id"),
      GrayPngExpr(encode(col("text"), "UTF-8"), 32, 32, 4).as("png"))
    // empty payload -> NULL png -> NULL hash; junk bytes -> NULL hash
    val hashed = pngs.select(col("doc_id"), ImageDHashExpr(col("png")).as("h"))
      .orderBy("doc_id").collect()
    hashed(0).isNullAt(1) shouldBe false
    hashed(1).isNullAt(1) shouldBe false
    hashed(2).isNullAt(1) shouldBe true // empty text -> no image
    Seq((9L, "junk".getBytes("UTF-8"))).toDF("id", "p")
      .select(ImageDHashExpr(col("p"))).head().isNullAt(0) shouldBe true
    // determinism: same bytes, same hash, across separate evaluations
    val again = pngs.select(col("doc_id"), ImageDHashExpr(col("png")).as("h"))
      .orderBy("doc_id").collect()
    again.map(r => if (r.isNullAt(1)) None else Some(r.getLong(1))) shouldBe
      hashed.map(r => if (r.isNullAt(1)) None else Some(r.getLong(1)))
    // distinct content -> distant hashes (not a constant function)
    java.lang.Long.bitCount(hashed(0).getLong(1) ^ hashed(1).getLong(1)) should be > 4
    // brightness-shift invariance: dHash reads gradients, not levels —
    // painting every pixel +40 gray levels must not change a single bit
    def grayPng(f: Int => Int): Array[Byte] = {
      val img = new java.awt.image.BufferedImage(32, 32,
        java.awt.image.BufferedImage.TYPE_BYTE_GRAY)
      (0 until 32 * 32).foreach(i =>
        img.getRaster.setSample(i % 32, i / 32, 0, f(i) & 0xff))
      val bos = new java.io.ByteArrayOutputStream()
      javax.imageio.ImageIO.write(img, "png", bos)
      bos.toByteArray
    }
    val tex = (i: Int) => (i * 37) % 180
    val shifted = Seq((1L, grayPng(tex)), (2L, grayPng(i => tex(i) + 40)))
      .toDF("id", "p").select(ImageDHashExpr(col("p")).as("h"))
      .collect().map(_.getLong(0))
    shifted(0) shouldBe shifted(1)
    // GrayPng paints exactly the input bytes (lossless gray round-trip)
    val png = Seq((1L, Array[Byte](10, 20, 30, 40))).toDF("id", "p")
      .select(GrayPngExpr(col("p"), 2, 2, 1)).head().getAs[Array[Byte]](0)
    val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(png))
    (img.getWidth, img.getHeight) shouldBe ((2, 2))
    Seq((0, 0, 10), (1, 0, 20), (0, 1, 30), (1, 1, 40)).foreach {
      case (x, y, v) => img.getRaster.getSample(x, y, 0) shouldBe v
    }
    // non-divisible block layout: a partial right-edge column is its OWN
    // block (ceil division), never the next block-row's first byte —
    // 5x3 canvas, blockSize 2 -> 3 blocks per block-row, 2 block-rows
    val png2 = Seq((1L, Array[Byte](1, 2, 3, 4, 5, 6))).toDF("id", "p")
      .select(GrayPngExpr(col("p"), 5, 3, 2)).head().getAs[Array[Byte]](0)
    val img2 = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(png2))
    // block-row 0 (y in 0..1): bytes 1,1,2,2,3 ; block-row 1 (y=2): 4,4,5,5,6
    (0 until 5).map(x => img2.getRaster.getSample(x, 0, 0)) shouldBe
      Seq(1, 1, 2, 2, 3)
    (0 until 5).map(x => img2.getRaster.getSample(x, 1, 0)) shouldBe
      Seq(1, 1, 2, 2, 3)
    (0 until 5).map(x => img2.getRaster.getSample(x, 2, 0)) shouldBe
      Seq(4, 4, 5, 5, 6)
  }

  test("audio: pcm_wav -> audio_features round-trips the closed-form " +
    "features; corrupt and non-audio bytes yield NULL") {
    import graft.functions.{AudioFeaturesExpr, PcmWavExpr}
    val rows = Seq((5, 100, 23), (7, 3000, 800), (1, 1, 2))
      .toDF("period", "amp", "n")
    val out = rows.select(AudioFeaturesExpr(PcmWavExpr(
        col("period"), col("amp"), col("n"))).as("f"))
      .select("f.sample_rate", "f.channels", "f.n_samples", "f.sum_abs",
        "f.zero_crossings")
      .collect().map(r =>
        (r.getInt(0), r.getInt(1), r.getLong(2), r.getLong(3), r.getLong(4)))
    out shouldBe Array(
      (8000, 1, 23L, 23L * 100, 22L / 5),
      (8000, 1, 800L, 800L * 3000, 799L / 7),
      (8000, 1, 2L, 2L, 1L)) // period 1: every adjacent pair flips sign
    val junk = Seq(
      Array[Byte](1, 2, 3),
      "RIFFxxxxWAVE".getBytes("US-ASCII"),
      Array.empty[Byte]).toDF("payload")
    junk.select(AudioFeaturesExpr(col("payload")).as("f"))
      .collect().foreach(_.isNullAt(0) shouldBe true)
  }

  test("audio: a WAV written by javax.sound itself (not our synthesizer) " +
    "decodes to the same features — the reader handles real-world WAVs") {
    import graft.functions.AudioFeaturesExpr
    // 16-bit mono PCM square wave, period 4, amp 250, 40 samples, via the
    // JDK's own WAV writer
    val n = 40; val period = 4; val amp = 250
    val pcm = java.nio.ByteBuffer.allocate(n * 2)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    (0 until n).foreach { i =>
      pcm.putShort((if ((i / period) % 2 == 0) amp else -amp).toShort)
    }
    val fmt = new javax.sound.sampled.AudioFormat(8000f, 16, 1, true, false)
    val ais = new javax.sound.sampled.AudioInputStream(
      new java.io.ByteArrayInputStream(pcm.array()), fmt, n.toLong)
    val out = new java.io.ByteArrayOutputStream()
    javax.sound.sampled.AudioSystem.write(ais,
      javax.sound.sampled.AudioFileFormat.Type.WAVE, out)
    val row = Seq(Tuple1(out.toByteArray)).toDF("payload")
      .select(AudioFeaturesExpr(col("payload")).as("f"))
      .select("f.n_samples", "f.sum_abs", "f.zero_crossings")
      .head()
    (row.getLong(0), row.getLong(1), row.getLong(2)) shouldBe
      (40L, 40L * 250, 39L / 4)
  }

  test("sampleFrames slices payload bytes into indexed frames") {
    val payload = Multimodal.asBinaryPayload(docs.filter(col("doc_id") === 1L),
      "text", "text/plain")
    val frames = Multimodal.sampleFrames(payload, "payload", 4)
      .select(col("frame_id"), col("frame_bytes").cast("string"))
      .orderBy("frame_id").collect()
    frames.length shouldBe 4
    // 11 bytes / 4 -> frame length 2, starts at trunc(i*2.75)+1 = 1,3,6,9
    frames.map(_.getString(1)) shouldBe Array("he", "ll", " w", "rl")
  }
}
