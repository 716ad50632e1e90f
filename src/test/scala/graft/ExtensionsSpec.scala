package graft

import org.apache.spark.sql.functions._

case class NationRow(n_nationkey: Int, n_name: String, n_regionkey: Int)

class ExtensionsSpec extends SparkSpec {
  import spark.implicits._

  test("registered SQL functions: word_shingles / simhash64 / vec_dot") {
    GraftExtensions.register(spark)
    val r = spark.sql(
      """SELECT word_shingles(array('a','b','c','d'), 3) AS sh,
        |       simhash64(array('x','y')) AS sim,
        |       vec_dot(array(1.0D, 2.0D), array(3.0D, 4.0D)) AS d""".stripMargin)
      .head()
    r.getSeq[String](0).toSet shouldBe Set("a b c", "b c d")
    r.getDouble(2) shouldBe 11.0
    spark.sql("SELECT char_grams('ababa', 3) AS g").head()
      .getSeq[String](0) shouldBe Seq("aba", "bab", "aba")
    // SQL value == Column-API value
    val viaColumn = Seq(Seq("x", "y")).toDF("t")
      .select(functions.HashFunctions.simHash(col("t"))).as[Long].head()
    r.getLong(1) shouldBe viaColumn
  }

  test("the extensions class injects the as-of planner strategy and " +
    "optimizer rule (the spark.sql.extensions path for new sessions)") {
    val ext = new org.apache.spark.sql.SparkSessionExtensions
    new GraftExtensions()(ext)
    import org.apache.spark.sql.graftbridge.Bridge
    Bridge.builtStrategies(ext, spark) should contain (plans.AsofJoinStrategy)
    Bridge.builtOptimizerRules(ext, spark) should contain (
      plans.AsofJoinOptimizations)
  }

  test("vec_dot rejects non-float/double element arrays at ANALYSIS time " +
    "(codegen's getDouble on array<int> would reinterpret raw bytes)") {
    GraftExtensions.register(spark)
    // would previously reach codegen and return garbage under whole-stage
    // codegen while the interpreted path threw — now both fail loudly
    // before execution, and float arrays still work
    an[org.apache.spark.sql.AnalysisException] should be thrownBy
      spark.sql("SELECT vec_dot(array(1, 2), array(3, 4))").head()
    spark.sql(
      "SELECT vec_dot(array(CAST(1.0 AS FLOAT), CAST(2.0 AS FLOAT)), " +
        "array(CAST(3.0 AS FLOAT), CAST(4.0 AS FLOAT))) AS d")
      .head().getDouble(0) shouldBe 11.0
  }

  test("simhash64 skips NULL tokens instead of NPEing (concat_ws-style), " +
    "so SQL callers can pass arrays with explicit NULLs") {
    GraftExtensions.register(spark)
    val r = spark.sql(
      """SELECT simhash64(array('x', CAST(NULL AS STRING), 'y')) AS withNull,
        |       simhash64(array('x', 'y')) AS without""".stripMargin).head()
    r.getLong(0) shouldBe r.getLong(1)
  }

  test("minhash_sig SQL function == Column API; composes with word_shingles " +
    "in one SQL expression") {
    GraftExtensions.register(spark)
    val viaSql = spark.sql(
      "SELECT minhash_sig(word_shingles(array('a','b','c','d'), 2), 16) AS s")
      .head().getSeq[Long](0)
    val viaColumn = Seq(Seq("a", "b", "c", "d")).toDF("t")
      .select(functions.HashFunctions.minHash(
        functions.HashFunctions.wordShingles(col("t"), 2), 16))
      .head().getSeq[Long](0)
    viaSql shouldBe viaColumn
    viaSql.length shouldBe 16
  }

  test("image_dhash + image_resize SQL functions compose: a half-size copy " +
    "lands within the pair radius of its original") {
    GraftExtensions.register(spark)
    val r = Seq((1L, ImageFixtures.photo)).toDF("id", "payload")
      .selectExpr(
        "bit_count(image_dhash(payload) ^ " +
          "image_dhash(image_resize(payload, 32, 32))) AS ham",
        "image_dhash(CAST('junk' AS BINARY)) AS junk")
      .head()
    r.getInt(0) should be <= 6
    r.isNullAt(1) shouldBe true
  }

  test("image_features SQL function decodes a real PNG and NULLs junk bytes") {
    GraftExtensions.register(spark)
    val img = new java.awt.image.BufferedImage(1, 2,
      java.awt.image.BufferedImage.TYPE_INT_RGB)
    img.setRGB(0, 0, 0xffffff)
    img.setRGB(0, 1, 0x000000)
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", bos)
    val r = Seq((1L, bos.toByteArray), (2L, Array[Byte](1, 2, 3)))
      .toDF("id", "payload")
      .selectExpr("id", "image_features(payload) AS f")
      .orderBy("id").collect()
    r(0).getStruct(1).getInt(0) shouldBe 1   // width
    r(0).getStruct(1).getInt(1) shouldBe 2   // height
    r(0).getStruct(1).getDouble(3) shouldBe 127.5 // (255*3 + 0*3) / 6
    r(1).isNullAt(1) shouldBe true
  }

  test("extensions class injects the same functions at session build time") {
    // The shared session already exists, so exercise the injection hook
    // directly against its extensions list shape: the class must be
    // constructible and expose the full registered-function set.
    new GraftExtensions()
    GraftExtensions.functions.map(_._1.funcName).toSet shouldBe
      Set("word_shingles", "char_grams", "simhash64", "minhash_sig",
        "vec_dot", "poly_hash", "image_features", "image_dhash",
        "image_resize", "audio_features", "pcm_wav",
        "kll_quantile", "kll_rank", "kll_sketch", "kll_merge", "bpe_encode")
  }

  test("audio SQL functions compose: pcm_wav synthesis decodes to the " +
    "closed-form features; junk bytes NULL") {
    GraftExtensions.register(spark)
    val r = spark.sql(
      """SELECT f.n_samples, f.sum_abs, f.zero_crossings,
        |  audio_features(CAST('junk' AS BINARY)) AS junk
        |FROM (SELECT audio_features(pcm_wav(6, 500, 100)) AS f)""".stripMargin)
      .head()
    (r.getLong(0), r.getLong(1), r.getLong(2)) shouldBe (100L, 50000L, 16L)
    r.isNullAt(3) shouldBe true
  }

  test("kll_quantile / kll_rank SQL faces accept the canonical literal " +
    "shapes: bare 0.5 (DECIMAL), integer values, BIGINT pcm_wav args") {
    GraftExtensions.register(spark)
    (1 to 100).map(_.toDouble).toDF("v")
      .agg(functions.KllSketchAgg(col("v"), 200).as("sk"))
      .createOrReplaceTempView("kll_sql_face")
    // 0.5 parses as DECIMAL(1,1); 50 as INT — both must coerce, not throw
    val r = spark.sql(
      """SELECT kll_quantile(sk, 0.5) AS q, kll_rank(sk, 50) AS rk
        |FROM kll_sql_face""".stripMargin).head()
    r.getDouble(0) should (be >= 40.0 and be <= 60.0)
    r.getDouble(1) should (be >= 0.4 and be <= 0.6)
    // pcm_wav with BIGINT args (6L etc.) must coerce to INT
    val wav = spark.sql(
      "SELECT audio_features(pcm_wav(6L, 500L, 100L)) AS f").head().getStruct(0)
    (wav.getLong(2), wav.getLong(3)) shouldBe (100L, 50000L)
  }

  test("the whole mergeable percentile rollup is expressible in pure SQL: " +
    "kll_sketch fine -> kll_merge coarse -> kll_quantile query") {
    GraftExtensions.register(spark)
    (1 to 100).map(i => (i % 4, i.toDouble)).toDF("g", "v")
      .createOrReplaceTempView("kll_rollup_sql")
    val r = spark.sql(
      """SELECT kll_quantile(kll_merge(sk), 0.5) AS med FROM (
        |  SELECT g, kll_sketch(v) AS sk FROM kll_rollup_sql GROUP BY g)""".stripMargin)
      .head().getDouble(0)
    r should (be >= 40.0 and be <= 60.0)
    // integer values coerce like percentile_approx's input
    spark.sql("SELECT kll_sketch(g, 128) FROM kll_rollup_sql").head()
      .getAs[Array[Byte]](0).length should be > 0
  }

  test("bpe_encode SQL face == Scala API for a literal merge table, and " +
    "rejects a non-foldable or malformed one") {
    GraftExtensions.register(spark)
    val viaSql = spark.sql(
      """SELECT bpe_encode('lowest', array(array('e','s'), array('es','t'),
        |  array('l','o'), array('lo','w'))) AS t""".stripMargin)
      .head().getSeq[String](0)
    viaSql shouldBe Seq("low", "est")
    val viaApi = Seq("lowest").toDF("x")
      .select(graft.operators.Bpe.encode(col("x"),
        Seq(("e", "s"), ("es", "t"), ("l", "o"), ("lo", "w"))))
      .head().getSeq[String](0)
    viaSql shouldBe viaApi
    an[Exception] should be thrownBy spark.sql(
      "SELECT bpe_encode('x', array(array('a'))) ").collect() // not 2-wide
  }

  test("typed Dataset face of a table (Dataset[NationRow])") {
    val ds = sources.Tables.typed[NationRow](spark, sf, "nation")
    ds.filter(_.n_regionkey == 0).collect().foreach(_.n_regionkey shouldBe 0)
    ds.count() shouldBe 25
  }

  test("mapGroupsWithState running totals accumulate across micro-batches") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(Long, Double)]
    val q = graft.streaming.StreamOps.runningTotals(mem.toDS())
      .toDF("k", "n", "total")
      .writeStream.format("memory").queryName("so_running")
      .outputMode("update").start()
    try {
      mem.addData((1L, 2.0), (1L, 3.0), (2L, 10.0))
      q.processAllAvailable()
      mem.addData((1L, 5.0))
      q.processAllAvailable()
      val latest = spark.table("so_running")
        .groupBy("k").agg(max("n").as("n"), max("total").as("total"))
        .orderBy("k").collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
      latest shouldBe Array((1L, 3L, 10.0), (2L, 1L, 10.0))
    } finally q.stop()
  }
}
