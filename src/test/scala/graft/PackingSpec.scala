package graft

import org.apache.spark.sql.functions._

import graft.operators.{Packing, Selection}

class PackingSpec extends SparkSpec {
  import spark.implicits._

  private def pack(rows: Seq[(Long, Long, Int)], capacity: Long) =
    Packing.packSequences(
      rows.toDF("doc_id", "ntok", "shard"), "doc_id", "ntok",
      capacity, "shard")
      .as[(Long, Int, Long)].collect().sortBy(_._1)

  test("next-fit packs in id order and rolls the bin on overflow") {
    // capacity 10: [4, 5] fill bin 0 (9 <= 10), 3 overflows -> bin 1,
    // 7 still fits bin 1 exactly (3 + 7 = 10)
    val got = pack(Seq((1L, 4L, 0), (2L, 5L, 0), (3L, 3L, 0), (4L, 7L, 0)), 10)
    got.map(r => r._1 -> r._3) shouldBe Seq(1L -> 0L, 2L -> 0L, 3L -> 1L, 4L -> 1L)
  }

  test("shards pack independently: same walk per shard, seq resets") {
    val got = pack(Seq(
      (1L, 6L, 0), (2L, 6L, 0),   // shard 0: two bins
      (3L, 3L, 1), (4L, 3L, 1)),  // shard 1: one bin
      10)
    got.map(r => (r._1, r._2, r._3)) shouldBe
      Seq((1L, 0, 0L), (2L, 0, 1L), (3L, 1, 0L), (4L, 1, 0L))
  }

  test("a document larger than capacity gets a bin of its own, and the " +
    "next document opens a fresh bin") {
    val got = pack(Seq((1L, 25L, 0), (2L, 2L, 0), (3L, 2L, 0)), 10)
    // 25 > 10: own bin 0; 2 can't join it (25+2 > 10) -> bin 1; 2 fits bin 1
    got.map(r => r._1 -> r._3) shouldBe Seq(1L -> 0L, 2L -> 1L, 3L -> 1L)
  }

  test("zero-token documents ride along in the open bin and never roll it") {
    val got = pack(Seq((1L, 10L, 0), (2L, 0L, 0), (3L, 1L, 0)), 10)
    // bin 0 is exactly full; the 0-token doc still fits (10+0 <= 10),
    // the 1-token doc rolls to bin 1
    got.map(r => r._1 -> r._3) shouldBe Seq(1L -> 0L, 2L -> 0L, 3L -> 1L)
  }

  test("assignment is independent of input row order and partitioning") {
    val rows = (1L to 200L).map(i => (i, (i * 7) % 23 + 1, (i % 4).toInt))
    val base = pack(rows, 50)
    val shuffled = Packing.packSequences(
      rows.reverse.toDF("doc_id", "ntok", "shard")
        .repartition(7), "doc_id", "ntok", 50, "shard")
      .as[(Long, Int, Long)].collect().sortBy(_._1)
    shuffled shouldBe base
  }

  test("no bin exceeds capacity except single-oversize-doc bins") {
    val rows = (1L to 300L).map(i => (i, (i * 13) % 40 + 1, (i % 3).toInt))
    val assigned = Packing.packSequences(
      rows.toDF("doc_id", "ntok", "shard"), "doc_id", "ntok", 64, "shard")
    val byBin = assigned.toDF("doc_id", "shard", "seq")
      .join(rows.toDF("doc_id", "ntok", "shard"), Seq("doc_id", "shard"))
      .groupBy("shard", "seq")
      .agg(sum("ntok").as("fill"), count(lit(1)).as("n"))
      .collect()
    byBin.foreach { r =>
      val over = r.getAs[Long]("fill") > 64
      if (over) r.getAs[Long]("n") shouldBe 1L
    }
  }

  private def chunks(text: String, chunkTokens: Int, overlap: Int) =
    Packing.chunkDocuments(Seq((1L, text)).toDF("doc_id", "text"),
        "text", "doc_id", chunkTokens, overlap)
      .select("chunk", "chunk_text", "n_tokens")
      .as[(Long, String, Long)].collect().sortBy(_._1)

  test("chunkDocuments slides a window with the requested overlap and a " +
    "short final chunk") {
    // 7 tokens, window 4, overlap 2 -> starts 0, 2, 4 (n-overlap = 5)
    val got = chunks("a b c d e f g", 4, 2)
    got shouldBe Seq((0L, "a b c d", 4L), (1L, "c d e f", 4L), (2L, "e f g", 3L))
  }

  test("chunkDocuments never emits a fully-redundant trailing chunk") {
    // 6 tokens, window 4, overlap 2 -> starts 0, 2 (start 4 would add
    // only tokens already covered by the start-2 window)
    val got = chunks("a b c d e f", 4, 2)
    got shouldBe Seq((0L, "a b c d", 4L), (1L, "c d e f", 4L))
  }

  test("chunkDocuments yields one chunk for short docs and none for blank") {
    chunks("a b", 16, 4) shouldBe Seq((0L, "a b", 2L))
    chunks("   ", 16, 4) shouldBe Seq.empty
  }

  test("chunkDocuments with zero overlap tiles the document exactly") {
    val got = chunks("a b c d e", 2, 0)
    got shouldBe Seq((0L, "a b", 2L), (1L, "c d", 2L), (2L, "e", 1L))
  }

  test("sampleStrata keeps strata at their md5 rate: 1.0 keeps all, 0.0 " +
    "none, and membership is deterministic and key-stable") {
    val df = (0L until 400L).map(i => (i, if (i % 2 == 0) "a" else "b"))
      .toDF("id", "g")
    val out = Selection.sampleStrata(df, "g", "id",
      Map("a" -> 1.0, "b" -> 0.0))
    out.filter(col("g") === "a").count() shouldBe 200L
    out.filter(col("g") === "b").count() shouldBe 0L
    // a fractional rate is reproducible row-for-row across invocations
    val r1 = Selection.sampleStrata(df, "g", "id", Map("a" -> 0.3),
      defaultRate = 0.7).select("id").as[Long].collect().sorted
    val r2 = Selection.sampleStrata(df, "g", "id", Map("a" -> 0.3),
      defaultRate = 0.7).select("id").as[Long].collect().sorted
    r1 shouldBe r2
    r1.nonEmpty shouldBe true
  }

  test("sampleStrata hit rate tracks the requested rate (md5 uniformity)") {
    val df = (0L until 2000L).map(i => (i, "x")).toDF("id", "g")
    val kept = Selection.sampleStrata(df, "g", "id", Map("x" -> 0.5)).count()
    kept.toDouble / 2000.0 shouldBe 0.5 +- 0.05
  }

  test("chunking and mixture sampling compose in Structured Streaming: " +
    "stateless scan-side ops apply per micro-batch with batch semantics") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sql = spark.sqlContext
    val mem = MemoryStream[(Long, String, String)]
    val stream = mem.toDF.toDF("doc_id", "lang", "text")
    val sampled = Selection.sampleStrata(stream, "lang", "doc_id",
      Map("en" -> 1.0, "zh" -> 0.0))
    val chunked = Packing.chunkDocuments(sampled, "text", "doc_id",
      chunkTokens = 3, overlap = 0)
    val q = chunked.writeStream.format("memory").queryName("pack_chunks")
      .outputMode("append").start()
    try {
      mem.addData((1L, "en", "a b c d e"), (2L, "zh", "x y z"))
      q.processAllAvailable()
      val batch = spark.table("pack_chunks")
        .select("doc_id", "chunk", "chunk_text")
        .as[(Long, Long, String)].collect().sortBy(r => (r._1, r._2))
      // zh doc sampled out; en doc chunked exactly as the batch operator does
      batch shouldBe Seq((1L, 0L, "a b c"), (1L, 1L, "d e"))
      val expected = Packing.chunkDocuments(
        Seq((1L, "a b c d e")).toDF("doc_id", "text"), "text", "doc_id", 3, 0)
        .select("doc_id", "chunk", "chunk_text")
        .as[(Long, Long, String)].collect().sortBy(r => (r._1, r._2))
      batch shouldBe expected
    } finally q.stop()
  }
}
