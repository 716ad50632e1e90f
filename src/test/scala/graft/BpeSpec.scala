package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.{functions => F}

import graft.operators.Bpe

class BpeSpec extends SparkSpec {
  import spark.implicits._

  // the classic BPE-paper-style corpus: merges are hand-derivable
  private def classicCorpus = (
    Seq.fill(5)("low") ++ Seq.fill(2)("lower") ++
      Seq.fill(6)("newest") ++ Seq.fill(3)("widest")
  ).toDF("text")

  test("train recovers the hand-derived merge sequence on the classic " +
    "low/lower/newest/widest corpus, ties broken lexicographically") {
    // pair counts round 0: (e,s)=9 and (s,t)=9 tie -> (e,s) first;
    // then (es,t)=9; then (l,o)=7 and (o,w)=7 tie -> (l,o); then (lo,w)=7
    val merges = Bpe.train(classicCorpus, col("text"), numMerges = 4)
    merges.map(m => (m.rank, m.left, m.right, m.count)) shouldBe Seq(
      (0, "e", "s", 9L),
      (1, "es", "t", 9L),
      (2, "l", "o", 7L),
      (3, "lo", "w", 7L))
  }

  test("encode replays merges by rank priority: 'lowest' (never seen in " +
    "training) tokenizes to [low, est]") {
    val merges = Bpe.train(classicCorpus, col("text"), numMerges = 4)
      .map(m => (m.left, m.right))
    val out = Seq("lowest", "low lower", "", "   ")
      .toDF("text")
      .select(Bpe.encode(col("text"), merges).as("toks"))
      .as[Seq[String]].collect()
    out(0) shouldBe Seq("low", "est")
    out(1) shouldBe Seq("low", "low", "e", "r") // words encoded separately
    out(2) shouldBe Seq.empty // blank -> no tokens
    out(3) shouldBe Seq.empty
  }

  test("training is deterministic: repeated runs and a repartitioned " +
    "corpus yield identical merge tables") {
    val docs = sources.Tables.load(spark, sf, "documents")
    val a = Bpe.train(docs, lower(trim(col("text"))), numMerges = 24)
    val b = Bpe.train(docs, lower(trim(col("text"))), numMerges = 24)
    val c = Bpe.train(docs.repartition(7), lower(trim(col("text"))),
      numMerges = 24)
    a shouldBe b
    a shouldBe c
  }

  test("merge-order invariant: selected pair counts are non-increasing in " +
    "rank (a merge only creates pairs bounded by its own count)") {
    val docs = sources.Tables.load(spark, sf, "documents")
    val merges = Bpe.train(docs, lower(trim(col("text"))), numMerges = 32)
    merges.map(_.rank) shouldBe (0 until merges.length)
    merges.map(_.count).sliding(2).foreach {
      case Seq(a, b) => a should be >= b
      case _ => ()
    }
    merges.length shouldBe 32 // the fixture corpus never exhausts at 32
  }

  test("incremental trainer is merge-for-merge identical to the naive " +
    "recount reference, to exhaustion, on the classic and fixture corpora") {
    // classic corpus, driven past exhaustion: every rank AND the early
    // stop must match
    val classicDict = Bpe.collectDict(classicCorpus, col("text"), 65536)
    Bpe.trainOnDict(classicDict.map { case (s, c) => (s.clone(), c) }, 500) shouldBe
      Bpe.trainReference(classicDict.map { case (s, c) => (s.clone(), c) }, 500)
    // fixture corpus: real word-frequency distribution, deep enough that
    // merged symbols recombine and counts collide (tie-break coverage)
    val docs = sources.Tables.load(spark, sf, "documents")
    val dict = Bpe.collectDict(docs, lower(trim(col("text"))), 65536)
    val inc = Bpe.trainOnDict(dict.map { case (s, c) => (s.clone(), c) }, 300)
    val ref = Bpe.trainReference(dict.map { case (s, c) => (s.clone(), c) }, 300)
    inc shouldBe ref
  }

  test("byte-level mode: identical to char mode on pure-ASCII corpora " +
    "(byte == UTF-16 unit there), and merges UTF-8 bytes across " +
    "character boundaries on multi-byte text") {
    // ASCII: same merges, same tokens — the modes only diverge beyond 0x7f
    val charMerges = Bpe.train(classicCorpus, col("text"), numMerges = 4)
    val byteMerges = Bpe.train(classicCorpus, col("text"), numMerges = 4,
      byteLevel = true)
    byteMerges shouldBe charMerges
    Seq("lowest").toDF("text")
      .select(Bpe.encode(col("text"), byteMerges.map(m => (m.left, m.right)),
        byteLevel = true).as("t")).as[Seq[String]].head() shouldBe
      Seq("low", "est")
    // multi-byte: 'é' is 0xc3 0xa9; a corpus of repeated "éé" words must
    // FIRST merge a byte pair interior to or across the character —
    // symbols char mode never sees
    val accented = Seq.fill(3)("éé").toDF("text")
    val bm = Bpe.train(accented, col("text"), numMerges = 1, byteLevel = true)
    bm.head.count shouldBe 6L // 3 words x (4 bytes -> adjacency count 2 for best? see below)
    // byte sequence per word: c3 a9 c3 a9 -> pairs (c3,a9)x2, (a9,c3)x1;
    // best = (c3,a9) with weighted count 3 words x 2 = 6
    (bm.head.left.charAt(0).toInt, bm.head.right.charAt(0).toInt) shouldBe
      ((0xc3, 0xa9))
    // and the encode under that merge yields 2 tokens per word, each an
    // 'é' byte pair that maps back to the original character
    val toks = Seq("éé").toDF("text")
      .select(Bpe.encode(col("text"), bm.map(m => (m.left, m.right)),
        byteLevel = true).as("t")).as[Seq[String]].head()
    toks.length shouldBe 2
    toks.foreach { t =>
      new String(t.toCharArray.map(_.toByte),
        java.nio.charset.StandardCharsets.UTF_8) shouldBe "é"
    }
  }

  test("encoding is lossless and counts match the closed form for " +
    "disjoint single-char pairs: tokens concatenate back to the word " +
    "chars; count = chars - pair occurrences") {
    val planted = Seq(("t", "h"), ("e", "r"), ("i", "n"), ("o", "u"), ("a", "l"))
    val docs = sources.Tables.load(spark, sf, "documents")
      .select(lower(trim(col("text"))).as("t"))
    val checked = docs.select(
      (concat_ws("", Bpe.encode(col("t"), planted)) ===
        regexp_replace(col("t"), "\\s+", "")).as("lossless"),
      (Bpe.tokenCount(col("t"), planted) ===
        F.length(regexp_replace(col("t"), "\\s+", "")).cast("long") -
          planted.map { case (l, r) =>
            ((F.length(col("t")) -
              F.length(replace(col("t"), lit(l + r), lit("")))) / 2)
              .cast("long")
          }.reduce(_ + _)).as("closed_form"))
      .agg(bool_and(col("lossless")).as("l"), bool_and(col("closed_form")).as("c"))
      .head()
    checked.getBoolean(0) shouldBe true
    checked.getBoolean(1) shouldBe true
  }

  test("save/load round-trips the trained tokenizer artifact rank-ordered") {
    val merges = Bpe.train(classicCorpus, col("text"), numMerges = 4)
    val p = java.nio.file.Files.createTempDirectory("graft_bpe").toString + "/m"
    Bpe.save(spark, merges, p)
    Bpe.load(spark, p) shouldBe merges
  }

  test("the frozen merge table encodes a STREAM scan-side (no model join, " +
    "no state) with batch-identical results") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx = spark.sqlContext
    val merges = Bpe.train(classicCorpus, col("text"), numMerges = 4)
      .map(m => (m.left, m.right))
    val mem = MemoryStream[String]
    val q = mem.toDF().select(col("value"),
        Bpe.encode(col("value"), merges).as("toks"))
      .writeStream.format("memory").queryName("bpe_stream").start()
    try {
      mem.addData("lowest", "newest widest")
      q.processAllAvailable()
      val got = spark.table("bpe_stream")
        .orderBy("value").as[(String, Seq[String])].collect()
      got shouldBe Array(
        ("lowest", Seq("low", "est")),
        ("newest widest", Seq("n", "e", "w", "est", "w", "i", "d", "est")))
    } finally q.stop()
  }

  test("trained-tokenizer counts plug into the token-budget selector " +
    "(model-true budgets, same operator)") {
    val merges = Bpe.train(classicCorpus, col("text"), numMerges = 4)
      .map(m => (m.left, m.right))
    val docs = Seq(
      (1L, "en", "low low"),         // [low][low] = 2 bpe tokens
      (2L, "en", "lowest newest"),   // [low,est] + [n,e,w,est] = 6
      (3L, "en", "wide wide wide")   // [w,i,d,e] x3 = 12
    ).toDF("doc_id", "lang", "text")
      .withColumn("ntok", Bpe.tokenCount(col("text"), merges))
    val kept = graft.operators.Selection.tokenBudgetPerStratum(
      docs, "lang", "ntok", budget = 8L,
      rankBy = Seq(col("doc_id")))
      .select("doc_id").as[Long].collect().toSet
    kept shouldBe Set(1L, 2L) // 2 + 6 fits the 8-token budget; 12 does not
  }
}
