package graft

import org.apache.spark.sql.functions._

import graft.operators.CorpusStats

class CorpusStatsSpec extends SparkSpec {
  import spark.implicits._

  private val docs = Seq(
    (1L, "the quick brown fox jumps"),
    (2L, "the quick brown cat sleeps"),
    (3L, "the quick brown fox runs"),
    (4L, "entirely different words here now"),
    (5L, "")
  ).toDF("doc_id", "text")

  test("vocabTopK counts DOCUMENT frequency (not occurrences) of word " +
    "n-grams and orders by df desc then gram") {
    val top = CorpusStats.vocabTopK(docs, "text", "doc_id",
        shingleSize = 3, k = 3)
      .as[(String, Long)].collect()
    // "the quick brown" appears in docs 1,2,3; "quick brown fox" in 1,3
    top.head shouldBe ("the quick brown", 3L)
    top(1) shouldBe ("quick brown fox", 2L)
    // everything else is df=1; the k=3 cut takes the lexicographically
    // first of the df=1 grams
    top(2)._2 shouldBe 1L
  }

  test("a document repeating a shingle still counts once toward df " +
    "(shingle sets are distinct per document)") {
    val rep = Seq(
      (1L, "a b c a b c a b c"), // "a b c" many times, one doc
      (2L, "a b c only")
    ).toDF("doc_id", "text")
    val top = CorpusStats.vocabTopK(rep, "text", "doc_id",
        shingleSize = 3, k = 1)
      .as[(String, Long)].collect()
    top.head shouldBe ("a b c", 2L)
  }

  test("tfidfTopK ranks per-document terms by tf*ln(N/df) with round-6 " +
    "tie-break on the term, excludes corpus-universal terms at weight 0, " +
    "and skips blank documents") {
    val out = CorpusStats.tfidfTopK(docs, "text", "doc_id", k = 2)
      .orderBy("doc_id", "rank")
      .as[(Long, String, Long, Long, Double, Long)].collect()
    // doc 5 is blank: tokenizes to [""] which is excluded -> absent
    out.map(_._1).distinct.sorted shouldBe Array(1L, 2L, 3L, 4L)
    // "the" appears in 4 of 5 docs -> idf = ln(5/4) > 0 but small;
    // doc-unique words (df=1) get idf = ln(5) and outrank it
    val doc1 = out.filter(_._1 == 1L)
    doc1.map(_._2).toSet shouldBe Set("jumps", "fox")
    doc1.foreach { r => r._5 shouldBe math.round(
      r._3 * math.log(5.0 / r._4) * 1e6) / 1e6 +- 1e-9 }
    // rank is contiguous from 1 within each doc
    out.groupBy(_._1).values.foreach { rows =>
      rows.map(_._6).sorted shouldBe (1L to rows.length).toArray
    }
  }

  test("tfidfTopK WindowGroupLimit pre-cut appears in the physical plan " +
    "(per-document top-k is cut before the final exchange)") {
    val q = CorpusStats.tfidfTopK(docs, "text", "doc_id", k = 2)
    q.queryExecution.executedPlan.toString should include("WindowGroupLimit")
  }

  test("vocabTopK plans TakeOrderedAndProject — each task keeps k rows, " +
    "no global sort of the vocabulary") {
    val q = CorpusStats.vocabTopK(docs, "text", "doc_id", shingleSize = 3,
      k = 3)
    q.queryExecution.executedPlan.toString should include("TakeOrderedAndProject")
  }

  test("groupOverlap counts distinct shared grams per group pair, once " +
    "per gram regardless of per-group repetition") {
    val byGroup = Seq(
      (1L, "g1", "alpha beta gamma"),   // 3-grams (size 3): {alpha beta gamma}
      (2L, "g1", "alpha beta gamma"),   // same gram again in g1 — counted once
      (3L, "g2", "alpha beta gamma"),
      (4L, "g2", "delta epsilon zeta"),
      (5L, "g3", "delta epsilon zeta")
    ).toDF("doc_id", "grp", "text")
    val got = CorpusStats.groupOverlap(byGroup, "text", "grp", shingleSize = 3)
      .as[(String, String, Long)].collect().sorted
    got shouldBe Array(("g1", "g2", 1L), ("g2", "g3", 1L))
  }

  test("groupOverlap pairs are ordered (a < b) and disjoint groups are absent") {
    val byGroup = Seq(
      (1L, "b", "one two three"),
      (2L, "a", "one two three"),
      (3L, "c", "entirely different content")
    ).toDF("doc_id", "grp", "text")
    val got = CorpusStats.groupOverlap(byGroup, "text", "grp", shingleSize = 3)
      .as[(String, String, Long)].collect()
    got shouldBe Array(("a", "b", 1L))
  }

  test("groupOverlap maxGroups drops boilerplate grams present in more " +
    "groups than the cap before the self-join") {
    val byGroup = Seq(
      (1L, "g1", "common boiler plate"), // in ALL three groups (g = 3)
      (2L, "g2", "common boiler plate"),
      (3L, "g3", "common boiler plate"),
      (4L, "g1", "alpha beta gamma"),    // only g1, g2 (g = 2)
      (5L, "g2", "alpha beta gamma")
    ).toDF("doc_id", "grp", "text")
    // uncapped: the ubiquitous gram links every pair
    CorpusStats.groupOverlap(byGroup, "text", "grp", shingleSize = 3)
      .as[(String, String, Long)].collect().sorted shouldBe
      Array(("g1", "g2", 2L), ("g1", "g3", 1L), ("g2", "g3", 1L))
    // maxGroups = 2 drops the 3-group gram; only the rare gram's pair stays
    CorpusStats.groupOverlap(byGroup, "text", "grp", shingleSize = 3,
        maxGroups = 2)
      .as[(String, String, Long)].collect().sorted shouldBe
      Array(("g1", "g2", 1L))
  }

  test("charLmScore: hand-checked gram accounting, topV cut sends rare " +
    "grams to oov, short and empty docs score zero") {
    val tiny = Seq(
      (1L, "aaab"),  // grams: aaa, aab
      (2L, "aaaa"),  // grams: aaa, aaa
      (3L, "xyz"),   // grams: xyz
      (4L, "ab"),    // < 3 chars -> no grams
      (5L, "")
    ).toDF("doc_id", "text")
    // full model (topV ample): counts are aaa=3, aab=1, xyz=1
    val full = CorpusStats.charLmScore(tiny, "text", "doc_id", n = 3,
        topV = 100)
      .orderBy("doc_id").as[(Long, Long, Long, Long)].collect()
    full shouldBe Array(
      (1L, 2L, 4L, 0L), // aaa(3) + aab(1)
      (2L, 2L, 6L, 0L), // aaa(3) twice
      (3L, 1L, 1L, 0L),
      (4L, 0L, 0L, 0L),
      (5L, 0L, 0L, 0L))
    // topV=1 keeps only aaa (count desc, gram asc): aab/xyz become oov
    val cut = CorpusStats.charLmScore(tiny, "text", "doc_id", n = 3,
        topV = 1)
      .orderBy("doc_id").as[(Long, Long, Long, Long)].collect()
    cut shouldBe Array(
      (1L, 2L, 3L, 1L),
      (2L, 2L, 6L, 0L),
      (3L, 1L, 0L, 1L),
      (4L, 0L, 0L, 0L),
      (5L, 0L, 0L, 0L))
  }

  test("charLmApplyScan (the zero-shuffle expression path charLmScore now " +
    "takes) matches the join-based charLmApply row for row on the fixture " +
    "corpus, including non-ASCII and short docs") {
    val docs01 = spark.read.parquet(s"$sf/documents.parquet")
      .select(col("doc_id"), col("text"))
      .unionByName(Seq((900001L, "héllо wörld héllо wörld"), // non-ASCII
        (900002L, "ab"), (900003L, "")).toDF("doc_id", "text"))
    val model = CorpusStats.charLmModel(docs01, "text", n = 3, topV = 500)
    val viaJoin = CorpusStats.charLmApply(model, docs01, "text", "doc_id",
        n = 3)
      .orderBy("doc_id").as[(Long, Long, Long, Long)].collect()
    val collected = model.collect().map(r => (r.getString(0), r.getLong(1))).toSeq
    val viaScan = CorpusStats.charLmApplyScan(collected, docs01, "text",
        "doc_id", n = 3)
      .orderBy("doc_id").as[(Long, Long, Long, Long)].collect()
    viaScan shouldBe viaJoin
    // and the scan path's plan carries no exchange before presentation
    val plan = CorpusStats.charLmApplyScan(collected, docs01, "text",
      "doc_id", n = 3).queryExecution.executedPlan.toString
    plan should not include "Exchange"
  }

  test("charLmApply scores a STREAM against a frozen model identically " +
    "to the batch path (train-offline / score-on-ingest regime)") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx = spark.sqlContext
    val train = Seq((1L, "aaab"), (2L, "aaaa"), (3L, "xyz"))
      .toDF("doc_id", "text")
    val model = CorpusStats.charLmModel(train, "text", n = 3, topV = 100)
      .localCheckpoint(true) // frozen: the stream joins a static relation
    val incoming = Seq((10L, "aaab"), (11L, "xyzaaa"), (12L, "qqq"))
    val mem = MemoryStream[(Long, String)]
    val q = CorpusStats.charLmApply(model,
        mem.toDF().toDF("doc_id", "text"), "text", "doc_id", n = 3)
      .writeStream.format("memory").queryName("lm_stream")
      .outputMode("complete").start()
    try {
      mem.addData(incoming: _*)
      q.processAllAvailable()
      val got = spark.table("lm_stream")
        .orderBy("doc_id").as[(Long, Long, Long, Long)].collect()
      val want = CorpusStats.charLmApply(model,
          incoming.toDF("doc_id", "text"), "text", "doc_id", n = 3)
        .orderBy("doc_id").as[(Long, Long, Long, Long)].collect()
      got shouldBe want
      // and the scores are the frozen model's view: aaa=3 from TRAINING
      want.head shouldBe ((10L, 2L, 4L, 0L)) // aaa(3)+aab(1), as in training
    } finally q.stop()
  }

  test("charLmScore scores the whole fixture corpus with consistent " +
    "totals (freq_sum bounded by n_grams * max model count; oov + " +
    "in-model occurrences = n_grams)") {
    val docs01 = spark.read.parquet(s"$sf/documents.parquet")
    val out = CorpusStats.charLmScore(docs01, "text", "doc_id")
      .as[(Long, Long, Long, Long)].collect()
    out.length shouldBe docs01.count()
    out.foreach { case (id, n, fs, oov) =>
      withClue(s"doc $id: ") {
        oov should be <= n
        if (n == 0) fs shouldBe 0L
        // every in-model gram contributes at least count 1
        fs should be >= (n - oov)
      }
    }
  }
}
