package graft

import scala.collection.mutable.ArrayBuffer

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

import graft.sinks.SnapshotStore
import graft.streaming.StreamOps

/** Cross-batch duplicate suppression with durable bounded state
  * (SnapshotStore-backed), exact and near variants. */
class StreamDedupSpec extends SparkSpec {
  import spark.implicits._

  private def tmpRoot(prefix: String): String =
    java.nio.file.Files.createTempDirectory(prefix).resolve("state").toString

  test("streaming exact dedup: a fingerprint seen in ANY earlier batch is " +
    "suppressed; state holds fingerprints + ids only (no text)") {
    val root = tmpRoot("graft_sdx")
    implicit val sql = spark.sqlContext
    val mem = MemoryStream[(Long, String)]
    val emitted = ArrayBuffer[Long]()
    val q = StreamOps.dedupeExactAgainstStore(
      mem.toDF.toDF("doc_id", "text"), "text", "doc_id", root) { (df, _) =>
      emitted ++= df.select("doc_id").as[Long].collect()
    }
    try {
      // batch 1: doc 2 is a whitespace-normalized dup of doc 1 (in-batch)
      mem.addData((1L, "the quick brown fox"),
        (2L, "the   quick  brown fox "), (3L, "other content entirely"))
      q.processAllAvailable()
      emitted.sorted shouldBe Seq(1L, 3L)
      // batch 2: doc 4 duplicates batch 1's doc 1 (cross-batch), doc 5 fresh
      mem.addData((4L, "the quick brown fox"), (5L, "brand new document"))
      q.processAllAvailable()
      emitted.sorted shouldBe Seq(1L, 3L, 5L)
      // batch 3: re-delivery of an already-retained id is also suppressed
      mem.addData((1L, "the quick brown fox"))
      q.processAllAvailable()
      emitted.sorted shouldBe Seq(1L, 3L, 5L)
    } finally q.stop()
    // bounded, text-free state: one (fp, id) row per retained document
    val state = SnapshotStore.read(spark, root).get
    state.columns.sorted shouldBe Array("doc_id", "fp")
    state.count() shouldBe 3L
  }

  test("streaming exact dedup state is DURABLE across query restarts: a new " +
    "query against the same store still suppresses documents retained by " +
    "the previous one") {
    val root = tmpRoot("graft_sdr")
    implicit val sql = spark.sqlContext
    val mem1 = MemoryStream[(Long, String)]
    val emitted = ArrayBuffer[Long]()
    val q1 = StreamOps.dedupeExactAgainstStore(
      mem1.toDF.toDF("doc_id", "text"), "text", "doc_id", root) { (df, _) =>
      emitted ++= df.select("doc_id").as[Long].collect()
    }
    try {
      mem1.addData((1L, "durable content one"), (2L, "durable content two"))
      q1.processAllAvailable()
    } finally q1.stop()
    emitted.sorted shouldBe Seq(1L, 2L)
    // fresh query, fresh source, fresh checkpoint — same store
    val mem2 = MemoryStream[(Long, String)]
    val q2 = StreamOps.dedupeExactAgainstStore(
      mem2.toDF.toDF("doc_id", "text"), "text", "doc_id", root) { (df, _) =>
      emitted ++= df.select("doc_id").as[Long].collect()
    }
    try {
      mem2.addData((3L, "durable content one"), (4L, "fresh after restart"))
      q2.processAllAvailable()
    } finally q2.stop()
    // doc 3 duplicates doc 1 from BEFORE the restart
    emitted.sorted shouldBe Seq(1L, 2L, 4L)
  }

  test("streaming near dedup: minhash-signature state suppresses cross-batch " +
    "NEAR-duplicates; state holds signatures + ids only") {
    val root = tmpRoot("graft_sdn")
    implicit val sql = spark.sqlContext
    val mem = MemoryStream[(Long, String)]
    val emitted = ArrayBuffer[Long]()
    val q = StreamOps.dedupeNearAgainstStore(
      mem.toDF.toDF("doc_id", "text"), "text", "doc_id", root,
      shingleSize = 3, numHashes = 64, bands = 16, threshold = 0.4) { (df, _) =>
      emitted ++= df.select("doc_id").as[Long].collect()
    }
    try {
      mem.addData(
        (1L, "the quick brown fox jumps over the lazy dog and runs away fast"),
        (2L, "completely different text about spark structured streaming state"))
      q.processAllAvailable()
      emitted.sorted shouldBe Seq(1L, 2L)
      // doc 3 is a one-word edit of doc 1 (cross-batch near-dup,
      // true Jaccard 8/14 ≈ 0.57); doc 4 is unrelated
      mem.addData(
        (3L, "the quick brown fox jumps over the lazy cat and runs away fast"),
        (4L, "yet another unrelated document entirely about database engines"))
      q.processAllAvailable()
      emitted.sorted shouldBe Seq(1L, 2L, 4L)
      // in-batch near-dup: smaller id wins, larger suppressed
      mem.addData(
        (5L, "gamma delta epsilon zeta eta theta iota kappa lambda mu nu xi"),
        (6L, "gamma delta epsilon zeta eta theta iota kappa lambda mu nu pi"))
      q.processAllAvailable()
      emitted.sorted shouldBe Seq(1L, 2L, 4L, 5L)
    } finally q.stop()
    val state = SnapshotStore.read(spark, root).get
    state.columns.sorted shouldBe Array("doc_id", "sig")
    state.count() shouldBe 4L
    // text is never stored; signatures are fixed-width (numHashes longs)
    state.selectExpr("max(size(sig))").head().getInt(0) shouldBe 64

    // restart durability: a FRESH query against the same store still
    // suppresses near-duplicates of docs retained before the restart...
    val emitted2 = ArrayBuffer[Long]()
    val mem2 = MemoryStream[(Long, String)]
    val q2 = StreamOps.dedupeNearAgainstStore(
      mem2.toDF.toDF("doc_id", "text"), "text", "doc_id", root,
      shingleSize = 3, numHashes = 64, bands = 16, threshold = 0.4) { (df, _) =>
      emitted2 ++= df.select("doc_id").as[Long].collect()
    }
    try {
      mem2.addData(
        (7L, "the quick brown fox jumps over the lazy dog and runs away far"),
        (8L, "something wholly new that matches nothing retained before now ok"))
      q2.processAllAvailable()
    } finally q2.stop()
    emitted2.sorted shouldBe Seq(8L)

    // ...and a numHashes config change against the same store fails fast
    // AT CONSTRUCTION — before the query even starts (the width check runs
    // once against the existing store, not per micro-batch) — instead of
    // silently capping similarity (zip_with null padding)
    val mem3 = MemoryStream[(Long, String)]
    val ex = intercept[IllegalArgumentException] {
      StreamOps.dedupeNearAgainstStore(
        mem3.toDF.toDF("doc_id", "text"), "text", "doc_id", root,
        shingleSize = 3, numHashes = 32, bands = 16, threshold = 0.4) { (_, _) => () }
    }
    ex.getMessage should include("width")
  }

  test("within-batch band cap counts each batch document once: a bucket at " +
    "exactly maxBucket entries still generates candidate pairs") {
    val root = tmpRoot("graft_sdc")
    implicit val sql = spark.sqlContext
    val mem = MemoryStream[(Long, String)]
    val emitted = ArrayBuffer[Long]()
    // 4 identical docs collide in EVERY band, so each bucket holds exactly
    // maxBucket=4 batch entries. Sizing the self-join pass from the
    // batch∪batch union counted them twice (8 > 4), dropped every bucket,
    // and let all four duplicates through — recall silently halved.
    val q = StreamOps.dedupeNearAgainstStore(
      mem.toDF.toDF("doc_id", "text"), "text", "doc_id", root,
      shingleSize = 3, numHashes = 64, bands = 16, threshold = 0.4,
      maxBucket = 4) { (df, _) =>
      emitted ++= df.select("doc_id").as[Long].collect()
    }
    try {
      val text = "identical boilerplate paragraph repeated across mirror sites"
      mem.addData((11L, text), (12L, text), (13L, text), (14L, text))
      q.processAllAvailable()
    } finally q.stop()
    emitted.sorted shouldBe Seq(11L)
  }

  test("TTL key dedup (flatMapGroupsWithState + ProcessingTimeTimeout): " +
    "first occurrence passes, duplicates are suppressed while state is " +
    "fresh, and an evicted key is re-admitted after expiry") {
    implicit val sql = spark.sqlContext
    val mem = MemoryStream[(Long, String)]
    val emitted = ArrayBuffer[(Long, String)]()
    // TTL sized >> batch duration: state-store batches run ~100-400 ms
    // here, and the cross-batch suppression assertion needs key 1 still
    // alive when batch 2 processes — a tight TTL makes the test racy
    val deduped = StreamOps.dedupeKeysWithTTL(
      mem.toDF.toDF("event_id", "payload"), Seq("event_id"), ttlMs = 2000L)
    // Explicit trigger interval (see the operator scaladoc): processing-
    // time timeouts re-trigger empty batches so expiries can fire; the
    // interval also means processAllAvailable cannot be starved by a 0 ms
    // busy loop. Assertions after the TTL phase POLL instead of calling
    // processAllAvailable, because eviction work is not "available data".
    val q = deduped.writeStream.outputMode("append")
      .trigger(org.apache.spark.sql.streaming.Trigger
        .ProcessingTime("250 milliseconds"))
      .foreachBatch { (df: org.apache.spark.sql.DataFrame, _: Long) =>
        val rows = df.as[(Long, String)].collect()
        emitted.synchronized { emitted ++= rows }
        ()
      }.start()
    def emittedIds: Seq[Long] =
      emitted.synchronized { emitted.map(_._1).toSeq }.sorted
    def awaitIds(expect: Seq[Long]): Unit = {
      val deadline = System.nanoTime() + 30000000000L
      while (emittedIds != expect && System.nanoTime() < deadline)
        Thread.sleep(100)
      emittedIds shouldBe expect
    }
    try {
      // batch 1: duplicate INSIDE the batch — one survivor per key
      mem.addData((1L, "a"), (1L, "a-dup"), (2L, "b"))
      awaitIds(Seq(1L, 2L))
      // batch 2: cross-batch duplicate suppressed; fresh key passes
      mem.addData((1L, "a-again"), (3L, "c"))
      awaitIds(Seq(1L, 2L, 3L))
      // let the TTL lapse; the engine's timeout triggers evict the
      // expired keys, after which key 1 is re-admitted
      Thread.sleep(3000L)
      mem.addData((4L, "d"))
      awaitIds(Seq(1L, 2L, 3L, 4L))
      mem.addData((1L, "a-after-ttl"))
      awaitIds(Seq(1L, 1L, 2L, 3L, 4L))
      emitted.synchronized {
        emitted.filter(_._1 == 1L).map(_._2).sorted.toSeq shouldBe
          Seq("a", "a-after-ttl")
      }
    } finally q.stop()
  }

  test("streaming exact dedup null-text contract: null-fingerprint docs " +
    "are ALL kept (never collapsed as mutual duplicates) and never stored") {
    val root = tmpRoot("graft_sdnul")
    implicit val sql = spark.sqlContext
    val mem = MemoryStream[(Long, Option[String])]
    val emitted = ArrayBuffer[Long]()
    val q = StreamOps.dedupeExactAgainstStore(
      mem.toDF.toDF("doc_id", "text"), "text", "doc_id", root) { (df, _) =>
      emitted ++= df.select("doc_id").as[Long].collect()
    }
    try {
      // three null-text docs share a null fingerprint: nothing to collide
      // on, so every one survives alongside the real doc
      mem.addData((1L, None), (2L, None), (3L, None), (4L, Some("real text")))
      q.processAllAvailable()
      emitted.sorted shouldBe Seq(1L, 2L, 3L, 4L)
      // and the next batch's nulls are NOT suppressed by a stored null fp
      mem.addData((5L, None))
      q.processAllAvailable()
      emitted.sorted shouldBe Seq(1L, 2L, 3L, 4L, 5L)
    } finally q.stop()
    // only the real doc's fingerprint is retained
    val state = SnapshotStore.read(spark, root).get
    state.count() shouldBe 1L
    state.filter(state("fp").isNull).count() shouldBe 0L
  }

  test("TTL key dedup group keys distinguish NULL position and joiner " +
    "characters: (null, x) and (x, null) are different keys, as are " +
    "('a|b','c') and ('a','b|c')") {
    implicit val sql = spark.sqlContext
    val mem = MemoryStream[(Option[String], Option[String], Long)]
    val emitted = ArrayBuffer[Long]()
    val deduped = StreamOps.dedupeKeysWithTTL(
      mem.toDF.toDF("a", "b", "row_id"), Seq("a", "b"), ttlMs = 60000L)
    // explicit trigger + POLL, not processAllAvailable: with a
    // processing-time timeout registered every trigger is a cleanup
    // batch, so the engine never reports "no new data" (same caveat as
    // the TTL tests above)
    val q = deduped.writeStream.outputMode("append")
      .trigger(org.apache.spark.sql.streaming.Trigger
        .ProcessingTime("100 milliseconds"))
      .foreachBatch { (df: org.apache.spark.sql.DataFrame, _: Long) =>
        val rows = df.select("row_id").as[Long].collect()
        emitted.synchronized { emitted ++= rows }
        ()
      }.start()
    def got: Seq[Long] = emitted.synchronized { emitted.toSeq.sorted }
    try {
      mem.addData(
        (None, Some("x"), 1L), (Some("x"), None, 2L),        // null position
        (Some("a|b"), Some("c"), 3L), (Some("a"), Some("b|c"), 4L), // joiner
        (None, Some("x"), 5L))                               // true duplicate
      val deadline = System.nanoTime() + 30000000000L
      while (got != Seq(1L, 2L, 3L, 4L) && System.nanoTime() < deadline)
        Thread.sleep(100)
      got shouldBe Seq(1L, 2L, 3L, 4L)
    } finally q.stop()
  }

  test("TTL key dedup BINARY keys are compared byte-exactly: distinct " +
    "invalid-UTF-8 byte sequences (which a string cast collapses to the " +
    "same replacement character) stay distinct keys; nested key types " +
    "are rejected loudly") {
    implicit val sql = spark.sqlContext
    val mem = MemoryStream[(Array[Byte], Long)]
    val emitted = ArrayBuffer[Long]()
    val deduped = StreamOps.dedupeKeysWithTTL(
      mem.toDF.toDF("k", "row_id"), Seq("k"), ttlMs = 60000L)
    val q = deduped.writeStream.outputMode("append")
      .trigger(org.apache.spark.sql.streaming.Trigger
        .ProcessingTime("100 milliseconds"))
      .foreachBatch { (df: org.apache.spark.sql.DataFrame, _: Long) =>
        val rows = df.select("row_id").as[Long].collect()
        emitted.synchronized { emitted ++= rows }
        ()
      }.start()
    def got: Seq[Long] = emitted.synchronized { emitted.toSeq.sorted }
    try {
      // 0xC3 and 0xC2 are each an incomplete UTF-8 sequence: CAST to
      // string both become U+FFFD and would wrongly collide
      mem.addData(
        (Array(0xC3.toByte), 1L), (Array(0xC2.toByte), 2L),
        (Array(0xC3.toByte), 3L)) // true byte-exact duplicate of row 1
      val deadline = System.nanoTime() + 30000000000L
      while (got != Seq(1L, 2L) && System.nanoTime() < deadline)
        Thread.sleep(100)
      got shouldBe Seq(1L, 2L)
    } finally q.stop()
    // nested key types have no injective string form — loud rejection
    val nested = mem.toDF.toDF("k", "row_id")
      .withColumn("arr", org.apache.spark.sql.functions.array(
        org.apache.spark.sql.functions.col("row_id")))
    an[IllegalArgumentException] should be thrownBy
      StreamOps.dedupeKeysWithTTL(nested, Seq("arr"), ttlMs = 1000L)
  }

  test("EVENT-TIME TTL: rows with a NULL event time pass through " +
    "unsuppressed instead of crashing the state function") {
    implicit val sql = spark.sqlContext
    val mem = MemoryStream[(Long, Option[java.sql.Timestamp], String)]
    val emitted = ArrayBuffer[String]()
    val deduped = StreamOps.dedupeKeysWithTTLEventTime(
      mem.toDF.toDF("k", "ts", "tag"), Seq("k"), "ts",
      delay = "1 second", ttlMs = 60000L)
    val q = deduped.writeStream.outputMode("append")
      .foreachBatch { (df: org.apache.spark.sql.DataFrame, _: Long) =>
        val rows = df.select("tag").as[String].collect()
        emitted.synchronized { emitted ++= rows }
        ()
      }.start()
    val t0 = java.sql.Timestamp.valueOf("2026-01-01 00:00:00")
    try {
      mem.addData(
        (1L, Some(t0), "keep"),
        (1L, Some(new java.sql.Timestamp(t0.getTime + 10)), "dup-suppressed"),
        (2L, None, "no-time-1"))
      q.processAllAvailable()
      emitted.synchronized { emitted.toSeq.sorted } shouldBe
        Seq("keep", "no-time-1")
      // a second null-ts sighting of the same key also passes: it has no
      // position on the timeline and touches no state
      mem.addData((2L, None, "no-time-2"))
      q.processAllAvailable()
      emitted.synchronized { emitted.toSeq.sorted } shouldBe
        Seq("keep", "no-time-1", "no-time-2")
    } finally q.stop()
  }

  test("TTL key dedup payload is TYPED: binary columns round-trip " +
    "byte-exact through the state operator (no serialization format in " +
    "the middle)") {
    implicit val sql = spark.sqlContext
    val mem = MemoryStream[(Long, Array[Byte])]
    val emitted = ArrayBuffer[(Long, Array[Byte])]()
    val deduped = StreamOps.dedupeKeysWithTTL(
      mem.toDF.toDF("event_id", "blob"), Seq("event_id"), ttlMs = 60000L)
    val q = deduped.writeStream.outputMode("append")
      .trigger(org.apache.spark.sql.streaming.Trigger
        .ProcessingTime("100 milliseconds"))
      .foreachBatch { (df: org.apache.spark.sql.DataFrame, _: Long) =>
        val rows = df.as[(Long, Array[Byte])].collect()
        emitted.synchronized { emitted ++= rows }
        ()
      }.start()
    // POLL, don't processAllAvailable: with a processing-time timeout
    // registered every trigger is a cleanup batch, so the engine never
    // reports "no new data" (same caveat as the TTL test above)
    def got: Seq[(Long, Seq[Byte])] = emitted.synchronized {
      emitted.map(t => (t._1, t._2.toSeq)).sortBy(_._1).toSeq
    }
    try {
      // full signed-byte range incl. NUL and an empty blob — the payloads
      // a JSON round-trip would mangle (base64 or charset re-encode)
      val blob = Array[Byte](0, 1, -1, 127, -128, 42)
      mem.addData((1L, blob), (1L, Array[Byte](9, 9)), (2L, Array.empty[Byte]))
      val deadline = System.nanoTime() + 30000000000L
      while (got.map(_._1) != Seq(1L, 2L) && System.nanoTime() < deadline)
        Thread.sleep(100)
      got.map(_._1) shouldBe Seq(1L, 2L)
      got.head._2 shouldBe blob.toSeq // first occurrence's payload, exact
      got(1)._2 shouldBe Seq.empty
      deduped.schema("blob").dataType shouldBe
        org.apache.spark.sql.types.BinaryType
    } finally q.stop()
  }

  test("EVENT-TIME TTL key dedup: suppression and re-admission are a pure " +
    "function of event timestamps and the watermark delay, with " +
    "out-of-order and late events") {
    implicit val sql = spark.sqlContext
    def ts(sec: Long) = new java.sql.Timestamp(sec * 1000L)
    val mem = MemoryStream[(Long, java.sql.Timestamp, String)]
    val emitted = ArrayBuffer[(Long, String)]()
    val deduped = StreamOps.dedupeKeysWithTTLEventTime(
      mem.toDF.toDF("event_id", "ts", "payload"), Seq("event_id"),
      "ts", delay = "0 seconds", ttlMs = 10000L)
    // no explicit trigger needed: eviction rides the watermark, so the
    // test is deterministic under processAllAvailable alone
    val q = deduped.writeStream.outputMode("append")
      .foreachBatch { (df: org.apache.spark.sql.DataFrame, _: Long) =>
        val rows = df.selectExpr("event_id", "payload")
          .as[(Long, String)].collect()
        emitted.synchronized { emitted ++= rows }
        ()
      }.start()
    def ids: Seq[Long] = emitted.synchronized { emitted.map(_._1).sorted.toSeq }
    try {
      // batch 1: in-batch duplicate of key 1, out of order (t=11 arrives
      // before t=10) — the MINIMAL event time wins (deterministic under
      // shuffle reordering, unlike arrival order); watermark after = 12
      mem.addData((1L, ts(11), "later-ts"), (1L, ts(10), "earlier-ts"),
        (2L, ts(12), "b"))
      q.processAllAvailable()
      ids shouldBe Seq(1L, 2L)
      emitted.synchronized {
        emitted.find(_._1 == 1L).get._2 shouldBe "earlier-ts"
      }
      // batch 2: key 1 at t=15 is inside its TTL window (expiry 11+10=21)
      // -> suppressed, and the sighting slides expiry to 25; key 4 is LATE
      // (t=5 behind watermark 12) and the engine drops late rows before
      // they reach the state function — standard late-data policy, so key
      // 4 never appears
      mem.addData((1L, ts(15), "a-again"), (3L, ts(16), "c"),
        (4L, ts(5), "late-arrival"))
      q.processAllAvailable()
      ids shouldBe Seq(1L, 2L, 3L)
      // batch 3: advance the watermark to 40, past key 1's expiry (25)
      mem.addData((9L, ts(40), "advance-watermark"))
      q.processAllAvailable()
      // batch 4: key 1 re-admitted purely because watermark (40) passed
      // its event-time expiry — no wall-clock sleep, no trigger timing
      mem.addData((1L, ts(41), "a-after-ttl"))
      q.processAllAvailable()
      ids shouldBe Seq(1L, 1L, 2L, 3L, 9L)
      emitted.synchronized {
        emitted.filter(_._1 == 1L).map(_._2).sorted.toSeq shouldBe
          Seq("a-after-ttl", "earlier-ts")
      }
    } finally q.stop()
  }

  test("EVENT-TIME TTL: an out-of-order suppressed sighting never SHRINKS " +
    "the stored expiry (regression: expiry ignored standing state)") {
    implicit val sql = spark.sqlContext
    def ts(sec: Long) = new java.sql.Timestamp(sec * 1000L)
    val mem = MemoryStream[(Long, java.sql.Timestamp, String)]
    val emitted = ArrayBuffer[(Long, String)]()
    val deduped = StreamOps.dedupeKeysWithTTLEventTime(
      mem.toDF.toDF("event_id", "ts", "payload"), Seq("event_id"),
      "ts", delay = "10 seconds", ttlMs = 10000L)
    val q = deduped.writeStream.outputMode("append")
      .foreachBatch { (df: org.apache.spark.sql.DataFrame, _: Long) =>
        val rows = df.selectExpr("event_id", "payload")
          .as[(Long, String)].collect()
        emitted.synchronized { emitted ++= rows }
        ()
      }.start()
    def aCount: Int = emitted.synchronized { emitted.count(_._1 == 1L) }
    try {
      // key 1 at t=20: emitted, expiry 30; watermark after batch = 10
      mem.addData((1L, ts(20), "first"))
      q.processAllAvailable()
      aCount shouldBe 1
      // out-of-order sighting at t=12 (not late: wm=10). Suppressed — and
      // it must NOT pull the expiry down to 12+10=22: the standing window
      // from the t=20 sighting runs to 30
      mem.addData((1L, ts(12), "out-of-order"))
      q.processAllAvailable()
      aCount shouldBe 1
      // advance the watermark to 25 — past the WRONG expiry (22), still
      // inside the real one (30). Key 1 at t=26 must stay suppressed.
      mem.addData((8L, ts(35), "advance"))
      q.processAllAvailable()
      mem.addData((1L, ts(26), "still-inside-window"))
      q.processAllAvailable()
      aCount shouldBe 1
      // the t=26 sighting slid the expiry to 36; watermark past it ->
      // re-admission works as before
      mem.addData((9L, ts(50), "advance-2"))
      q.processAllAvailable()
      mem.addData((1L, ts(41), "re-admitted"))
      q.processAllAvailable()
      aCount shouldBe 2
    } finally q.stop()
  }

  test("streaming image dedup: a resized copy arriving in a LATER batch is " +
    "suppressed by the stored dHash; unrelated and undecodable payloads " +
    "pass; state holds one long + id per retained image") {
    val root = tmpRoot("graft_sdi")
    implicit val sql = spark.sqlContext
    val photo = ImageFixtures.photo
    val other = ImageFixtures.other
    val photoHalf = { // 32x32 resize of photo, via the library's own path
      import org.apache.spark.sql.functions._
      Seq((0L, photo)).toDF("id", "p")
        .select(graft.functions.ImageResizeExpr(col("p"), 32, 32))
        .head().getAs[Array[Byte]](0)
    }
    val mem = MemoryStream[(Long, Array[Byte])]
    val emitted = ArrayBuffer[Long]()
    val q = StreamOps.dedupeImagesAgainstStore(
      mem.toDF.toDF("img_id", "payload"), "payload", "img_id", root) { (df, _) =>
      emitted ++= df.select("img_id").as[Long].collect()
    }
    try {
      // batch 1: the photo and an unrelated image
      mem.addData((1L, photo), (2L, other))
      q.processAllAvailable()
      emitted.sorted shouldBe Seq(1L, 2L)
      // batch 2: a half-size copy of the photo (suppressed cross-batch), a
      // junk payload (kept — undecodable), and a fresh in-batch dup pair
      mem.addData((3L, photoHalf), (4L, "not an image".getBytes("UTF-8")),
        (5L, other), (6L, other))
      q.processAllAvailable()
      // 3 suppressed vs stored photo; 5 suppressed vs stored other;
      // 6 suppressed (vs store AND vs smaller-id 5); junk 4 kept
      emitted.sorted shouldBe Seq(1L, 2L, 4L)
    } finally q.stop()
    // bounded binary-free state: (img_id, dhash) per retained DECODABLE image
    val state = SnapshotStore.read(spark, root).get
    state.columns.sorted shouldBe Array("dhash", "img_id")
    state.select("img_id").as[Long].collect().sorted shouldBe Array(1L, 2L)
  }

  test("streaming embedding dedup: a same-direction vector arriving in a " +
    "LATER batch is suppressed against the stored vectors at exact " +
    "cosine; zero vectors pass and are never stored; state holds one " +
    "vector + id per retained row and survives a restart") {
    val root = tmpRoot("graft_sde")
    implicit val sql = spark.sqlContext
    val mem = MemoryStream[(Long, Array[Float])]
    val emitted = ArrayBuffer[Long]()
    def run(m: MemoryStream[(Long, Array[Float])], sink: ArrayBuffer[Long]) =
      StreamOps.dedupeEmbeddingsAgainstStore(
        m.toDF.toDF("vec_id", "embedding"), "embedding", "vec_id", root,
        threshold = 0.95, nPlanes = 12, dim = 4, tables = 4) { (df, _) =>
        sink ++= df.select("vec_id").as[Long].collect()
      }
    val q = run(mem, emitted)
    try {
      mem.addData(
        (1L, Array(1.0f, 0.0f, 0.0f, 0.0f)),
        (2L, Array(0.0f, 1.0f, 0.0f, 0.0f)))
      q.processAllAvailable()
      emitted.sorted shouldBe Seq(1L, 2L)
      // 3 is a x2-scaled copy of stored 1 (cosine exactly 1, identical
      // hyperplane signs — suppression is structural); 4 is orthogonal to
      // everything retained; 5 is a zero vector (no direction: kept)
      mem.addData(
        (3L, Array(2.0f, 0.0f, 0.0f, 0.0f)),
        (4L, Array(0.0f, 0.0f, 1.0f, 0.0f)),
        (5L, Array(0.0f, 0.0f, 0.0f, 0.0f)))
      q.processAllAvailable()
      emitted.sorted shouldBe Seq(1L, 2L, 4L, 5L)
      // in-batch same-direction pair: smaller id wins
      mem.addData(
        (6L, Array(0.0f, 0.0f, 0.0f, 1.0f)),
        (7L, Array(0.0f, 0.0f, 0.0f, 4.0f)))
      q.processAllAvailable()
      emitted.sorted shouldBe Seq(1L, 2L, 4L, 5L, 6L)
    } finally q.stop()
    // bounded payload-free state: (vec_id, vec) per retained NONZERO row
    val state = SnapshotStore.read(spark, root).get
    state.columns.sorted shouldBe Array("vec", "vec_id")
    state.select("vec_id").as[Long].collect().sorted shouldBe
      Array(1L, 2L, 4L, 6L)
    // restart durability: a fresh query against the same store still
    // suppresses same-direction arrivals (x2^-1 scaling is exact too)
    val mem2 = MemoryStream[(Long, Array[Float])]
    val emitted2 = ArrayBuffer[Long]()
    val q2 = run(mem2, emitted2)
    try {
      mem2.addData(
        (8L, Array(0.5f, 0.0f, 0.0f, 0.0f)),
        (9L, Array(0.0f, 1.0f, 1.0f, 0.0f))) // cos 0.707 to 2 and 4: kept
      q2.processAllAvailable()
    } finally q2.stop()
    emitted2.sorted shouldBe Seq(9L)
  }

  test("forgetFromDedupState: the right-to-be-forgotten reaches the " +
    "durable dedup state — the victim's rows (full vectors on the " +
    "embedding path; fingerprints on the exact path, located through " +
    "the store's own key) are removed, and future copies of the " +
    "forgotten content are re-admitted as NEW content") {
    implicit val sql = spark.sqlContext
    // EMBEDDING state: keyed by the document id -> O(touched buckets)
    val rootE = tmpRoot("graft_forget_e")
    val memE = MemoryStream[(Long, Array[Float])]
    val emittedE = ArrayBuffer[Long]()
    def runE(m: MemoryStream[(Long, Array[Float])], sink: ArrayBuffer[Long]) =
      StreamOps.dedupeEmbeddingsAgainstStore(
        m.toDF.toDF("vec_id", "embedding"), "embedding", "vec_id", rootE,
        threshold = 0.95, nPlanes = 12, dim = 4, tables = 4) { (df, _) =>
        sink ++= df.select("vec_id").as[Long].collect()
      }
    val qE = runE(memE, emittedE)
    try {
      memE.addData((1L, Array(1.0f, 0.0f, 0.0f, 0.0f)),
        (2L, Array(0.0f, 1.0f, 0.0f, 0.0f)))
      qE.processAllAvailable()
    } finally qE.stop()
    StreamOps.forgetFromDedupState(spark, rootE, Seq(1L).toDF("vec_id"),
      idCol = "vec_id") shouldBe 1L
    val stateE = SnapshotStore.read(spark, rootE).get
    stateE.select("vec_id").as[Long].collect() shouldBe Array(2L)
    // a copy of the forgotten vector is NEW content now; a copy of the
    // retained one is still suppressed
    val memE2 = MemoryStream[(Long, Array[Float])]
    val emittedE2 = ArrayBuffer[Long]()
    val qE2 = runE(memE2, emittedE2)
    try {
      memE2.addData((3L, Array(2.0f, 0.0f, 0.0f, 0.0f)), // ex-victim dir
        (4L, Array(0.0f, 2.0f, 0.0f, 0.0f))) // retained dir: suppressed
      qE2.processAllAvailable()
    } finally qE2.stop()
    emittedE2.sorted shouldBe Seq(3L)
    // replay converges: the id is already forgotten
    StreamOps.forgetFromDedupState(spark, rootE, Seq(1L).toDF("vec_id"),
      idCol = "vec_id") shouldBe 0L

    // EXACT state: keyed by FINGERPRINT — the victims' keys are located
    // through the state table itself
    val rootX = tmpRoot("graft_forget_x")
    val memX = MemoryStream[(Long, String)]
    val emittedX = ArrayBuffer[Long]()
    def runX(m: MemoryStream[(Long, String)], sink: ArrayBuffer[Long]) =
      StreamOps.dedupeExactAgainstStore(
        m.toDF.toDF("doc_id", "text"), "text", "doc_id", rootX) { (df, _) =>
        sink ++= df.select("doc_id").as[Long].collect()
      }
    val qX = runX(memX, emittedX)
    try {
      memX.addData((1L, "to be forgotten"), (2L, "to be retained"))
      qX.processAllAvailable()
    } finally qX.stop()
    StreamOps.forgetFromDedupState(spark, rootX, Seq(1L).toDF("doc_id"),
      idCol = "doc_id") shouldBe 1L
    val memX2 = MemoryStream[(Long, String)]
    val emittedX2 = ArrayBuffer[Long]()
    val qX2 = runX(memX2, emittedX2)
    try {
      memX2.addData((3L, "to be forgotten"), (4L, "to be retained"))
      qX2.processAllAvailable()
    } finally qX2.stop()
    emittedX2.sorted shouldBe Seq(3L)
    // an empty store is a clean no-op, not an error
    StreamOps.forgetFromDedupState(spark, tmpRoot("graft_forget_none"),
      Seq(1L).toDF("doc_id"), idCol = "doc_id") shouldBe 0L
  }
}
