package graft

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.streaming.EventWindows

class EventWindowsSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)

  private val events = Seq(
    (ts("2024-01-01 00:05:00"), "click", 1.0, 7L),
    (ts("2024-01-01 00:55:00"), "click", 2.0, 7L),
    (ts("2024-01-01 01:05:00"), "click", 4.0, 7L),
    (ts("2024-01-01 01:05:00"), "view", 8.0, 8L)
  ).toDF("ts", "event_type", "value", "user_id")

  test("tumbling windows bucket by hour") {
    val out = EventWindows.tumbling(events, "ts", "1 hour")
      .select(col("window.start").cast("string").as("w"), col("event_type"),
        col("n"), col("total_value"))
      .orderBy("event_type", "w")
    val rows = out.collect().map(r =>
      (r.getString(0), r.getString(1), r.getLong(2), r.getDouble(3)))
    rows should contain("2024-01-01 00:00:00" , "click", 2L, 3.0)
    rows should contain("2024-01-01 01:00:00", "click", 1L, 4.0)
    rows should contain("2024-01-01 01:00:00", "view", 1L, 8.0)
  }

  test("sliding windows double-count into overlapping panes") {
    val out = EventWindows.sliding(events, "ts", "1 hour", "30 minutes")
    // each event appears in exactly 2 windows
    out.agg(sum("n")).head().getLong(0) shouldBe events.count() * 2
  }

  test("session windows split at >= gap and merge within") {
    val sess = Seq(
      (ts("2024-01-01 00:00:00"), 1L, 1.0),
      (ts("2024-01-01 00:04:00"), 1L, 1.0),  // 4 min gap -> same session
      (ts("2024-01-01 00:09:30"), 1L, 1.0),  // 5.5 min gap -> new session? no: gap 5m30s >= 5m
      (ts("2024-01-01 02:00:00"), 2L, 1.0)
    ).toDF("ts", "user_id", "value")
    val out = EventWindows.sessions(sess, "ts", "5 minutes")
      .select(col("user_id"), col("n_events"))
      .orderBy("user_id", "n_events").as[(Long, Long)].collect()
    out shouldBe Array((1L, 1L), (1L, 2L), (2L, 1L))
  }

  test("streaming: tumbling agg with watermark over MemoryStream " +
    "(real Structured Streaming micro-batch execution)") {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(Timestamp, String, Double)]
    val sdf = mem.toDF().toDF("ts", "event_type", "value")
    val agg = EventWindows.tumbling(
      EventWindows.withLateDataBound(sdf, "ts", "10 minutes"), "ts", "1 hour")
    val q = agg.writeStream
      .format("memory").queryName("ew_tumbling").outputMode("complete").start()
    try {
      mem.addData((ts("2024-01-01 00:05:00"), "click", 1.0),
        (ts("2024-01-01 00:15:00"), "click", 2.0))
      q.processAllAvailable()
      val rows = spark.table("ew_tumbling")
        .select("event_type", "n", "total_value").collect()
      rows.map(r => (r.getString(0), r.getLong(1), r.getDouble(2))) shouldBe
        Array(("click", 2L, 3.0))
    } finally q.stop()
  }

  test("streaming: tumbling agg under the RocksDB state store equals the " +
    "default provider — the large-state path (state spills to local " +
    "disk instead of living on the executor heap at 100 TB key " +
    "cardinalities) is a config swap, not an operator change") {
    // provider is a session conf read at query start: isolate it on a
    // cloned session so the shared session's default provider is untouched
    val s2 = spark.newSession()
    s2.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    implicit val sqlCtx = s2.sqlContext
    val mem = MemoryStream[(Timestamp, String, Double)]
    val agg = EventWindows.tumbling(
      EventWindows.withLateDataBound(
        mem.toDF().toDF("ts", "event_type", "value"), "ts", "10 minutes"),
      "ts", "1 hour")
    val q = agg.writeStream
      .format("memory").queryName("ew_rocksdb").outputMode("complete").start()
    try {
      mem.addData((ts("2024-01-01 00:05:00"), "click", 1.0),
        (ts("2024-01-01 00:15:00"), "click", 2.0))
      q.processAllAvailable()
      // cross-batch state update — the part the provider actually owns
      mem.addData((ts("2024-01-01 00:25:00"), "click", 4.0),
        (ts("2024-01-01 01:05:00"), "view", 8.0))
      q.processAllAvailable()
      val rows = s2.table("ew_rocksdb")
        .select("event_type", "n", "total_value")
        .orderBy("event_type").collect()
      rows.map(r => (r.getString(0), r.getLong(1), r.getDouble(2))) shouldBe
        Array(("click", 3L, 7.0), ("view", 1L, 8.0))
      // the provider actually engaged (not a silent fallback)
      q.lastProgress.stateOperators should not be empty
    } finally q.stop()
  }

  test("streaming from parquet files equals the batch aggregate " +
    "(same operator, readStream source)") {
    // file source needs a directory; stage the fixture file into one
    val dir = java.nio.file.Files.createTempDirectory("graft_stream")
    java.nio.file.Files.copy(
      java.nio.file.Paths.get(s"$sf/events.parquet"),
      dir.resolve("events.parquet"))
    val path = dir.toString
    val schema = spark.read.parquet(path).schema // ts: long nanos or timestamp[us]
    def prep(df: org.apache.spark.sql.DataFrame) =
      graft.sources.Tables.withEventTimestamp(df)
    val batch = EventWindows.tumbling(prep(spark.read.parquet(path)), "ts", "1 hour")
      .select(col("window.start").as("w"), col("event_type"), col("n"), col("total_value"))
      .orderBy("w", "event_type").collect()
    val stream = EventWindows.tumbling(
      prep(spark.readStream.schema(schema).parquet(path)), "ts", "1 hour")
    val q = stream.writeStream
      .format("memory").queryName("ew_files").outputMode("complete").start()
    try {
      q.processAllAvailable()
      val got = spark.table("ew_files")
        .select(col("window.start").as("w"), col("event_type"), col("n"), col("total_value"))
        .orderBy("w", "event_type").collect()
      got.length shouldBe batch.length
      got.zip(batch).foreach { case (g, b) => g shouldBe b }
    } finally q.stop()
  }

  test("streaming: session windows merge/split across micro-batches " +
    "(stateful session_window under update mode)") {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(Timestamp, Long, Double)]
    val agg = EventWindows.sessions(
      EventWindows.withLateDataBound(
        mem.toDF().toDF("ts", "user_id", "value"), "ts", "1 minute"),
      "ts", "5 minutes")
    val q = agg.writeStream
      .format("memory").queryName("ew_sessions").outputMode("complete").start()
    try {
      mem.addData((ts("2024-01-01 00:00:00"), 1L, 1.0))
      q.processAllAvailable()
      // second batch extends the same session (gap 2 min < 5 min)
      mem.addData((ts("2024-01-01 00:02:00"), 1L, 2.0))
      q.processAllAvailable()
      val rows = spark.table("ew_sessions")
        .select("user_id", "n_events", "total_value").collect()
      rows.map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))) shouldBe
        Array((1L, 2L, 3.0))
    } finally q.stop()
  }

  test("streaming: watermarked stream-stream interval join matches within " +
    "the interval only (bounded state via both-side watermarks)") {
    implicit val sqlCtx = spark.sqlContext
    val clicks = MemoryStream[(Timestamp, Long)]
    val views = MemoryStream[(Timestamp, Long)]
    val joined = graft.streaming.StreamOps.intervalJoin(
      clicks.toDF().toDF("ts", "user_id"),
      views.toDF().toDF("ts", "user_id"),
      key = "user_id", tsCol = "ts", delay = "10 minutes",
      before = "5 minutes", after = "5 minutes")
    val q = joined.writeStream
      .format("memory").queryName("so_ij").outputMode("append").start()
    try {
      clicks.addData((ts("2024-01-01 00:10:00"), 1L))
      views.addData(
        (ts("2024-01-01 00:12:00"), 1L), // within +5m of the click -> match
        (ts("2024-01-01 00:30:00"), 1L), // outside the interval -> no match
        (ts("2024-01-01 00:12:00"), 2L)) // other key -> no match
      q.processAllAvailable()
      val rows = spark.table("so_ij")
        .select(col("l_user_id"), col("r_ts").cast("string")).collect()
        .map(r => (r.getLong(0), r.getString(1)))
      rows shouldBe Array((1L, "2024-01-01 00:12:00"))
    } finally q.stop()
  }

  test("streaming: durable parquet sink with checkpoint (exactly-once files)") {
    implicit val sqlCtx = spark.sqlContext
    val out = java.nio.file.Files.createTempDirectory("graft_sink").toString
    val mem = MemoryStream[(Timestamp, String, Double)]
    val q = mem.toDF().toDF("ts", "event_type", "value")
      .writeStream
      .format("parquet")
      .option("path", s"$out/data")
      .option("checkpointLocation", s"$out/chk")
      .outputMode("append")
      .start()
    try {
      mem.addData((ts("2024-01-01 00:00:00"), "click", 1.0))
      q.processAllAvailable()
      mem.addData((ts("2024-01-01 00:01:00"), "view", 2.0))
      q.processAllAvailable()
      val back = spark.read.parquet(s"$out/data")
      back.count() shouldBe 2
      back.columns.toSeq shouldBe Seq("ts", "event_type", "value")
    } finally q.stop()
  }

  test("streaming: watermark-bounded exact dedup drops in-window duplicates") {
    import graft.streaming.StreamOps
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(Timestamp, Long)]
    val deduped = StreamOps.dedupeStream(
      mem.toDF().toDF("ts", "k"), Seq("k"), "ts", "10 minutes")
    val q = deduped.writeStream
      .format("memory").queryName("so_dedup").outputMode("append").start()
    try {
      mem.addData((ts("2024-01-01 00:00:00"), 1L), (ts("2024-01-01 00:01:00"), 2L))
      q.processAllAvailable()
      mem.addData((ts("2024-01-01 00:00:00"), 1L)) // exact duplicate row
      q.processAllAvailable()
      spark.table("so_dedup").count() shouldBe 2
    } finally q.stop()
  }

  test("streaming: end-of-stream flush semantics via foreachBatch upsert " +
    "(writers.py:70-72 epoch-commit analog)") {
    import graft.sinks.{InsertOrUpdate, UpsertConfig}
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(Int, String)]
    var snapshot = Seq.empty[(Int, String)].toDF("id", "value")
    val cfg = UpsertConfig(clock = Some(to_timestamp(lit("2026-01-01 00:00:00"))))
    val q = mem.toDF().toDF("id", "value").writeStream
      .foreachBatch { (batch: org.apache.spark.sql.DataFrame, _: Long) =>
        snapshot = InsertOrUpdate.merge(snapshot, batch, cfg).target
          .localCheckpoint(eager = true)
        ()
      }
      .start()
    try {
      mem.addData((1, "a"), (2, "b"))
      q.processAllAvailable()
      mem.addData((2, "b2"), (3, "c"))
      q.processAllAvailable()
      snapshot.orderBy("id").collect().map(r => (r.getInt(0), r.getString(1))) shouldBe
        Array((1, "a"), (2, "b2"), (3, "c"))
    } finally q.stop()
  }
}
