package graft

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.operators.Sessions
import graft.streaming.StreamOps

/** Streaming gap-sessionization ([[StreamOps.sessionizeStream]]): parity
  * with the batch [[Sessions.sessionize]] across micro-batch splits and
  * within-horizon disorder, NULL-ts passthrough, cursor-only idle state,
  * and the idle-TTL eviction trade. */
class StreamSessionSpec extends SparkSpec {
  import spark.implicits._

  private val base = Timestamp.valueOf("2026-01-01 00:00:00").getTime
  private def ts(offsetSec: Long) = new Timestamp(base + offsetSec * 1000L)

  /** Drive one keyed stream through sessionizeStream into a memory sink;
    * two trailing sentinel batches advance the watermark past every real
    * event and fire the event-time-timeout flush. */
  private def run(name: String, gapSec: Long = 60L,
                  idleTtlMs: Long = 0L)(
      feed: (MemoryStream[(Long, Timestamp, String)],
             org.apache.spark.sql.streaming.StreamingQuery) => Unit)
      : (org.apache.spark.sql.DataFrame, Long) = {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(Long, Timestamp, String)]
    val sessioned = StreamOps.sessionizeStream(
      mem.toDF.toDF("user", "ts", "tag"), Seq("user"), "ts",
      gapSec, delay = "10 seconds", idleTtlMs = idleTtlMs)
    val q = sessioned.writeStream.format("memory").queryName(name)
      .outputMode("append").start()
    var maxState = 0L
    try {
      feed(mem, q)
      mem.addData((999L, ts(100000L), "sentinel")); q.processAllAvailable()
      mem.addData((999L, ts(200000L), "sentinel")); q.processAllAvailable()
      maxState = q.recentProgress.flatMap(_.stateOperators.map(_.numRowsTotal))
        .foldLeft(0L)(math.max)
    } finally q.stop()
    (spark.table(name).filter(col("tag") =!= "sentinel"), maxState)
  }

  test("parity: emitted rows equal batch sessionize row-for-row on a " +
    "randomized corpus split across batches with within-horizon disorder " +
    "and planted ts ties; state stays bounded") {
    val rnd = new scala.util.Random(20260815L)
    val eventsBase = (0 until 150).map(i =>
      (rnd.nextInt(5).toLong, ts(rnd.nextInt(1000).toLong), s"e$i"))
    // ties at one (key, ts) must share a session
    val events = eventsBase ++ eventsBase.take(10).map {
      case (u, t, _) => (u, t, s"tie$u$t")
    }
    // batches split on event-time order (late rows beyond the watermark
    // are the engine's documented drop policy, not under test); WITHIN a
    // batch the arrival order is shuffled — the state function must not
    // lean on it
    val chunks = events.sortBy(_._2.getTime).grouped(60).toSeq
      .map(c => rnd.shuffle(c))
    val (got, maxState) = run("sess_parity") { (mem, q) =>
      chunks.foreach { c => mem.addData(c); q.processAllAvailable() }
    }
    val expect = Sessions.sessionize(
      events.toDF("user", "ts", "tag"), Seq("user"), "ts", 60L)
    val ord = Seq(col("user"), col("ts"), col("tag"))
    got.columns.toSeq shouldBe expect.columns.toSeq
    got.orderBy(ord: _*).collect().map(_.toSeq) shouldBe
      expect.orderBy(ord: _*).collect().map(_.toSeq)
    // bounded state: cursors (one tiny row per live key) + the pending
    // horizon — never the corpus
    maxState should be <= (events.size / 2).toLong
  }

  test("NULL-ts rows pass through immediately with a NULL session_no and " +
    "perturb no real numbering (batch parity on dirty data)") {
    val evs = Seq((1L, ts(10), "a"), (1L, null.asInstanceOf[Timestamp], "x"),
      (1L, ts(20), "b"))
    val (got, _) = run("sess_nullts") { (mem, q) =>
      mem.addData(evs); q.processAllAvailable()
    }
    val rows = got.orderBy(col("tag")).collect()
    rows.map(_.getString(2)) shouldBe Array("a", "b", "x")
    rows.map(r => if (r.isNullAt(3)) -1L else r.getLong(3)) shouldBe
      Array(1L, 1L, -1L)
  }

  test("idle-TTL eviction bounds cursor state: a key returning after the " +
    "TTL restarts at session 1 (the documented trade); without a TTL the " +
    "cursor survives and numbering continues") {
    def feedIdleGap(mem: MemoryStream[(Long, Timestamp, String)],
                    q: org.apache.spark.sql.streaming.StreamingQuery): Unit = {
      mem.addData((1L, ts(0L), "first")); q.processAllAvailable()
      // advance the watermark far past the 30s TTL, in its own batches
      // so the timeout can fire before the key's next event arrives
      mem.addData((999L, ts(5000L), "sentinel")); q.processAllAvailable()
      mem.addData((999L, ts(6000L), "sentinel")); q.processAllAvailable()
      mem.addData((1L, ts(7000L), "returned")); q.processAllAvailable()
    }
    val (evicted, _) = run("sess_ttl", idleTtlMs = 30000L)(feedIdleGap)
    evicted.orderBy("ts").collect().map(r =>
      (r.getString(2), r.getLong(3))) shouldBe
      Array(("first", 1L), ("returned", 1L))
    val (kept, _) = run("sess_nottl", idleTtlMs = 0L)(feedIdleGap)
    kept.orderBy("ts").collect().map(r =>
      (r.getString(2), r.getLong(3))) shouldBe
      Array(("first", 1L), ("returned", 2L))
  }
}
