package graft

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.operators.Joins
import graft.streaming.StreamOps

/** Streaming as-of enrichment ([[StreamOps.asofEnrich]]): parity with the
  * batch `Joins.asOfJoin` contract, out-of-order buffering across
  * micro-batches, standing-row retention, tolerance, NULL key/ts edges,
  * and the RocksDB state-store provider. */
class StreamAsofSpec extends SparkSpec {
  import spark.implicits._

  private val base = Timestamp.valueOf("2026-01-01 00:00:00").getTime
  private def ts(offsetSec: Long) = new Timestamp(base + offsetSec * 1000L)

  /** Drive a left/right pair of streams through asofEnrich into a memory
    * sink; feed() adds batches; two trailing sentinel batches (far-future
    * lefts on key 999 tagged "sentinel") push the watermark past every
    * real event AND trigger the event-time-timeout flush batch, so every
    * non-sentinel left is emitted deterministically. */
  private def run(name: String, toleranceMs: Option[Long] = None,
                  session: org.apache.spark.sql.SparkSession = spark,
                  direction: String = "backward")(
      feed: (MemoryStream[(Long, Timestamp, String)],
             MemoryStream[(Long, Timestamp, Double)],
             org.apache.spark.sql.streaming.StreamingQuery) => Unit)
      : org.apache.spark.sql.DataFrame = {
    implicit val sqlCtx = session.sqlContext
    val lMem = MemoryStream[(Long, Timestamp, String)]
    val rMem = MemoryStream[(Long, Timestamp, Double)]
    val enriched = StreamOps.asofEnrich(
      lMem.toDF.toDF("user", "ts", "tag"), rMem.toDF.toDF("user", "ts", "price"),
      Seq("user"), "ts", "ts", delay = "10 seconds", rightPrefix = "r_",
      toleranceMs = toleranceMs, direction = direction)
    val q = enriched.writeStream.format("memory").queryName(name)
      .outputMode("append").start()
    try {
      feed(lMem, rMem, q)
      lMem.addData((999L, ts(100000L), "sentinel")); q.processAllAvailable()
      lMem.addData((999L, ts(200000L), "sentinel")); q.processAllAvailable()
    } finally q.stop()
    session.table(name).filter(col("tag") =!= "sentinel")
  }

  test("parity: emitted rows equal the batch asOfJoin row-for-row on a " +
    "randomized corpus with planted right-ts ties and inclusive-boundary " +
    "matches, with and without a tolerance") {
    val rnd = new scala.util.Random(20260814L)
    val lefts = (0 until 120).map(i =>
      (rnd.nextInt(5).toLong, ts(rnd.nextInt(1000).toLong), s"t$i"))
    val rightsBase = (0 until 70).map(_ =>
      (rnd.nextInt(5).toLong, ts(rnd.nextInt(1000).toLong),
        (rnd.nextInt(900) + 100).toDouble))
    // ties: same (key, ts), different payload — greatest price must win;
    // inclusive boundary: rights AT a left ts (lefts pick ts from the same
    // 1000-second grid, so collisions exist at this density)
    val rights = rightsBase ++ rightsBase.take(10).map {
      case (u, t, p) => (u, t, p + 1000.0)
    }
    // every direction against the batch operator; forward/nearest need
    // the tolerance that makes their streaming wait finite
    val combos: Seq[(String, Option[Long])] = Seq(
      ("backward", None), ("backward", Some(120000L)),
      ("forward", Some(120000L)), ("nearest", Some(120000L)))
    for ((d, tol) <- combos) {
      val got = run(s"asof_parity_${d}_${tol.isDefined}", tol,
        direction = d) { (lm, rm, q) =>
        lm.addData(lefts); rm.addData(rights); q.processAllAvailable()
      }
      val expect = Joins.asOfJoin(
        lefts.toDF("user", "ts", "tag"), rights.toDF("user", "ts", "price"),
        Seq("user"), "ts", "ts", rightPrefix = "r_", direction = d,
        tolerance = tol.map(ms => expr(s"INTERVAL '${ms / 1000}' SECOND")))
      val ord = Seq(col("user"), col("ts"), col("tag"))
      withClue(s"direction=$d tol=$tol: ") {
        got.orderBy(ord: _*).collect().map(_.toSeq) shouldBe
          expect.orderBy(ord: _*).collect().map(_.toSeq)
        // sanity: the corpus exercised real matches AND left-outer misses
        got.filter(col("r_price").isNotNull).count() should be > 0L
        got.filter(col("r_price").isNull).count() should be > 0L
      }
    }
  }

  test("property: MULTI-BATCH feeds with bounded disorder equal the batch " +
    "join in every direction — events sorted by ts + jitter(±50s) and " +
    "split into 5 micro-batches; jitter < delay(100s) guarantees nothing " +
    "is dropped late, so parity must be exact") {
    val rnd = new scala.util.Random(77L)
    val lefts = (0 until 150).map(i =>
      (rnd.nextInt(4).toLong, ts(rnd.nextInt(1000).toLong), s"t$i"))
    val rights = (0 until 100).map(_ =>
      (rnd.nextInt(4).toLong, ts(rnd.nextInt(1000).toLong),
        (rnd.nextInt(900) + 100).toDouble))
    // one arrival stream: each event keyed by ts + bounded jitter, split
    // into chunks — within a chunk order is arbitrary, across chunks
    // disorder is bounded by the jitter, which stays under the watermark
    // delay (10s run-delay + the jitter bound < 100s would break; this
    // test overrides delay via its own query)
    implicit val sqlCtx = spark.sqlContext
    val tagged: Seq[(Long, Either[(Long, Timestamp, String), (Long, Timestamp, Double)])] =
      lefts.map(l => (l._2.getTime + rnd.nextInt(100001) - 50000L,
        Left(l): Either[(Long, Timestamp, String), (Long, Timestamp, Double)])) ++
        rights.map(r => (r._2.getTime + rnd.nextInt(100001) - 50000L,
          Right(r): Either[(Long, Timestamp, String), (Long, Timestamp, Double)]))
    val chunks = tagged.sortBy(_._1).map(_._2).grouped(
      (tagged.size + 4) / 5).toSeq
    for (d <- Seq("backward", "forward", "nearest")) {
      val tol = if (d == "backward") None else Some(120000L)
      val lMem = MemoryStream[(Long, Timestamp, String)]
      val rMem = MemoryStream[(Long, Timestamp, Double)]
      val enriched = StreamOps.asofEnrich(
        lMem.toDF.toDF("user", "ts", "tag"),
        rMem.toDF.toDF("user", "ts", "price"),
        Seq("user"), "ts", "ts", delay = "100 seconds", rightPrefix = "r_",
        toleranceMs = tol, direction = d)
      val q = enriched.writeStream.format("memory")
        .queryName(s"asof_mb_$d").outputMode("append").start()
      try {
        chunks.foreach { chunk =>
          val ls = chunk.collect { case Left(l) => l }
          val rs = chunk.collect { case Right(r) => r }
          if (ls.nonEmpty) lMem.addData(ls)
          if (rs.nonEmpty) rMem.addData(rs)
          q.processAllAvailable()
        }
        lMem.addData((999L, ts(100000L), "sentinel")); q.processAllAvailable()
        lMem.addData((999L, ts(300000L), "sentinel")); q.processAllAvailable()
      } finally q.stop()
      val got = spark.table(s"asof_mb_$d").filter(col("tag") =!= "sentinel")
      val expect = Joins.asOfJoin(
        lefts.toDF("user", "ts", "tag"), rights.toDF("user", "ts", "price"),
        Seq("user"), "ts", "ts", rightPrefix = "r_", direction = d,
        tolerance = tol.map(ms => expr(s"INTERVAL '${ms / 1000}' SECOND")))
      val ord = Seq(col("user"), col("ts"), col("tag"))
      withClue(s"direction=$d: ") {
        got.orderBy(ord: _*).collect().map(_.toSeq) shouldBe
          expect.orderBy(ord: _*).collect().map(_.toSeq)
      }
    }
  }

  test("multi-key: composite keys match only when every key column " +
    "matches, parity with the batch operator") {
    implicit val sqlCtx = spark.sqlContext
    val lMem = MemoryStream[(Long, Long, Timestamp, String)]
    val rMem = MemoryStream[(Long, Long, Timestamp, Double)]
    val lefts = Seq((1L, 10L, ts(100L), "both"), (1L, 11L, ts(100L), "k2off"),
      (2L, 10L, ts(100L), "k1off"))
    val rights = Seq((1L, 10L, ts(50L), 5.0))
    val enriched = StreamOps.asofEnrich(
      lMem.toDF.toDF("k1", "k2", "ts", "tag"),
      rMem.toDF.toDF("k1", "k2", "ts", "price"),
      Seq("k1", "k2"), "ts", "ts", delay = "10 seconds", rightPrefix = "r_")
    val q = enriched.writeStream.format("memory").queryName("asof_mk")
      .outputMode("append").start()
    try {
      lMem.addData(lefts); rMem.addData(rights); q.processAllAvailable()
      lMem.addData((999L, 999L, ts(100000L), "sentinel"))
      q.processAllAvailable()
      lMem.addData((999L, 999L, ts(200000L), "sentinel"))
      q.processAllAvailable()
    } finally q.stop()
    val got = spark.table("asof_mk").filter(col("tag") =!= "sentinel")
    got.select("tag", "r_price").collect()
      .map(r => r.getString(0) -> Option(r.get(1))).toMap shouldBe
      Map("both" -> Some(5.0), "k2off" -> None, "k1off" -> None)
  }

  test("forward/nearest without a tolerance are rejected loudly (the " +
    "unbounded-wait shapes)") {
    implicit val sqlCtx = spark.sqlContext
    val lMem = MemoryStream[(Long, Timestamp, String)]
    val rMem = MemoryStream[(Long, Timestamp, Double)]
    for (d <- Seq("forward", "nearest"))
      an[IllegalArgumentException] should be thrownBy
        StreamOps.asofEnrich(
          lMem.toDF.toDF("user", "ts", "tag"),
          rMem.toDF.toDF("user", "ts", "price"),
          Seq("user"), "ts", "ts", delay = "10 seconds", rightPrefix = "r_",
          direction = d)
  }

  test("forward: a left event waits out its tolerance and attaches the " +
    "NEXT right row even when that row arrives batches later") {
    val got = run("asof_fwd", toleranceMs = Some(600000L),
      direction = "forward") { (lm, rm, q) =>
      lm.addData((1L, ts(100L), "a"))
      q.processAllAvailable()
      // the forward candidate arrives a batch later, 5 min after the left
      rm.addData((1L, ts(400L), 9.0))
      q.processAllAvailable()
      // beyond-tolerance left (timely — above the current watermark of
      // ~390 s): its next right is >13 min after it, outside the bound
      lm.addData((2L, ts(395L), "far"))
      rm.addData((2L, ts(1200L), 1.0))
      q.processAllAvailable()
    }
    got.select("tag", "r_price").collect()
      .map(r => r.getString(0) -> Option(r.get(1))).toMap shouldBe
      Map("a" -> Some(9.0), "far" -> None)
  }

  test("out-of-order: a right row arriving a BATCH LATER (inside the " +
    "watermark horizon) still enriches the earlier-buffered left event") {
    val got = run("asof_ooo") { (lm, rm, q) =>
      rm.addData((1L, ts(0L), 1.0))
      lm.addData((1L, ts(300L), "a"))
      q.processAllAvailable()
      // newer right BELOW the buffered left's ts, inside the 10 s
      // watermark horizon (wm is at 290 s here) — must win the match
      rm.addData((1L, ts(295L), 2.0))
      lm.addData((2L, ts(2000L), "w1"))
      q.processAllAvailable()
    }
    val rows = got.select("tag", "r_price").collect()
      .map(r => r.getString(0) -> Option(r.get(1))).toMap
    rows("a") shouldBe Some(2.0)
    rows("w1") shouldBe None // no right for key 2: left-outer nulls
  }

  test("standing right row is retained across many watermark advances " +
    "(the 'current dimension value'), and a newer right replaces it") {
    val got = run("asof_standing") { (lm, rm, q) =>
      rm.addData((1L, ts(0L), 5.0)); q.processAllAvailable()
      lm.addData((1L, ts(7200L), "x1")); q.processAllAvailable()
      lm.addData((1L, ts(10800L), "x2")); q.processAllAvailable()
      rm.addData((1L, ts(12600L), 6.0)); q.processAllAvailable()
      lm.addData((1L, ts(14400L), "x3")); q.processAllAvailable()
    }
    got.select("tag", "r_price").collect()
      .map(r => r.getString(0) -> r.getDouble(1)).toMap shouldBe
      Map("x1" -> 5.0, "x2" -> 5.0, "x3" -> 6.0)
  }

  test("tolerance bounds the match inclusively and NULLs only the " +
    "enrichment, keeping the row") {
    val got = run("asof_tol", toleranceMs = Some(60000L)) { (lm, rm, q) =>
      rm.addData((1L, ts(0L), 5.0))
      lm.addData((1L, ts(30L), "near"), // 30 s ≤ 1 min: enriched
        (1L, ts(60L), "edge"),          // exactly 1 min: inclusive
        (1L, ts(600L), "far"))          // 10 min: enrichment nulled
      q.processAllAvailable()
    }
    got.select("tag", "r_price").collect()
      .map(r => r.getString(0) -> Option(r.get(1))).toMap shouldBe
      Map("near" -> Some(5.0), "edge" -> Some(5.0), "far" -> None)
  }

  test("NULL edges match the batch operator: NULL keys join each other, " +
    "a NULL left ts passes through unenriched, a NULL right ts never " +
    "matches") {
    implicit val sqlCtx = spark.sqlContext
    val lMem = MemoryStream[(Option[Long], Option[Timestamp], String)]
    val rMem = MemoryStream[(Option[Long], Option[Timestamp], Double)]
    val lefts = Seq(
      (None: Option[Long], Some(ts(100L)), "nullkey"),
      (Some(1L), None: Option[Timestamp], "nots"),
      (Some(1L), Some(ts(100L)), "normal"))
    val rights = Seq(
      (None: Option[Long], Some(ts(50L)), 7.0),
      (Some(1L), None: Option[Timestamp], 666.0), // NULL ts: never a match
      (Some(1L), Some(ts(40L)), 8.0))
    val enriched = StreamOps.asofEnrich(
      lMem.toDF.toDF("user", "ts", "tag"), rMem.toDF.toDF("user", "ts", "price"),
      Seq("user"), "ts", "ts", delay = "10 seconds", rightPrefix = "r_")
    val q = enriched.writeStream.format("memory").queryName("asof_nulls")
      .outputMode("append").start()
    try {
      lMem.addData(lefts); rMem.addData(rights); q.processAllAvailable()
      lMem.addData((Some(999L), Some(ts(100000L)), "sentinel"))
      q.processAllAvailable()
      lMem.addData((Some(999L), Some(ts(200000L)), "sentinel"))
      q.processAllAvailable()
    } finally q.stop()
    val got = spark.table("asof_nulls").filter(col("tag") =!= "sentinel")
    val expect = Joins.asOfJoin(
      lefts.toDF("user", "ts", "tag"), rights.toDF("user", "ts", "price"),
      Seq("user"), "ts", "ts", rightPrefix = "r_")
    val ord = Seq(col("tag"))
    got.orderBy(ord: _*).collect().map(_.toSeq) shouldBe
      expect.orderBy(ord: _*).collect().map(_.toSeq)
    // and the semantics are the intended ones, not just mutually wrong
    got.select("tag", "r_price").collect()
      .map(r => r.getString(0) -> Option(r.get(1))).toMap shouldBe
      Map("nullkey" -> Some(7.0), "nots" -> None, "normal" -> Some(8.0))
  }

  test("checkpoint restart: buffered lefts and the standing right survive " +
    "a query stop/start through the state store (file source + " +
    "foreachBatch, exactly-once by batch id)") {
    val dir = java.nio.file.Files.createTempDirectory("graft_asof_ckpt")
    val (lDir, rDir, ckpt) = (s"$dir/left", s"$dir/right", s"$dir/ckpt")
    def writeBatch(path: String, df: org.apache.spark.sql.DataFrame): Unit =
      df.coalesce(1).write.mode("append").parquet(path)
    // seed schemas BEFORE the first readStream so inference sees them
    writeBatch(lDir, Seq((1L, ts(300L), "a")).toDF("user", "ts", "tag"))
    writeBatch(rDir, Seq((1L, ts(0L), 1.0)).toDF("user", "ts", "price"))
    val lSchema = spark.read.parquet(lDir).schema
    val rSchema = spark.read.parquet(rDir).schema
    val emitted = scala.collection.mutable.Map.empty[Long, Seq[(String, Option[Double])]]
    def startQuery(): org.apache.spark.sql.streaming.StreamingQuery = {
      val l = spark.readStream.schema(lSchema).parquet(lDir)
      val r = spark.readStream.schema(rSchema).parquet(rDir)
      StreamOps.asofEnrich(l, r, Seq("user"), "ts", "ts",
          delay = "10 seconds", rightPrefix = "r_")
        .writeStream.option("checkpointLocation", ckpt)
        .foreachBatch { (df: org.apache.spark.sql.DataFrame, id: Long) =>
          val rows = df.collect().map(row => (row.getString(2),
            if (row.isNullAt(4)) None else Some(row.getDouble(4)))).toSeq
          // a restart may replay the last unacknowledged batch: keyed by
          // batch id, so the replay overwrites instead of double-counting
          emitted.synchronized { emitted(id) = rows }
          ()
        }.start()
    }
    val q1 = startQuery()
    try q1.processAllAvailable() finally q1.stop()
    // "a" is still buffered in state (wm at 290 s); restart must recover
    // it AND the standing right, then see the out-of-order 295 s right
    writeBatch(rDir, Seq((1L, ts(295L), 2.0)).toDF("user", "ts", "price"))
    writeBatch(lDir, Seq((2L, ts(2000L), "w1")).toDF("user", "ts", "tag"))
    val q2 = startQuery()
    try {
      q2.processAllAvailable()
      writeBatch(lDir,
        Seq((999L, ts(100000L), "sentinel")).toDF("user", "ts", "tag"))
      q2.processAllAvailable()
      writeBatch(lDir,
        Seq((999L, ts(200000L), "sentinel")).toDF("user", "ts", "tag"))
      q2.processAllAvailable()
    } finally q2.stop()
    val all = emitted.synchronized {
      emitted.values.flatten.filterNot(_._1 == "sentinel").toMap
    }
    all shouldBe Map("a" -> Some(2.0), "w1" -> None)
  }

  test("idle-key state is bounded: a key that saw ONLY rights collapses " +
    "to its single standing row via the self-armed timeout (no new data " +
    "for the key), and a tolerance retires even that") {
    // numRowsTotal counts one state row per KEY, and the newest advancing
    // key is always itself still pending (+1). The tolerance leg is the
    // leak regression: without the rights-only timeout the idle key's
    // state would never be visited again, let alone removed (old code: 2)
    for ((tol, wantRows) <- Seq((None, 2L), (Some(60000L), 1L))) {
      implicit val sqlCtx = spark.sqlContext
      val lMem = MemoryStream[(Long, Timestamp, String)]
      val rMem = MemoryStream[(Long, Timestamp, Double)]
      val enriched = StreamOps.asofEnrich(
        lMem.toDF.toDF("user", "ts", "tag"),
        rMem.toDF.toDF("user", "ts", "price"),
        Seq("user"), "ts", "ts", delay = "10 seconds", rightPrefix = "r_",
        toleranceMs = tol)
      val q = enriched.writeStream.format("memory")
        .queryName(s"asof_idle_${tol.isDefined}")
        .outputMode("append").start()
      try {
        // key 1 receives ONLY rights, then never appears again
        rMem.addData((1L, ts(0L), 1.0), (1L, ts(10L), 2.0),
          (1L, ts(20L), 3.0))
        q.processAllAvailable()
        // unrelated keys advance the watermark far past key 1's rights
        // (and, with a tolerance, past the standing row's retirement)
        lMem.addData((2L, ts(100000L), "adv1")); q.processAllAvailable()
        lMem.addData((3L, ts(200000L), "adv2")); q.processAllAvailable()
        lMem.addData((4L, ts(300000L), "adv3")); q.processAllAvailable()
        val stateRows = q.lastProgress.stateOperators.head.numRowsTotal
        withClue(s"tol=$tol: ") { stateRows shouldBe wantRows }
      } finally q.stop()
    }
  }

  test("tie-order parity building blocks: strings order as UTF-8 bytes " +
    "(not UTF-16 units) and Seqs order element-wise then by length, " +
    "matching the batch window sort") {
    // supplementary character: UTF-16 puts the surrogate pair below
    // ￿, UTF-8 bytes put it above — the batch sort uses bytes
    StreamOps.orderExternal("😀", "￿") should be > 0
    "😀".compareTo("￿") should be < 0 // the trap avoided
    StreamOps.orderExternal(Seq(1L, 2L), Seq(1L, 3L)) should be < 0
    StreamOps.orderExternal(Seq(1L, 2L), Seq(1L, 2L, 0L)) should be < 0
    StreamOps.orderExternal(Seq(1L, 2L), Seq(1L, 2L)) shouldBe 0
    StreamOps.orderExternal(null, Seq(1L)) should be < 0
  }

  test("mismatched key types across the two streams are rejected loudly " +
    "(the per-side string key encoding cannot widen like the batch " +
    "union does)") {
    implicit val sqlCtx = spark.sqlContext
    val lMem = MemoryStream[(Double, Timestamp, String)]
    val rMem = MemoryStream[(Long, Timestamp, Double)]
    an[IllegalArgumentException] should be thrownBy
      StreamOps.asofEnrich(
        lMem.toDF.toDF("user", "ts", "tag"),
        rMem.toDF.toDF("user", "ts", "price"),
        Seq("user"), "ts", "ts", delay = "10 seconds", rightPrefix = "r_")
  }

  test("RocksDB state-store provider: the spill-to-disk path is a config " +
    "swap — same results as the default provider") {
    val s2 = spark.newSession()
    s2.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    val got = run("asof_rocks", session = s2) { (lm, rm, q) =>
      rm.addData((1L, ts(0L), 1.0))
      lm.addData((1L, ts(300L), "a"))
      q.processAllAvailable()
      rm.addData((1L, ts(295L), 2.0))
      lm.addData((2L, ts(2000L), "w1"))
      q.processAllAvailable()
    }
    got.select("tag", "r_price").collect()
      .map(r => r.getString(0) -> Option(r.get(1))).toMap shouldBe
      Map("a" -> Some(2.0), "w1" -> None)
  }
}
