package graft

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.functions._

import graft.functions.ZValueExpr
import graft.operators.Layout
import graft.sinks.{SnapshotStore, UpsertConfig}

/** Z-order layout: the ZValueExpr kernel against an independent reference
  * implementation, equi-depth fitting, and the frozen-model store
  * integration. */
class LayoutSpec extends SparkSpec {
  import spark.implicits._

  private val tempRoots = scala.collection.mutable.ArrayBuffer.empty[java.nio.file.Path]
  private def tempRoot(prefix: String): String = {
    val p = java.nio.file.Files.createTempDirectory(prefix)
    tempRoots.synchronized(tempRoots += p)
    p.resolve("store").toString
  }

  // independent reference: bucket = #cuts <= v (NULL/NaN -> 0), LSB-first
  // interleave across dims
  private def refBucket(cuts: Array[Double], v: java.lang.Double): Int =
    if (v == null || v.isNaN) 0 else cuts.count(_ <= v)
  private def refZ(cutss: Seq[Array[Double]],
                   vs: Seq[java.lang.Double], bits: Int): Long = {
    val d = cutss.size
    var z = 0L
    for (dim <- 0 until d; bit <- 0 until bits) {
      val b = refBucket(cutss(dim), vs(dim)).toLong
      z |= ((b >> bit) & 1L) << (bit * d + dim)
    }
    z
  }

  test("ZValueExpr (codegen path) equals the reference morton interleave " +
    "on random data including NULLs, NaN and exact cut-point values") {
    val cuts1 = Array(10.0, 20.0, 30.0, 40.0)   // 5 buckets -> 3 bits
    val cuts2 = Array(-5.0, 0.0, 5.0, 100.0)
    val rnd = new scala.util.Random(99)
    val vals: Seq[(java.lang.Double, java.lang.Double)] =
      Seq[(java.lang.Double, java.lang.Double)](
        (null, 15.0), (25.0, null), (null, null),
        (Double.NaN, 50.0), (10.0, 0.0), (40.0, 100.0)) ++
        (0 until 200).map(_ => (
          java.lang.Double.valueOf(rnd.nextDouble() * 60 - 5),
          java.lang.Double.valueOf(rnd.nextDouble() * 120 - 10)))
    val df = vals.toDF("a", "b")
    val got = df.select(col("a"), col("b"),
      ZValueExpr(Seq(col("a"), col("b")), Seq(cuts1, cuts2)).as("z"))
      .collect()
    got.foreach { r =>
      val a = if (r.isNullAt(0)) null else java.lang.Double.valueOf(r.getDouble(0))
      val b = if (r.isNullAt(1)) null else java.lang.Double.valueOf(r.getDouble(1))
      r.getLong(2) shouldBe refZ(Seq(cuts1, cuts2), Seq(a, b), bits = 3)
    }
  }

  test("z is monotone in each dimension's bucket when the other is fixed " +
    "(the property that gives every dimension range-locality)") {
    val cuts = Array(1.0, 2.0, 3.0, 4.0, 5.0, 6.0, 7.0)
    def z(a: Double, b: Double): Long =
      refZ(Seq(cuts, cuts), Seq(a, b), bits = 3)
    for (fixed <- 0 to 7) {
      val fv = fixed + 0.5
      val zs = (0 to 7).map(i => z(i + 0.5, fv))
      zs shouldBe zs.sorted
      val zs2 = (0 to 7).map(i => z(fv, i + 0.5))
      zs2 shouldBe zs2.sorted
    }
    // and the DataFrame kernel agrees with the reference here too
    val pairs = for (i <- 0 to 7; j <- 0 to 7) yield (i + 0.5, j + 0.5)
    val got = pairs.toDF("a", "b").select(
      ZValueExpr(Seq(col("a"), col("b")), Seq(cuts, cuts)).as("z"))
      .collect().map(_.getLong(0))
    got.toSeq shouldBe pairs.map(p => z(p._1, p._2))
  }

  test("fitZOrder is equi-depth: buckets of a heavily skewed column hold " +
    "roughly equal row counts (an equi-width grid would pile most rows " +
    "into the first buckets)") {
    val rnd = new scala.util.Random(7)
    // exponential-ish skew, like the fixture's value column
    val df = (0 until 20000).map(_ => -math.log(rnd.nextDouble()) * 50.0)
      .toDF("v")
    val m = Layout.fitZOrder(df, Seq("v"), buckets = 16)
    val counts = df.select(ZValueExpr(Seq(col("v").cast("double")),
        m.cuts).as("z"))
      .groupBy("z").count().collect().map(_.getLong(1))
    counts.length should be >= 14 // near-full bucket usage despite skew
    val expected = 20000.0 / counts.length
    all(counts.map(_.toDouble / expected)) should (be >= 0.5 and be <= 2.0)
  }

  test("model serialization round-trips exactly (doubles included)") {
    val m = Layout.ZOrderModel(Seq("a", "b"),
      Seq(Array(1.5, 2.25, math.Pi), Array(-0.1, 1e300)))
    // array fields make case-class equality reference-based; compare
    // structurally
    val p = Layout.ZOrderModel.parse(m.serialized)
    p.cols shouldBe m.cols
    p.cuts.map(_.toSeq) shouldBe m.cuts.map(_.toSeq)
  }

  test("streaming ingest composes with the z-ordered store: each " +
    "foreachBatch epoch upserts through the frozen model, so a " +
    "continuously-ingested store keeps its layout (model fitted once, " +
    "every epoch's files sorted, rows exact)") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import graft.streaming.StreamOps
    implicit val sqlCtx = spark.sqlContext
    val root = tempRoot("graft_zstream")
    val cfg = UpsertConfig(
      clock = Some(to_timestamp(lit("2026-01-01 00:00:00"))))
    val mem = MemoryStream[(Int, Double, Double)]
    val q = StreamOps.upsertSink(mem.toDF.toDF("id", "x", "y")) {
      (batch, _) =>
        Layout.zOrderUpsert(spark, root, batch, Seq("x", "y"), cfg,
          nBuckets = 2)
        ()
    }
    val rnd = new scala.util.Random(5)
    try {
      mem.addData((0 until 200).map(i =>
        (i, rnd.nextDouble() * 100, rnd.nextDouble() * 100)))
      q.processAllAvailable()
      val frozen = SnapshotStore.getProperty(spark, root, "zorderModel").get
      mem.addData((150 until 350).map(i =>
        (i, rnd.nextDouble() * 100, rnd.nextDouble() * 100)))
      q.processAllAvailable()
      // model fitted once (first epoch), reused by the second
      SnapshotStore.getProperty(spark, root, "zorderModel").get shouldBe frozen
    } finally q.stop()
    SnapshotStore.read(spark, root).get.count() shouldBe 350L
    // every epoch's files carry the layout
    val s = java.nio.file.Files.walk(java.nio.file.Paths.get(root).getParent)
    val files =
      try s.iterator().asScala.filter { p =>
        val n = p.getFileName.toString
        java.nio.file.Files.isRegularFile(p) && n.endsWith(".parquet") &&
          !n.startsWith("_") && !n.startsWith(".")
      }.toList
      finally s.close()
    files should not be empty
    files.foreach { f =>
      val zs = spark.read.parquet(f.toString).select("__zorder")
        .collect().map(_.getLong(0)).toSeq
      withClue(s"file $f: ") { zs shouldBe zs.sorted }
    }
  }

  test("zOrderUpsert refuses an EXISTING store that is not z-ordered — " +
    "the recorded empty clusterBy would silently drop __zorder and " +
    "commit unclustered data under a model claiming otherwise") {
    val root = tempRoot("graft_zguard")
    val cfg = UpsertConfig(
      clock = Some(to_timestamp(lit("2026-01-01 00:00:00"))))
    SnapshotStore.upsert(spark, root,
      Seq((1, 2.0, 3.0)).toDF("id", "x", "y"), cfg)
    an[IllegalArgumentException] should be thrownBy
      Layout.zOrderUpsert(spark, root,
        Seq((2, 4.0, 5.0)).toDF("id", "x", "y"), Seq("x", "y"), cfg)
    // nothing was recorded by the refused call
    SnapshotStore.getProperty(spark, root, "zorderModel") shouldBe None
  }

  test("a reserved-character z-order column name fails BEFORE anything " +
    "commits (model validation precedes the data write)") {
    val root = tempRoot("graft_zres")
    val cfg = UpsertConfig(
      clock = Some(to_timestamp(lit("2026-01-01 00:00:00"))))
    an[IllegalArgumentException] should be thrownBy
      Layout.zOrderUpsert(spark, root,
        Seq((1, 2.0)).toDF("id", "x:y"), Seq("x:y"), cfg)
    SnapshotStore.currentVersion(spark, root) shouldBe None
  }

  test("zOrderDriftStats: a fresh fit reports near-uniform occupancy " +
    "(balance ~1); a drifted append concentrates ranks and the balance " +
    "signal grows — the refit-rewrite trigger") {
    val rnd = new scala.util.Random(31)
    val cfg = UpsertConfig(
      clock = Some(to_timestamp(lit("2026-01-01 00:00:00"))))
    val root = tempRoot("graft_zdrift")
    val b1 = (0 until 4000).map(i =>
      (i, rnd.nextDouble() * 100, rnd.nextDouble() * 100)).toDF("id", "x", "y")
    Layout.zOrderUpsert(spark, root, b1, Seq("x", "y"), cfg, buckets = 64)
    val before = Layout.zOrderDriftStats(spark, root)
      .collect().map(r => r.getString(0) -> r.getDouble(5)).toMap
    before.keySet shouldBe Set("x", "y")
    // equi-depth fit on its own data: every rank holds ~its fair share
    before.values.foreach(_ should be < 2.5)
    // drifted append: x values far beyond the fitted range all land in
    // the TOP rank — the dimension loses interleave resolution
    val b2 = (4000 until 12000).map(i =>
      (i, 1e6 + rnd.nextDouble(), rnd.nextDouble() * 100)).toDF("id", "x", "y")
    Layout.zOrderUpsert(spark, root, b2, Seq("x", "y"), cfg)
    val after = Layout.zOrderDriftStats(spark, root)
      .collect().map(r => r.getString(0) -> r.getDouble(5)).toMap
    // x is now dominated by one rank (2/3 of rows in bucket 63):
    // balance -> ~0.67 * 64; y stayed in-distribution
    after("x") should be > 10.0
    after("x") should be > before("x") * 4
    after("y") should be < 2.5
    // a store without a model fails loudly
    an[IllegalArgumentException] should be thrownBy
      Layout.zOrderDriftStats(spark, tempRoot("graft_zdnone"))
  }

  test("zOrderMaintain: below threshold reports 'ok' and commits nothing; " +
    "past it the store refits in place — fresh model persisted, balance " +
    "restored on every dimension, content identical minus the re-ranked " +
    "layout column, and a second call is a no-op") {
    val rnd = new scala.util.Random(47)
    val cfg = UpsertConfig(
      clock = Some(to_timestamp(lit("2026-01-01 00:00:00"))))
    val root = tempRoot("graft_zmaint")
    val b1 = (0 until 4000).map(i =>
      (i, rnd.nextDouble() * 100, rnd.nextDouble() * 100)).toDF("id", "x", "y")
    Layout.zOrderUpsert(spark, root, b1, Seq("x", "y"), cfg, buckets = 64)
    // a freshly-fit store is healthy: no rewrite, no new version
    val v0 = SnapshotStore.currentVersion(spark, root).get
    Layout.zOrderMaintain(spark, root, buckets = 64) shouldBe "ok"
    SnapshotStore.currentVersion(spark, root).get shouldBe v0
    val modelBefore = SnapshotStore.getProperty(spark, root, "zorderModel").get
    // drifted append: far-out-of-range x concentrates in the top rank
    val b2 = (4000 until 12000).map(i =>
      (i, 1e6 + rnd.nextDouble(), rnd.nextDouble() * 100)).toDF("id", "x", "y")
    Layout.zOrderUpsert(spark, root, b2, Seq("x", "y"), cfg)
    val v1 = SnapshotStore.currentVersion(spark, root).get
    def content() = SnapshotStore.read(spark, root).get
      .select("id", "x", "y").collect()
      .map(r => (r.getInt(0), r.getDouble(1), r.getDouble(2))).toSet
    val contentBefore = content()
    Layout.zOrderMaintain(spark, root, buckets = 64) shouldBe "refit"
    // exactly one rewrite commit; the model property was replaced AFTER it
    SnapshotStore.currentVersion(spark, root).get shouldBe v1 + 1
    val modelAfter = SnapshotStore.getProperty(spark, root, "zorderModel").get
    modelAfter should not be modelBefore
    // the refitted cuts restore post-fit balance on BOTH dimensions
    val after = Layout.zOrderDriftStats(spark, root)
      .collect().map(r => r.getString(0) -> r.getDouble(5)).toMap
    after.values.foreach(_ should be < 2.5)
    // rows are untouched — only the stored layout column re-ranked, and
    // it re-ranked against the FRESH model exactly
    content() shouldBe contentBefore
    val freshModel = Layout.ZOrderModel.parse(modelAfter)
    SnapshotStore.read(spark, root).get
      .filter(col("__zorder") =!= freshModel.zColumn)
      .count() shouldBe 0L
    // healthy again: the next maintain is a metadata-read no-op
    Layout.zOrderMaintain(spark, root, buckets = 64) shouldBe "ok"
    SnapshotStore.currentVersion(spark, root).get shouldBe v1 + 1
    // the rank granularity is creation-time state, persisted like
    // nBuckets: a maintain requesting a DIFFERENT resolution fails
    // loudly (a silent 64->256 refit would change the balance gauge's
    // units), while the default call reads the recorded value
    SnapshotStore.getProperty(spark, root, "zorderBuckets") shouldBe Some("64")
    val e = intercept[IllegalArgumentException] {
      Layout.zOrderMaintain(spark, root, buckets = 256)
    }
    e.getMessage should include("zorderBuckets=64")
    Layout.zOrderMaintain(spark, root) shouldBe "ok"
  }

  test("storeMaintain composes compact + drift refit + vacuum in one " +
    "call with a decisions report; a healthy store's night is all-quiet") {
    val rnd = new scala.util.Random(53)
    val cfg = UpsertConfig(
      clock = Some(to_timestamp(lit("2026-01-01 00:00:00"))))
    val root = tempRoot("graft_smaint")
    // fit on in-range data, then a drifted append (triggers refit) that
    // also fragments buckets (two upserts -> multiple files per bucket)
    val b1 = (0 until 3000).map(i =>
      (i, rnd.nextDouble() * 100, rnd.nextDouble() * 100)).toDF("id", "x", "y")
    Layout.zOrderUpsert(spark, root, b1, Seq("x", "y"), cfg, buckets = 64)
    val b2 = (3000 until 9000).map(i =>
      (i, 1e6 + rnd.nextDouble(), rnd.nextDouble() * 100)).toDF("id", "x", "y")
    Layout.zOrderUpsert(spark, root, b2, Seq("x", "y"), cfg)
    val before = SnapshotStore.read(spark, root).get
      .select("id").collect().map(_.getInt(0)).toSet
    val report = Layout.storeMaintain(spark, root, keep = 1)
    report.layout shouldBe "refit"
    report.vacuumed should not be empty // the pre-refit versions rotate out
    // rows untouched by a whole night of maintenance
    SnapshotStore.read(spark, root).get
      .select("id").collect().map(_.getInt(0)).toSet shouldBe before
    // second night: nothing to do — and vacuum keeps the committed version
    val quiet = Layout.storeMaintain(spark, root, keep = 1)
    quiet shouldBe Layout.MaintainReport(0, "ok", Nil)
    // a store without a z-order model reports layout n/a, not an error
    val plain = tempRoot("graft_smaint_plain")
    SnapshotStore.upsert(spark, plain,
      Seq(1 -> "a").toDF("id", "value"),
      UpsertConfig(clock = Some(to_timestamp(lit("2026-01-01 00:00:00")))))
    Layout.storeMaintain(spark, plain).layout shouldBe "n/a"
  }

  test("bucket-sampled drift gauge: a deterministic bucket subset tracks " +
    "the full gauge's balance ratios on fresh AND drifted stores, and the " +
    "sampled maintain trigger makes the same refit call at a fraction of " +
    "the read") {
    val rnd = new scala.util.Random(61)
    val cfg = UpsertConfig(
      clock = Some(to_timestamp(lit("2026-01-01 00:00:00"))))
    val root = tempRoot("graft_zsample")
    // 64 store buckets so a 16-bucket sample is a REAL 1/4 subset
    val b1 = (0 until 6000).map(i =>
      (i, rnd.nextDouble() * 100, rnd.nextDouble() * 100)).toDF("id", "x", "y")
    Layout.zOrderUpsert(spark, root, b1, Seq("x", "y"), cfg,
      nBuckets = 64, buckets = 64)
    def gauge(sample: Int): Map[String, Double] =
      Layout.zOrderDriftStats(spark, root, sample)
        .collect().map(r => r.getString(0) -> r.getDouble(5)).toMap
    // the sample reads fewer rows than the store holds (it IS a subset)
    val sampledRows = Layout.zOrderDriftStats(spark, root, 16)
      .agg(max(col("rows"))).collect()(0).getLong(0)
    sampledRows should be < 6000L
    sampledRows should be > 500L // ~1/4 of the store, not a sliver
    val fullFresh = gauge(0)
    val sampFresh = gauge(16)
    // ratio statistics survive sampling: same order of magnitude, both
    // reading "healthy" (a fresh equi-depth fit sits near balance 1)
    Seq("x", "y").foreach { c =>
      sampFresh(c) should be < 3.0
      fullFresh(c) should be < 2.5
    }
    // sampled trigger: healthy store -> "ok", no version burn, and the
    // clear-margin decision never needed the full scan
    val v0 = SnapshotStore.currentVersion(spark, root).get
    Layout.zOrderMaintain(spark, root, buckets = 64,
      sampleBuckets = 16) shouldBe "ok"
    SnapshotStore.currentVersion(spark, root).get shouldBe v0
    // drifted append: far-out-of-range x concentrates in the top rank
    val b2 = (6000 until 18000).map(i =>
      (i, 1e6 + rnd.nextDouble(), rnd.nextDouble() * 100)).toDF("id", "x", "y")
    Layout.zOrderUpsert(spark, root, b2, Seq("x", "y"), cfg)
    val fullDrift = gauge(0)
    val sampDrift = gauge(16)
    // both gauges see the same drifted dimension, loudly
    sampDrift("x") should be > 10.0
    fullDrift("x") should be > 10.0
    sampDrift("y") should be < 3.0
    // sampled trigger fires the refit exactly like the full one would
    val v1 = SnapshotStore.currentVersion(spark, root).get
    Layout.zOrderMaintain(spark, root, buckets = 64,
      sampleBuckets = 16) shouldBe "refit"
    SnapshotStore.currentVersion(spark, root).get shouldBe v1 + 1
    gauge(16).values.foreach(_ should be < 3.0)
    // determinism: the subset is a pure function of the id set
    val ids = SnapshotStore.manifestBucketIds(spark, root)
    Layout.sampleBucketIds(ids, 16) shouldBe Layout.sampleBucketIds(ids, 16)
    Layout.sampleBucketIds(ids, 16).size shouldBe 16
    Layout.sampleBucketIds(ids, 16).subsetOf(ids) shouldBe true
  }

  test("the drift gauge's scan is COLUMN-PRUNED to the z dimensions and " +
    "the sampled form reads only the sampled buckets' files — the " +
    "nightly health check never reads payload bytes or unsampled data") {
    val rnd = new scala.util.Random(71)
    val cfg = UpsertConfig(
      clock = Some(to_timestamp(lit("2026-01-01 00:00:00"))))
    val root = tempRoot("graft_zplan")
    // a fat payload column the gauge must never read
    val b = (0 until 2000).map(i =>
      (i, rnd.nextDouble() * 100, rnd.nextDouble() * 100,
        "payload-" * 8 + i)).toDF("id", "x", "y", "payload")
    Layout.zOrderUpsert(spark, root, b, Seq("x", "y"), cfg,
      nBuckets = 32, buckets = 64)
    def scans(df: org.apache.spark.sql.DataFrame) =
      df.queryExecution.sparkPlan.collect {
        case f: org.apache.spark.sql.execution.FileSourceScanExec => f
      }
    val full = scans(Layout.zOrderDriftStats(spark, root))
    full should not be empty
    // ReadSchema carries only the ranked dimensions
    full.foreach { f =>
      val read = f.requiredSchema.fieldNames.toSet
      read shouldBe Set("x", "y")
    }
    val sampled = scans(Layout.zOrderDriftStats(spark, root, 8))
    sampled should not be empty
    sampled.foreach { f =>
      f.requiredSchema.fieldNames.toSet shouldBe Set("x", "y")
      // 8 of the 32 bucket directories: the path list is the prune
      f.relation.location.inputFiles.map(_.replaceAll("/[^/]*$", ""))
        .distinct.length should be <= 8
    }
  }

  test("driftDecision kernel: clear-margin sampled readings decide " +
    "WITHOUT the full gauge; only the ambiguity band forces (and defers " +
    "to) the full scan; an empty store never refits") {
    var fullReads = 0
    def d(sampled: Option[Double], fullV: Option[Double] = None,
          mb: Double = 4.0, band: Double = 0.25,
          isFull: Boolean = false): Boolean =
      Layout.driftDecision(sampled, { fullReads += 1; fullV }, mb, band,
        sampledIsFull = isFull)
    // empty store: no drift to act on, full gauge untouched
    d(None, fullV = Some(99.0)) shouldBe false
    fullReads shouldBe 0
    // clear margins decide outright (boundaries included on the ok side)
    d(Some(2.9)) shouldBe false
    d(Some(3.0)) shouldBe false // == mb*(1-band)
    d(Some(5.1)) shouldBe true
    fullReads shouldBe 0
    // ambiguity band (3, 5]: the full gauge is read EXACTLY once and its
    // verdict wins — in both directions
    d(Some(4.0), fullV = Some(4.5)) shouldBe true
    fullReads shouldBe 1
    d(Some(4.9), fullV = Some(3.9)) shouldBe false
    fullReads shouldBe 2
    d(Some(3.5), fullV = Some(4.01)) shouldBe true
    fullReads shouldBe 3
    // a full-resolution "sample" (store smaller than the sample budget)
    // bypasses the band entirely — never re-reads identical data
    fullReads = 0
    d(Some(4.1), isFull = true) shouldBe true
    d(Some(4.0), isFull = true) shouldBe false
    fullReads shouldBe 0
    // band = 0 degenerates to the plain threshold with no escalation
    d(Some(4.0), band = 0.0) shouldBe false
    d(Some(4.0001), band = 0.0) shouldBe true
    fullReads shouldBe 0
  }

  test("storeMaintain checks drift FIRST: a refit night skips the " +
    "compaction the rewrite would supersede (and leaves nothing to " +
    "compact); an undrifted fragmented store still compacts") {
    val rnd = new scala.util.Random(67)
    val cfg = UpsertConfig(
      clock = Some(to_timestamp(lit("2026-01-01 00:00:00"))))
    // refit night: two upserts fragment buckets AND drift the x dimension
    val rootR = tempRoot("graft_smaint_refit")
    val b1 = (0 until 3000).map(i =>
      (i, rnd.nextDouble() * 100, rnd.nextDouble() * 100)).toDF("id", "x", "y")
    Layout.zOrderUpsert(spark, rootR, b1, Seq("x", "y"), cfg, buckets = 64)
    val b2 = (3000 until 9000).map(i =>
      (i, 1e6 + rnd.nextDouble(), rnd.nextDouble() * 100)).toDF("id", "x", "y")
    Layout.zOrderUpsert(spark, rootR, b2, Seq("x", "y"), cfg)
    val report = Layout.storeMaintain(spark, rootR)
    report.layout shouldBe "refit"
    report.compacted shouldBe 0 // never paid — the rewrite superseded it
    // and the refit rewrite really did leave every bucket in one file:
    // a compact after the fact finds nothing fragmented
    SnapshotStore.compact(spark, rootR) shouldBe 0
    // ok night: fragmented but in-distribution — compact still runs.
    // AQE's partition coalescing would write one file per bucket on this
    // tiny fixture; disable it so the merge output keeps its shuffle
    // partitioning and buckets genuinely fragment
    val rootC = tempRoot("graft_smaint_compactok")
    val aqeWas = spark.conf.get("spark.sql.adaptive.enabled")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try {
      val c1 = (0 until 3000).map(i =>
        (i, rnd.nextDouble() * 100, rnd.nextDouble() * 100))
        .toDF("id", "x", "y").repartition(4)
      Layout.zOrderUpsert(spark, rootC, c1, Seq("x", "y"), cfg,
        nBuckets = 3, buckets = 64)
      val c2 = (3000 until 6000).map(i =>
        (i, rnd.nextDouble() * 100, rnd.nextDouble() * 100))
        .toDF("id", "x", "y").repartition(4)
      Layout.zOrderUpsert(spark, rootC, c2, Seq("x", "y"), cfg)
    } finally spark.conf.set("spark.sql.adaptive.enabled", aqeWas)
    val quiet = Layout.storeMaintain(spark, rootC)
    quiet.layout shouldBe "ok"
    quiet.compacted should be > 0
  }

  test("an all-NULL z-order dimension in the fitting batch fails BEFORE " +
    "the model is persisted — an empty cut array would poison the root " +
    "for every later zOrderUpsert — and the root stays usable") {
    val root = tempRoot("graft_znull")
    val cfg = UpsertConfig(
      clock = Some(to_timestamp(lit("2026-01-01 00:00:00"))))
    val bad = Seq((1, 2.0), (2, 3.0)).toDF("id", "x")
      .withColumn("y", lit(null).cast("double"))
    val ex = the[IllegalArgumentException] thrownBy
      Layout.zOrderUpsert(spark, root, bad, Seq("x", "y"), cfg)
    ex.getMessage should include("'y' has no non-null values")
    // nothing persisted, nothing committed: the root is NOT poisoned
    SnapshotStore.getProperty(spark, root, "zorderModel") shouldBe None
    SnapshotStore.currentVersion(spark, root) shouldBe None
    // a later call with a populated batch succeeds on the same root
    val good = Seq((1, 2.0, 5.0), (2, 3.0, 7.0)).toDF("id", "x", "y")
    Layout.zOrderUpsert(spark, root, good, Seq("x", "y"), cfg)
    SnapshotStore.read(spark, root).get.count() shouldBe 2L
  }

  test("zOrderUpsert: fits + persists the model at creation, later " +
    "upserts rank against the FROZEN model even when their distribution " +
    "differs, files stay sorted by __zorder, and rows match a plain store") {
    val rnd = new scala.util.Random(21)
    def batch(ids: Range, scale: Double) =
      ids.map(i => (i, rnd.nextDouble() * scale, rnd.nextDouble() * 100))
        .toDF("id", "x", "y")
    val cfg = UpsertConfig(
      clock = Some(to_timestamp(lit("2026-01-01 00:00:00"))))
    val rootZ = tempRoot("graft_zord")
    val rootP = tempRoot("graft_zplain")
    val b1 = batch(0 until 500, 100.0)
    val b2 = batch(300 until 800, 10000.0) // drifted distribution
    Layout.zOrderUpsert(spark, rootZ, b1, Seq("x", "y"), cfg, nBuckets = 4)
    val frozen = SnapshotStore.getProperty(spark, rootZ, "zorderModel").get
    Layout.zOrderUpsert(spark, rootZ, b2, Seq("x", "y"), cfg)
    SnapshotStore.getProperty(spark, rootZ, "zorderModel").get shouldBe frozen
    // col mismatch fails loudly
    an[IllegalArgumentException] should be thrownBy
      Layout.zOrderUpsert(spark, rootZ, b1, Seq("y", "x"), cfg)
    // every written file is sorted by the stored z column
    val files = {
      val s = java.nio.file.Files.walk(
        java.nio.file.Paths.get(rootZ).getParent)
      try s.iterator().asScala
        .filter { p =>
          val n = p.getFileName.toString
          java.nio.file.Files.isRegularFile(p) && n.endsWith(".parquet") &&
            !n.startsWith("_") && !n.startsWith(".")
        }.toList
      finally s.close()
    }
    files should not be empty
    files.foreach { f =>
      val zs = spark.read.parquet(f.toString).select("__zorder")
        .collect().map(_.getLong(0)).toSeq
      withClue(s"file $f: ") { zs shouldBe zs.sorted }
    }
    // physical layout only: same rows as a plain store
    SnapshotStore.upsert(spark, rootP, b1, cfg, nBuckets = 4)
    SnapshotStore.upsert(spark, rootP, b2, cfg)
    val proj = Seq("id", "x", "y").map(col)
    SnapshotStore.read(spark, rootZ).get.select(proj: _*).orderBy("id")
      .collect().map(_.toSeq) shouldBe
      SnapshotStore.read(spark, rootP).get.select(proj: _*).orderBy("id")
        .collect().map(_.toSeq)
  }
}
