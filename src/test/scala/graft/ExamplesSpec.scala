package graft

import scala.jdk.CollectionConverters._

import graft.operators.Similarity
import graft.sinks.{SnapshotStore, UpsertConfig}

/** The shipped example programs' logic, driven as specs (the mains
  * themselves only add arg parsing and printing). */
class ExamplesSpec extends SparkSpec {

  test("corpus curation example: the composed pipeline produces the curated " +
    "schema and its store round-trip converges on re-run") {
    val docs = spark.read.parquet(s"$sf/documents.parquet")
      .select("doc_id", "text")
    val curated = examples.CorpusCurationExample.curate(docs)
    curated.columns.toSeq shouldBe
      Seq("doc_id", "lang_id", "quality", "split", "text")
    val n = curated.count()
    n should be > 0L
    n should be < docs.count() // curation dropped something

    val store = java.nio.file.Files.createTempDirectory("graft_cur").toString
    val cfg = UpsertConfig(discriminant = Seq("doc_id"),
      clock = Some(org.apache.spark.sql.functions.to_timestamp(
        org.apache.spark.sql.functions.lit("2026-01-01 00:00:00"))))
    SnapshotStore.upsert(spark, store, curated, cfg)
    // re-running the same curation converges — at-least-once contract
    SnapshotStore.upsert(spark, store, curated, cfg)
    SnapshotStore.read(spark, store).get.count() shouldBe n
    SnapshotStore.currentVersion(spark, store) shouldBe Some(1L)
  }

  test("incremental ingest example: three batches against standing band-key " +
    "state — duplicates of anything retained never re-enter, the corpus " +
    "and key table grow by exactly the survivors") {
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    val root = java.nio.file.Files.createTempDirectory("graft_ing").toString
    def ingest(rows: Seq[(Long, String)]) =
      examples.IncrementalIngestExample.ingest(spark,
        rows.toDF("doc_id", "text"), root, threshold = 1.0)
        .select("doc_id").as[Long].collect().sorted.toSeq

    ingest(Seq(
      (1L, "alpha beta gamma delta epsilon"),
      (2L, "one two three four five six"),
      (3L, "alpha beta gamma delta epsilon"))) shouldBe Seq(1L, 2L) // 3 dups 1 in-batch
    ingest(Seq(
      (10L, "alpha beta gamma delta epsilon"),  // dups retained 1
      (11L, "fresh words never seen before here"))) shouldBe Seq(11L)
    ingest(Seq(
      (20L, "fresh words never seen before here"), // dups retained 11
      (21L, "one two three four five six"),        // dups retained 2
      (22L, "entirely new closing content"))) shouldBe Seq(22L)

    val corpus = spark.read.parquet(s"$root/corpus")
    corpus.select("doc_id").as[Long].collect().sorted shouldBe
      Array(1L, 2L, 11L, 22L)
    // key table carries exactly the retained docs' band keys (16 per doc)
    val keys = spark.read.parquet(s"$root/band_keys")
    keys.select("doc_id").distinct().as[Long].collect().sorted shouldBe
      Array(1L, 2L, 11L, 22L)
    keys.groupBy("doc_id").count().select("count").as[Long]
      .collect().foreach(_ shouldBe 16L)
  }

  test("corpus curation with an eval set and a token budget: eval docs are " +
    "decontaminated away and each language stays within budget") {
    import org.apache.spark.sql.functions._
    val docs = spark.read.parquet(s"$sf/documents.parquet")
      .select("doc_id", "text")
    val eval = docs.filter(col("doc_id") % 10 === 0)
    val curated = examples.CorpusCurationExample
      .curate(docs, evalSet = Some(eval), tokenBudget = 500L)
    // no eval doc survives into the training mix
    curated.join(eval, Seq("doc_id"), "left_semi").count() shouldBe 0L
    // and the per-language token total respects the budget
    import graft.functions.{TextFunctions => T}
    curated
      .groupBy("lang_id")
      .agg(sum(T.tokenCount(col("text")).cast("long")).as("tok"))
      .collect().foreach(_.getLong(1) should be <= 500L)
    curated.count() should be > 0L
  }

  test("batch prep on curated output: every chunk fits the context size, " +
    "every chunk is packed exactly once, and no bin exceeds capacity") {
    import org.apache.spark.sql.functions._
    val docs = spark.read.parquet(s"$sf/documents.parquet")
      .select("doc_id", "text")
    val curated = examples.CorpusCurationExample.curate(docs)
    val packed = examples.CorpusCurationExample
      .prepareBatches(curated, contextTokens = 64, shards = 4)
    packed.count() should be > 0L
    // chunks respect the context size
    packed.agg(max("n_tokens")).collect().head.getLong(0) should be <= 64L
    // each chunk assigned exactly once
    packed.select("chunk_id").distinct().count() shouldBe packed.count()
    // bins never exceed capacity (chunks are <= capacity, so no oversize)
    packed.groupBy("shard", "seq")
      .agg(sum("n_tokens").as("fill")).collect()
      .foreach(_.getAs[Long]("fill") should be <= 64L)
  }

  test("opt-out pipeline example: delete removes exactly the requested " +
    "keys, the change feed audits their pre-images, vacuum FORGETS the " +
    "bytes (no victim row survives anywhere on disk, the pre-delete " +
    "version's feed is gone), maintenance runs, and a replayed batch " +
    "converges") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val root = java.nio.file.Files
      .createTempDirectory("graft_optout_spec").resolve("store").toString
    val auditPath = java.nio.file.Files
      .createTempDirectory("graft_optout_spec_a").resolve("audit").toString
    val cfg = UpsertConfig(
      clock = Some(to_timestamp(lit("2026-01-01 00:00:00"))))
    val rows = (1 to 40).map(i => (i, s"doc-$i"))
    SnapshotStore.upsert(spark, root, rows.toDF("id", "value"), cfg,
      nBuckets = 8)
    // a serving ANN index over the same id space — the forget must reach
    // it too, or retrieval keeps serving the opted-out vectors forever
    val idxPath = java.nio.file.Files
      .createTempDirectory("graft_optout_spec_i").resolve("index").toString
    def vec(i: Long): Seq[Double] =
      Seq.tabulate(8)(d => math.abs(math.sin(i.toDouble * 31 + d)) + 0.1)
    graft.operators.Similarity.ivfPqBuild(
      (1L to 40L).map(i => (i, vec(i))).toDF("id", "embedding"),
      "embedding", idxPath, nCells = 4, m = 4, ksub = 8)
    // ...and the THIRD surface: durable streaming-dedup state holding
    // the same users' embedding vectors keyed by id
    val statePath = java.nio.file.Files
      .createTempDirectory("graft_optout_spec_s").resolve("state").toString
    locally {
      implicit val sqlCtx = spark.sqlContext
      val mem = org.apache.spark.sql.execution.streaming.runtime
        .MemoryStream[(Long, Seq[Double])]
      // near-exact threshold: the fixture vectors are all-positive (one
      // orthant), so pairwise cosines routinely clear generic thresholds
      val q = graft.streaming.StreamOps.dedupeEmbeddingsAgainstStore(
        mem.toDF.toDF("id", "embedding"), "embedding", "id", statePath,
        threshold = 0.99999, dim = 8)((_, _) => ())
      try {
        mem.addData((1L to 40L).map(i => (i, vec(i))): _*)
        q.processAllAvailable()
      } finally q.stop()
    }
    SnapshotStore.read(spark, statePath).get.count() shouldBe 40L
    val victims = Seq(3, 7, 11)
    // ONE call drives all three surfaces: corpus store + serving index
    // + dedup state
    val report = examples.OptOutExample.optOut(spark, root,
      victims.toDF("id"), auditPath, serveIndexes = Seq(idxPath),
      dedupStateRoots = Seq(statePath))
    report.requested shouldBe 3L
    report.deleted shouldBe 3L
    report.auditRows shouldBe 3L
    report.indexDeleted shouldBe Map(idxPath -> 3L)
    report.dedupForgotten shouldBe Map(statePath -> 3L)
    // the dedup state no longer holds the victims' vectors...
    val state = SnapshotStore.read(spark, statePath).get
    state.count() shouldBe 37L
    state.filter(col("id").isin(victims: _*)).count() shouldBe 0L
    // ...which re-admits FUTURE copies of their content (forgotten
    // content is new content): a re-ingested victim vector is NOT
    // suppressed as a duplicate of forgotten state
    locally {
      implicit val sqlCtx = spark.sqlContext
      val mem = org.apache.spark.sql.execution.streaming.runtime
        .MemoryStream[(Long, Seq[Double])]
      var kept = 0L
      val q = graft.streaming.StreamOps.dedupeEmbeddingsAgainstStore(
        mem.toDF.toDF("id", "embedding"), "embedding", "id", statePath,
        threshold = 0.99999, dim = 8)((df, _) => kept += df.count())
      try {
        mem.addData((1003L, vec(3)))
        q.processAllAvailable()
      } finally q.stop()
      kept shouldBe 1L
    }
    report.maintain.layout shouldBe "n/a" // plain store, no z-order model
    // the index no longer holds — or serves — the victims
    val idxData = spark.read.parquet(s"$idxPath/data")
    idxData.count() shouldBe 37L
    idxData.filter(col("id").isin(victims: _*)).count() shouldBe 0L
    val victimProbe = graft.operators.Similarity.ivfPqProbeTopK(spark,
        idxPath, Seq((3L, vec(3))).toDF("query_id", "embedding"),
        "embedding", "id", "query_id", k = 3, nProbe = 4,
        shortlistFactor = 64)
      .select("id").as[Long].collect().toSet
    victimProbe.intersect(victims.map(_.toLong).toSet) shouldBe empty
    // the live store lost exactly the victims
    val live = SnapshotStore.read(spark, root).get
    live.count() shouldBe 37L
    live.filter(col("id").isin(victims: _*)).count() shouldBe 0L
    // the audit table holds the victims' PRE-images, classified delete
    val audit = spark.read.parquet(auditPath).collect()
    audit.map(_.getAs[Int]("id")).sorted shouldBe victims.toArray
    audit.foreach { r =>
      r.getAs[String]("_change_type") shouldBe "delete"
      r.getAs[String]("value") shouldBe s"doc-${r.getAs[Int]("id")}"
    }
    // byte-forgetting: NO file under the store still holds a victim row
    // (time-travel readability is gone AND the data is physically gone)
    val parquetFiles = {
      val s = java.nio.file.Files.walk(java.nio.file.Paths.get(root))
      try s.iterator().asScala.filter { p =>
        val n = p.getFileName.toString
        java.nio.file.Files.isRegularFile(p) && n.endsWith(".parquet") &&
          !n.startsWith("_") && !n.startsWith(".")
      }.map(_.toString).toList
      finally s.close()
    }
    parquetFiles.nonEmpty shouldBe true
    spark.read.parquet(parquetFiles: _*)
      .filter(col("id").isin(victims: _*)).count() shouldBe 0L
    // the pre-delete feed window is out of retention — loudly
    an[IllegalArgumentException] should be thrownBy
      SnapshotStore.changes(spark, root, 0L, 1L)
    // replayed opt-out batch (at-least-once delivery): deleting absent
    // keys commits nothing, audits nothing, content unchanged
    val replay = examples.OptOutExample.optOut(spark, root,
      victims.toDF("id"), auditPath)
    replay.deleted shouldBe 0L
    replay.auditRows shouldBe 0L
    SnapshotStore.read(spark, root).get.count() shouldBe 37L
    spark.read.parquet(auditPath).count() shouldBe 3L
  }

  test("opt-out audit survives a crash between the delete commit and " +
    "the audit write: the replayed batch deletes nothing (keys already " +
    "gone) but BACKFILLS the owed audit rows from the still-retained " +
    "manifests before any vacuum can reclaim them — rows are never " +
    "forgotten without an audit record") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val root = java.nio.file.Files
      .createTempDirectory("graft_optout_crash").resolve("store").toString
    val auditPath = java.nio.file.Files
      .createTempDirectory("graft_optout_crash_a").resolve("audit").toString
    val cfg = UpsertConfig(
      clock = Some(to_timestamp(lit("2026-01-01 00:00:00"))))
    SnapshotStore.upsert(spark, root,
      (1 to 40).map(i => (i, s"doc-$i")).toDF("id", "value"), cfg,
      nBuckets = 8)
    // batch A lands normally
    examples.OptOutExample.optOut(spark, root, Seq(3, 7).toDF("id"),
      auditPath).auditRows shouldBe 2L
    // batch B CRASHES mid-pipeline: the delete committed, the process
    // died before the audit write — simulated by running only step 1
    SnapshotStore.delete(spark, root, Seq(11, 13, 17).toDF("id")) shouldBe 3L
    val vCrash = SnapshotStore.currentVersion(spark, root).get
    // at-least-once delivery replays batch B through the full pipeline
    val replay = examples.OptOutExample.optOut(spark, root,
      Seq(11, 13, 17).toDF("id"), auditPath)
    replay.deleted shouldBe 0L        // nothing left to delete
    replay.auditRows shouldBe 3L      // the crashed run's owed audit rows
    // the audit table now carries BOTH batches' pre-images at their
    // versions, and the backfilled rows name the crashed delete's version
    val audit = spark.read.parquet(auditPath)
    audit.count() shouldBe 5L
    audit.filter(col("_opted_out_at_version") === vCrash)
      .collect().map(_.getAs[Int]("id")).sorted shouldBe Array(11, 13, 17)
    audit.collect().foreach(
      _.getAs[String]("_change_type") shouldBe "delete")
    // and the replay's vacuum then forgot the pre-delete bytes as usual
    SnapshotStore.read(spark, root).get.count() shouldBe 35L
    // a SECOND replay is a clean no-op: audited versions are skipped
    val again = examples.OptOutExample.optOut(spark, root,
      Seq(11, 13, 17).toDF("id"), auditPath)
    again.deleted shouldBe 0L
    again.auditRows shouldBe 0L
    spark.read.parquet(auditPath).count() shouldBe 5L
    // PARTIAL-COMMIT repair: the crashed run landed a SUBSET of its
    // version's audit rows (a parquet job commit can die mid-move); an
    // existence gate would skip the version forever — the count gate
    // tops up exactly the missing pre-images, without duplicating the
    // written one
    val vB = SnapshotStore.currentVersion(spark, root).get
    SnapshotStore.delete(spark, root, Seq(19, 23, 29).toDF("id")) shouldBe 3L
    val vP = SnapshotStore.currentVersion(spark, root).get
    SnapshotStore.changes(spark, root, vB, vP)
      .filter(col("_change_type") === "delete")
      .withColumn("_opted_out_at_version", lit(vP))
      .orderBy("id").limit(1)
      .write.mode("append").parquet(auditPath)
    val repair = examples.OptOutExample.optOut(spark, root,
      Seq(19, 23, 29).toDF("id"), auditPath)
    repair.deleted shouldBe 0L
    repair.auditRows shouldBe 2L // only the missing two
    val forV = spark.read.parquet(auditPath)
      .filter(col("_opted_out_at_version") === vP)
    forV.count() shouldBe 3L
    forV.select("id").distinct().count() shouldBe 3L // no duplicates
  }

  test("ANN ingest example: build once, appends ride the standing model " +
    "while gauges stay quiet, a drifted batch trips the nightly " +
    "maintenance into a staged rebuild WITH recall recalibration, and " +
    "default-width probes then serve the calibrated contract") {
    import org.apache.spark.sql.functions._
    val path = java.nio.file.Files
      .createTempDirectory("graft_ann_spec").resolve("index").toString
    val emb = spark.read.parquet(s"$sf/embeddings.parquet")
      .select("vec_id", "embedding")
    val elem = emb.schema("embedding").dataType
      .asInstanceOf[org.apache.spark.sql.types.ArrayType].elementType
    val corpus0 = emb.filter(col("vec_id") >= 20)
    Similarity.ivfPqBuild(corpus0, "embedding", path, m = 16, ksub = 16)
    // in-distribution day: quiet gauges, no rebuild, still uncalibrated
    val day1 = examples.AnnIngestExample.ingestDay(spark,
      corpus0.select((col("vec_id") + 1000000L).as("vec_id"),
        col("embedding")),
      "embedding", "vec_id", path)
    day1.layout shouldBe "ivf-pq"
    day1.decision shouldBe "ok"
    day1.calibrated shouldBe None
    // drifted day: the codebook-drift gauge trips, the staged rebuild
    // refits, and the recall target calibrates both probe widths
    val day2 = examples.AnnIngestExample.ingestDay(spark,
      corpus0.select((col("vec_id") + 2000000L).as("vec_id"),
        transform(col("embedding"), x => (x + lit(8.0)).cast(elem))
          .as("embedding")),
      "embedding", "vec_id", path)
    day2.decision shouldBe "rebuilt"
    val Some((np, f)) = day2.calibrated
    np should be >= 1
    f should be >= 1
    // converged: the next night is quiet again (fresh baselines)
    examples.AnnIngestExample.ingestDay(spark,
      corpus0.select((col("vec_id") + 3000000L).as("vec_id"),
        col("embedding")),
      "embedding", "vec_id", path).decision shouldBe "ok"
    // default-width probes serve k exact-scored hits per query
    val queries = emb.filter(col("vec_id") < 3)
      .select(col("vec_id").as("query_id"), col("embedding"))
    val hits = Similarity.ivfPqProbeTopK(spark, path, queries,
      "embedding", "vec_id", "query_id", k = 5)
    hits.groupBy("query_id").count().collect()
      .foreach(_.getLong(1) shouldBe 5L)
  }
}
