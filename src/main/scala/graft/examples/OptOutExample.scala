package graft.examples

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.operators.Layout
import graft.sinks.{SnapshotStore, UpsertConfig}

/** The end-to-end data-governance pipeline (right-to-be-forgotten /
  * opt-out) over a [[graft.sinks.SnapshotStore]] — the composition the
  * individual primitives exist for, the governance analogue of
  * [[IncrementalIngestExample]]'s ingest loop:
  *
  *  1. **Delete**: [[SnapshotStore.delete]] removes every row whose key
  *     appears in the opt-out batch — O(touched buckets), not O(table)
  *     (SCALEPROBE `delete_scale`: an 8-key opt-out reads ~3% of store
  *     bytes); a bucket emptied out drops from the manifest entirely.
  *  2. **Audit**: the row-level change feed between the pre- and
  *     post-delete versions classifies exactly the removed rows as
  *     `delete` with their PRE-image values — written to an audit table,
  *     the compliance artifact recording what was removed and at which
  *     version. The audit MUST land before step 3 (the feed needs both
  *     endpoint manifests, and step 3 reclaims the older one), and it is
  *     CRASH-RECOVERABLE: the audit step is a sweep over every retained
  *     version whose feed shows deletions but whose audit slot is empty,
  *     so a crash between the delete commit and the audit write is
  *     repaired by replaying the batch — the replay deletes nothing
  *     (keys already gone) but backfills the missing audit rows from the
  *     still-retained manifests before any vacuum can reclaim them.
  *  3. **Forget the SERVING indexes and the DEDUP STATE**:
  *     `Similarity.indexDelete` removes the victims' vectors from every
  *     ANN index built over the corpus (`serveIndexes`) — bounded to
  *     the buckets/cells/files that hold them, never a full rewrite —
  *     and `StreamOps.forgetFromDedupState` removes their
  *     fingerprints/signatures/vectors from every durable streaming-
  *     dedup state store (`dedupStateRoots`), the third place the
  *     engine persists user-derived data. Without these the corpus
  *     forgets while retrieval still serves the user's vectors and the
  *     ingest pipeline still holds their sketches forever (index
  *     maintenance rebuilds re-encode the index's OWN stored rows).
  *  4. **Forget the bytes**: `vacuum(keep = 1)` ends time-travel to the
  *     pre-delete versions NOW — an opt-out that leaves the rows
  *     readable at version v−1 has not forgotten anything.
  *  5. **Maintain**: [[Layout.storeMaintain]] — the nightly composite
  *     (bucket-sampled drift gauge, compact-if-fragmented, vacuum) —
  *     keeps the store healthy after the churn.
  *
  * Batch keys can equally arrive from a stream: run this per epoch from
  * `StreamOps.upsertSink`'s foreachBatch — replayed epochs converge
  * because deleting absent keys commits nothing (the at-least-once
  * contract, pinned in `StreamDedupSpec`), and the index/state forgets
  * are equally idempotent (absent keys are no-ops). */
object OptOutExample {

  /** What one opt-out batch did, for the pipeline's own logging: keys
    * requested vs rows actually deleted (absent keys are legal), audit
    * rows written, versions whose bytes were forgotten, rows removed
    * from each serving ANN index and each durable dedup state store,
    * and the maintenance decisions. */
  final case class OptOutReport(requested: Long, deleted: Long,
                                auditRows: Long, forgotten: Seq[Long],
                                maintain: Layout.MaintainReport,
                                indexDeleted: Map[String, Long] = Map.empty,
                                dedupForgotten: Map[String, Long] = Map.empty)

  /** Process one opt-out batch against the store at `root`, appending the
    * removed rows' pre-images to the audit table at `auditPath`.
    * Replay-safe end to end: a crash anywhere before the vacuum is
    * repaired by re-running the same batch — the delete of absent keys
    * commits nothing, and [[backfillAudit]] lands any audit rows the
    * crashed run owed BEFORE the vacuum reclaims the manifests they need.
    * `auditRows` reports rows written THIS call, which after a crashed
    * predecessor includes its backfilled versions.
    *
    * SCOPE of the repair guarantee: it holds while the pre-delete
    * manifests are still retained — i.e. as long as every vacuum on this
    * store runs through THIS pipeline (audit-then-vacuum, as here) or
    * with a `keep` sized to cover opt-out replay lag. An independent
    * `vacuum(keep=1)` from another job between the crash and the replay
    * reclaims the feed window first, and the owed audit rows become
    * unrecoverable — one governance owner per store. */
  def optOut(spark: SparkSession, root: String, keys: DataFrame,
             auditPath: String, serveIndexes: Seq[String] = Nil,
             indexIdCol: String = "id",
             dedupStateRoots: Seq[String] = Nil): OptOutReport = {
    SnapshotStore.currentVersion(spark, root).getOrElse(
      throw new IllegalArgumentException(s"no committed store at $root"))
    val requested = keys.distinct().count()
    val deleted = SnapshotStore.delete(spark, root, keys)
    // audit BEFORE vacuum, as a repair sweep rather than a one-shot
    // write: the sweep covers this batch's fresh delete AND any earlier
    // delete whose audit a crash swallowed — without it, a replay seeing
    // deleted == 0 would vacuum away the pre-delete manifest the feed
    // needs, and the rows would be forgotten with no audit record ever
    // landing
    val auditRows = backfillAudit(spark, root, auditPath)
    // the forget must reach the SERVING indexes too: their relations hold
    // copies of the vectors, and maintenance rebuilds re-encode the
    // index's OWN rows — without this step an opted-out user stays
    // retrievable forever. indexDelete is idempotent (absent ids are a
    // no-op), so a crash anywhere in this loop is repaired by replay.
    // The shared user key is the STORE's discriminant column, selected BY
    // NAME (SnapshotStore.delete allows keys with extra columns in any
    // order, so "first column" would be a silent wrong-key hash there).
    // A COMPOSITE discriminant has no single column to map onto the
    // index id — mapping its head would hash the wrong values and make
    // the index forget a silent no-op, so refuse loudly instead.
    val storeDisc = SnapshotStore.discriminantColumns(spark, root)
    require((serveIndexes.isEmpty && dedupStateRoots.isEmpty) ||
        storeDisc.size == 1,
      s"serveIndexes/dedupStateRoots forgetting maps the store's user " +
        s"key onto the index/state id column, which needs a " +
        s"SINGLE-column discriminant; this store's is " +
        s"(${storeDisc.mkString(", ")}) — call Similarity.indexDelete / " +
        "StreamOps.forgetFromDedupState directly with the right key " +
        "mapping")
    val idxKeys = keys.select(
      col(storeDisc.headOption.getOrElse("id")).as(indexIdCol))
    val indexDeleted = serveIndexes.map(p =>
      p -> graft.operators.Similarity.indexDelete(spark, p, idxKeys,
        indexIdCol)).toMap
    // the THIRD persistence surface: durable streaming-dedup state
    // retains per-document fingerprints/signatures/vectors keyed
    // forever — forget there too, or the pipeline re-learns the
    // opted-out content's sketches from state it should not hold.
    // Idempotent like the other two surfaces (absent keys delete
    // nothing), so crash-replay converges.
    val dedupForgotten = dedupStateRoots.map(r =>
      r -> graft.streaming.StreamOps.forgetFromDedupState(spark, r,
        idxKeys, indexIdCol)).toMap
    val forgotten = SnapshotStore.vacuum(spark, root, keep = 1)
    val maintain = Layout.storeMaintain(spark, root, keep = 1)
    OptOutReport(requested, deleted, auditRows, forgotten, maintain,
      indexDeleted, dedupForgotten)
  }

  /** Land audit rows for every retained version pair whose change feed
    * shows MORE deletions than its audit slot (`_opted_out_at_version`)
    * holds; returns rows written this call. The gate is COUNT-based, not
    * existence-based: a crash mid parquet job commit can land a SUBSET
    * of a version's audit rows, and an existence gate would then skip
    * the version forever — the count comparison repairs the partial
    * commit by appending only the rows not already written (anti-join
    * under null-safe equality on the full pre-image). Idempotent: a
    * fully-audited version writes nothing on replay. Valid because in
    * this pipeline only [[SnapshotStore.delete]] produces delete-type
    * changes (ingest upserts insert/update, compaction rewrites in
    * place), so delete-type feed rows ARE opt-out pre-images. Bounded
    * work: retained versions are capped by the vacuum `keep` policy,
    * each feed is a bucket-diff read, and the audit-table read is
    * filtered to the retained version window — parquet min/max stats
    * prune the grown history's files. */
  def backfillAudit(spark: SparkSession, root: String,
                    auditPath: String): Long = {
    val retained = SnapshotStore.retainedVersions(spark, root)
    if (retained.size < 2) return 0L
    // the sweep attributes the deletions between CONSECUTIVE retained
    // versions to the later one and count-gates on that version's tag —
    // valid only while retention is a contiguous suffix (which every
    // API vacuum produces: versions step by 1 and vacuum keeps the
    // newest `keep`). If an intermediate audited version were reclaimed
    // out from under us (external surgery on snapshot= directories),
    // the widened pair would re-attribute its already-audited deletions
    // to the NEXT version's tag and duplicate them — so refuse loudly
    // instead of writing wrong-version audit rows.
    require(retained == (retained.min to retained.max),
      s"retained versions at $root are non-contiguous " +
        s"(${retained.mkString(", ")}): an intermediate version was " +
        "reclaimed outside this store's vacuum, under which the audit " +
        "sweep would mis-attribute and duplicate pre-images — restore " +
        "the missing manifest or reconcile the audit table manually " +
        "(one governance owner per store)")
    val auditExists = new org.apache.hadoop.fs.Path(auditPath)
      .getFileSystem(spark.sessionState.newHadoopConf())
      .exists(new org.apache.hadoop.fs.Path(auditPath))
    val writtenCounts: Map[Long, Long] =
      if (!auditExists) Map.empty
      else spark.read.parquet(auditPath)
        .filter(col("_opted_out_at_version") >= retained.min)
        .groupBy("_opted_out_at_version").count()
        .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    retained.sliding(2).collect { case Seq(prev, v) =>
      val written = writtenCounts.getOrElse(v, 0L)
      val deletes = SnapshotStore.changes(spark, root, prev, v)
        .filter(col("_change_type") === "delete")
        .withColumn("_opted_out_at_version", lit(v))
        .persist() // feeds both the count gate and the write
      try {
        // versions with no deletions (ingest commits, compactions) get
        // no audit slot — appending empty files every batch would only
        // accrete clutter
        val n = deletes.count()
        if (n > written) {
          val missing =
            if (written == 0L) deletes
            else {
              // partial-commit repair: append only the not-yet-written
              // rows; null-safe equality so null-valued pre-image
              // columns still match their written copies
              val existing = spark.read.parquet(auditPath)
                .filter(col("_opted_out_at_version") === v)
              deletes.join(existing,
                deletes.columns.toIndexedSeq
                  .map(c => deletes(c) <=> existing(c)).reduce(_ && _),
                "left_anti")
            }
          missing.write.mode("append").parquet(auditPath)
          n - written
        } else 0L
      } finally { deletes.unpersist(); () }
    }.sum
  }

  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.001")
    val root = java.nio.file.Files
      .createTempDirectory("graft_optout").resolve("store").toString
    val auditPath = java.nio.file.Files
      .createTempDirectory("graft_optout_audit").resolve("audit").toString
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val cfg = UpsertConfig(
      clock = Some(to_timestamp(lit("2026-01-01 00:00:00"))))
    val docs = spark.read.parquet(s"$dir/documents.parquet")
      .select(col("doc_id").as("id"), col("text").as("value"))
    SnapshotStore.upsert(spark, root, docs, cfg, nBuckets = 16)
    // a serving ANN index over the same corpus (embeddings keyed by the
    // store's ids) — the retrieval surface the forget must also reach
    val indexPath = java.nio.file.Files
      .createTempDirectory("graft_optout_idx").resolve("index").toString
    graft.operators.Similarity.ivfPqBuild(
      spark.read.parquet(s"$dir/embeddings.parquet")
        .select(col("vec_id").as("id"), col("embedding")),
      "embedding", indexPath, m = 16, ksub = 16)
    // the THIRD surface: a durable streaming-dedup state store holding
    // the ingest pipeline's per-document embedding vectors (built by a
    // short embedding-dedup stream over the same id space)
    val statePath = java.nio.file.Files
      .createTempDirectory("graft_optout_state").resolve("state").toString
    locally {
      implicit val sqlCtx = spark.sqlContext
      import spark.implicits._
      val mem = org.apache.spark.sql.execution.streaming.runtime
        .MemoryStream[(Long, Seq[Double])]
      val emb = spark.read.parquet(s"$dir/embeddings.parquet")
        .select(col("vec_id").as("id"), col("embedding"))
        .as[(Long, Seq[Double])].collect().toSeq
      val q = graft.streaming.StreamOps.dedupeEmbeddingsAgainstStore(
        mem.toDF.toDF("id", "embedding"), "embedding", "id", statePath,
        dim = emb.head._2.length)((_, _) => ())
      try { mem.addData(emb: _*); q.processAllAvailable() }
      finally q.stop()
    }
    // a user opt-out batch: every row of theirs must go, and be auditable
    val optedOut = docs.filter(col("id") % 97 === 3).select("id")
    val report = optOut(spark, root, optedOut, auditPath,
      serveIndexes = Seq(indexPath), dedupStateRoots = Seq(statePath))
    println(s"OPTOUT requested=${report.requested} " +
      s"deleted=${report.deleted} audit_rows=${report.auditRows} " +
      s"forgotten=${report.forgotten.mkString(",")} " +
      s"index_deleted=${report.indexDeleted.values.sum} " +
      s"dedup_forgotten=${report.dedupForgotten.values.sum} " +
      s"maintain=${report.maintain} root=$root audit=$auditPath")
    spark.stop()
  }
}
