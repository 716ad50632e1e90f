package graft.sinks

import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Durable target for [[InsertOrUpdate]] without a DBMS: a versioned
  * parquet snapshot directory with an atomically-swapped pointer —
  * `<root>/snapshot=N/` holds full snapshots, `<root>/_LATEST` names the
  * committed one. Readers resolve the pointer then read that directory
  * only; writers write the next snapshot fully, then commit by renaming a
  * temp pointer over `_LATEST` (rename is the atomic primitive on HDFS
  * and local filesystems). A crashed writer leaves an orphan snapshot
  * directory and no pointer change — readers never see partial data.
  *
  * This is the file-backend realization of the reference's "upsert into a
  * table" contract (writers.py:15-185): each `upsert` call is one merge
  * batch; re-running a batch converges (idempotence property of the
  * merge), which is the reference's at-least-once model.
  */
object SnapshotStore {

  private val pointerName = "_LATEST"

  private def fs(spark: SparkSession, root: String): FileSystem =
    new Path(root).getFileSystem(spark.sparkContext.hadoopConfiguration)

  /** Committed snapshot version, if any. */
  def currentVersion(spark: SparkSession, root: String): Option[Long] = {
    val f = fs(spark, root)
    val p = new Path(root, pointerName)
    if (!f.exists(p)) None
    else {
      val in = f.open(p)
      try Some(new String(in.readAllBytes(), "UTF-8").trim.toLong)
      finally in.close()
    }
  }

  /** Read the committed snapshot (None if the store is empty). */
  def read(spark: SparkSession, root: String): Option[DataFrame] =
    currentVersion(spark, root).map(readVersion(spark, root, _))

  /** Time-travel read of a specific committed-or-older version (full
    * snapshots make every retained version directly readable). */
  def readVersion(spark: SparkSession, root: String, version: Long): DataFrame =
    spark.read.parquet(s"$root/snapshot=$version")

  /** Drop snapshot directories older than the `keep` most recent, plus
    * orphans ABOVE the committed version (crashed writers that never moved
    * the pointer — each is a full-size copy that would otherwise leak
    * forever). Never removes the committed version. Returns the versions
    * removed. */
  def vacuum(spark: SparkSession, root: String, keep: Int = 2): Seq[Long] = {
    val f = fs(spark, root)
    val current = currentVersion(spark, root).getOrElse(return Seq.empty)
    val versions = f.listStatus(new Path(root)).toSeq
      .map(_.getPath.getName)
      .collect { case n if n.startsWith("snapshot=") => n.stripPrefix("snapshot=").toLong }
      .sorted
    val cut = versions.filter(v => v <= current - keep.max(1) || v > current)
    cut.foreach(v => f.delete(new Path(root, s"snapshot=$v"), true))
    cut
  }

  /** Merge `updates` into the store and commit a new snapshot. Returns the
    * merge result with `target` re-pointed at the COMMITTED snapshot and
    * `written`/`errors` eagerly materialized (localCheckpoint) — a lazy
    * result would re-run the merge against the old snapshot on every
    * action, disagreeing with what was committed (wall-clock stamps) and
    * breaking outright once `vacuum` removes the old version. With the
    * default `current_timestamp()` clock, `written`'s stamps come from its
    * own materialization pass; pass a fixed `cfg.clock` when exact stamp
    * equality between snapshot and written-rows output matters. */
  def upsert(spark: SparkSession, root: String, updates: DataFrame,
             cfg: UpsertConfig = UpsertConfig()): MergeResult = {
    val target = read(spark, root).getOrElse {
      // empty store: the target starts as an empty relation with the
      // update schema (DB-default analog: absent columns stay absent)
      spark.createDataFrame(
        spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], updates.schema)
    }
    val result = InsertOrUpdate.merge(target, updates, cfg)
    val next = currentVersion(spark, root).getOrElse(-1L) + 1L
    result.target.write.mode("overwrite").parquet(s"$root/snapshot=$next")
    commit(spark, root, next)
    MergeResult(
      target = readVersion(spark, root, next),
      written = result.written.localCheckpoint(true),
      errors = result.errors.localCheckpoint(true))
  }

  private def commit(spark: SparkSession, root: String, version: Long): Unit = {
    val f = fs(spark, root)
    val tmp = new Path(root, s"$pointerName.tmp")
    val out = f.create(tmp, true)
    try out.write(version.toString.getBytes("UTF-8")) finally out.close()
    val target = new Path(root, pointerName)
    // single atomic rename-with-overwrite (FileContext supports OVERWRITE;
    // FileSystem.rename does not) — a delete-then-rename would open a
    // window where the store reads as empty
    val fc = org.apache.hadoop.fs.FileContext.getFileContext(
      target.toUri, spark.sparkContext.hadoopConfiguration)
    fc.rename(f.makeQualified(tmp), f.makeQualified(target),
      org.apache.hadoop.fs.Options.Rename.OVERWRITE)
  }
}
