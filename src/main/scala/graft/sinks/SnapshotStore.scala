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

  /** Drop all snapshot directories older than the `keep` most recent
    * (never the committed one). Returns the versions removed. */
  def vacuum(spark: SparkSession, root: String, keep: Int = 2): Seq[Long] = {
    val f = fs(spark, root)
    val current = currentVersion(spark, root).getOrElse(return Seq.empty)
    val versions = f.listStatus(new Path(root)).toSeq
      .map(_.getPath.getName)
      .collect { case n if n.startsWith("snapshot=") => n.stripPrefix("snapshot=").toLong }
      .sorted
    val cut = versions.filter(v => v <= current - keep.max(1))
    cut.foreach(v => f.delete(new Path(root, s"snapshot=$v"), true))
    cut
  }

  /** Merge `updates` into the store and commit a new snapshot. Returns the
    * merge result (written rows / errors side-channel as in
    * [[InsertOrUpdate.merge]]); the new snapshot is already durable when
    * this returns. */
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
    result
  }

  private def commit(spark: SparkSession, root: String, version: Long): Unit = {
    val f = fs(spark, root)
    val tmp = new Path(root, s"$pointerName.tmp")
    val out = f.create(tmp, true)
    try out.write(version.toString.getBytes("UTF-8")) finally out.close()
    val target = new Path(root, pointerName)
    // rename onto the pointer: atomic on HDFS/local; POSIX rename replaces
    if (f.exists(target)) f.delete(target, false)
    if (!f.rename(tmp, target))
      throw new java.io.IOException(s"could not commit snapshot $version at $root")
  }
}
