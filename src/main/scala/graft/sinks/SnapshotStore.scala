package graft.sinks

import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType

/** Durable target for [[InsertOrUpdate]] without a DBMS: a versioned,
  * BUCKET-INCREMENTAL parquet store with an atomically-swapped pointer.
  *
  * Layout:
  * {{{
  *   <root>/_LATEST                    committed version number
  *   <root>/_META                      store constants (bucket count)
  *   <root>/claim=N                    create-exclusive writer claim for version N
  *   <root>/snapshot=N/_MANIFEST       schema + {bucket -> version holding its data}
  *   <root>/snapshot=N/__bucket=B/     parquet for buckets REWRITTEN at version N
  * }}}
  *
  * Rows are assigned to one of `nBuckets` buckets by
  * `pmod(hash(discriminant), nBuckets)` (Murmur3 — deterministic across
  * sessions). An upsert merges ONLY the buckets containing update keys and
  * writes only those bucket directories; the new manifest points untouched
  * buckets at the older snapshot directories that already hold their data.
  * This is what makes the store hold at 100 TB: a small update batch costs
  * O(touched buckets) read+write, not O(table) — the previous full-snapshot
  * design re-wrote the entire table per batch. Readers resolve the pointer,
  * read that version's manifest, and scan the referenced bucket directories
  * (a plain multi-path parquet scan; time-travel reads any retained
  * manifest the same way).
  *
  * Commit protocol: a writer first CLAIMS its target version by creating
  * `claim=N` with create-exclusive semantics — two concurrent writers that
  * both read version N−1 race on the claim and the loser fails with
  * [[ConcurrentWriteException]] instead of silently clobbering (claims for
  * committed versions are kept so a stale writer can never re-claim them).
  * The winner writes data + manifest, then commits by renaming a temp
  * pointer over `_LATEST` (rename is the atomic primitive on HDFS and
  * local filesystems; object stores without atomic create/rename need an
  * external lock). A crashed writer leaves an orphan claim + snapshot
  * directory and no pointer change — readers never see partial data, and
  * `vacuum` reclaims the orphans (do not run `vacuum` concurrently with a
  * live writer: it would reap the in-flight claim).
  *
  * This is the file-backend realization of the reference's "upsert into a
  * table" contract (writers.py:15-185): each `upsert` call is one merge
  * batch; re-running a batch converges (idempotence property of the
  * merge), which is the reference's at-least-once model.
  */
object SnapshotStore {

  private val pointerName = "_LATEST"
  private val metaName = "_META"
  private val manifestName = "_MANIFEST"
  private val bucketCol = "__bucket"

  /** Default bucket count — sized for tests/small stores; a 100 TB store
    * wants O(10k) buckets so one bucket is a few GB (set once at creation). */
  val DefaultBuckets = 16

  /** A second writer raced this one to the same version (lost-update guard). */
  final class ConcurrentWriteException(msg: String) extends RuntimeException(msg)

  private final case class Manifest(schema: StructType, buckets: Map[Int, Long])

  private def fs(spark: SparkSession, root: String): FileSystem =
    new Path(root).getFileSystem(spark.sparkContext.hadoopConfiguration)

  private def readSmallFile(f: FileSystem, p: Path): String = {
    val in = f.open(p)
    try new String(in.readAllBytes(), "UTF-8") finally in.close()
  }

  private def writeSmallFile(f: FileSystem, p: Path, s: String,
                             overwrite: Boolean): Unit = {
    val out = f.create(p, overwrite)
    try out.write(s.getBytes("UTF-8")) finally out.close()
  }

  /** Committed snapshot version, if any. */
  def currentVersion(spark: SparkSession, root: String): Option[Long] = {
    val f = fs(spark, root)
    val p = new Path(root, pointerName)
    if (!f.exists(p)) None else Some(readSmallFile(f, p).trim.toLong)
  }

  private def readProps(f: FileSystem, root: String): Map[String, String] = {
    val p = new Path(root, metaName)
    if (!f.exists(p)) Map.empty
    else readSmallFile(f, p).linesIterator.flatMap { l =>
      l.split("=", 2) match {
        case Array(k, v) if k.trim.nonEmpty => Some(k.trim -> v.trim)
        case _ => None
      }
    }.toMap
  }

  private def writeProps(f: FileSystem, root: String,
                         props: Map[String, String]): Unit =
    // ATOMIC replace, not create(overwrite=true): the meta file carries
    // layout-load-bearing recordings (nBuckets, discriminant, clusterBy,
    // z-order model) for the WHOLE store, and an in-place truncate-then-
    // write crashing mid-way would leave it empty — the next upsert would
    // silently fall back to DefaultBuckets and skip the discriminant
    // check, hashing rows into wrong buckets. tmp + rename means a crash
    // leaves either the old recordings or the new, never a torn subset —
    // which is also what makes setProperties' multi-key atomicity claim
    // true.
    atomicReplaceSmallFile(f, root, metaName,
      props.toSeq.sorted.map { case (k, v) => s"$k=$v" }.mkString("", "\n", "\n"))

  /** Atomically replace a small control file (meta, pointer): write a tmp
    * sibling, then swap it over the target with the filesystem's atomic
    * rename. On `file:` filesystems Hadoop's OVERWRITE rename is emulated
    * non-atomically (delete-then-rename, plus a second rename for the
    * `.crc` sidecar — racing readers transiently see no file or a stale
    * checksum), so the local path goes through POSIX `rename(2)` via NIO
    * with no checksum sidecar (stale sidecars from older code are
    * removed); HDFS keeps its native atomic `FileContext` rename.
    *
    * The old-or-new guarantee holds only where rename IS an atomic
    * metadata swap: `file:` (POSIX rename(2)) and HDFS-compatible
    * filesystems (hdfs, viewfs, abfs). Object stores emulate rename as
    * copy+delete, under which racing readers could observe an absent or
    * torn pointer/meta — so those schemes are rejected loudly below
    * rather than silently weakening the protocol. */
  private val nonAtomicRenameSchemes: Set[String] =
    Set("s3", "s3a", "s3n", "gs", "oss", "cos", "cosn", "swift",
      "wasb", "wasbs")

  /** Whether [[atomicReplaceSmallFile]] can give its old-or-new
    * guarantee on this filesystem. Callers whose file is advisory rather
    * than load-bearing (e.g. the streaming ingest fence, whose torn
    * outcome is caught by a loud parse-and-recover path) use this to
    * fall back to a plain overwrite on object stores instead of
    * inheriting the control-file protocol's hard refusal. */
  private[graft] def atomicRenameCapable(f: FileSystem): Boolean =
    !nonAtomicRenameSchemes.contains(f.getScheme)

  /** The one ADVISORY small-file write discipline: tmp + atomic rename
    * where the filesystem swaps atomically ([[atomicReplaceSmallFile]]),
    * plain overwrite-create where it cannot — for files whose torn
    * outcome is caught by a loud parse-and-recover path rather than by
    * the control-file protocol's hard refusal (the streaming ingest
    * fence and its migration, the index calibration artifacts). One
    * helper so the fallback semantics cannot drift between the writers
    * that share a file format. */
  private[graft] def replaceSmallFilePreferAtomic(f: FileSystem,
                                                  root: String,
                                                  name: String,
                                                  content: String): Unit =
    if (atomicRenameCapable(f)) atomicReplaceSmallFile(f, root, name, content)
    else {
      val out = f.create(new Path(root, name), true)
      try out.write(content.getBytes(
        java.nio.charset.StandardCharsets.UTF_8))
      finally out.close()
    }

  private[graft] def atomicReplaceSmallFile(f: FileSystem, root: String,
                                            name: String,
                                            content: String): Unit = {
    val target = new Path(root, name)
    // UNIQUE tmp per call: a fixed sibling name would let two racing
    // replacers truncate each other's tmp mid-write — one could install
    // the other's bytes and strand the loser on a vanished file, an
    // exception path the old overwrite-in-place write never had. With a
    // unique name each writer renames its own complete bytes; racing
    // writers degrade to last-rename-wins, same as before. The leading
    // dot keeps a crashed call's leftover hidden from directory readers
    // (and the pointer-era fixed-name sidecars are still cleaned below).
    val tmpName = s".$name.tmp-${java.util.UUID.randomUUID().toString}"
    if (f.getScheme == "file") {
      val dir = java.nio.file.Paths.get(new Path(root).toUri.getPath)
      java.nio.file.Files.createDirectories(dir)
      val tmp = dir.resolve(tmpName)
      java.nio.file.Files.write(tmp, content.getBytes("UTF-8"))
      Seq(s".$name.crc", s".$name.tmp.crc").foreach(c =>
        java.nio.file.Files.deleteIfExists(dir.resolve(c)))
      java.nio.file.Files.move(tmp, dir.resolve(name),
        java.nio.file.StandardCopyOption.ATOMIC_MOVE,
        java.nio.file.StandardCopyOption.REPLACE_EXISTING)
    } else {
      // BREAKING vs pre-r17 behavior (which overwrote non-atomically):
      // deployments that know their object store is safe for this —
      // a consistent metadata layer in front of it, or a guaranteed
      // single reader — can acknowledge the trade explicitly instead
      // of losing the store (see README "object stores" note):
      //   spark.hadoop.graft.snapshot.allowNonAtomicControlFiles=true
      require(!nonAtomicRenameSchemes.contains(f.getScheme) ||
          f.getConf.getBoolean(
            "graft.snapshot.allowNonAtomicControlFiles", false),
        s"SnapshotStore control files require an atomic rename, which " +
          s"'${f.getScheme}' does not provide (object-store rename is " +
          "copy+delete; racing readers could see an absent or torn " +
          "pointer/meta). Host the store root on an HDFS-compatible " +
          "filesystem, front the object store with a consistent " +
          "metadata layer, or — acknowledging the torn-reader hazard — " +
          "set graft.snapshot.allowNonAtomicControlFiles=true in the " +
          "Hadoop conf.")
      val tmp = new Path(root, tmpName)
      writeSmallFile(f, tmp, content, overwrite = true)
      if (nonAtomicRenameSchemes.contains(f.getScheme)) {
        // acknowledged non-atomic deployment (opt-in above): there is no
        // atomicity to preserve, so use the plain FileSystem rename —
        // the FileContext API below would additionally require an
        // AbstractFileSystem binding object stores often lack
        f.delete(target, false)
        require(f.rename(tmp, target),
          s"rename $tmp -> $target failed on '${f.getScheme}'")
      } else {
        val fc = org.apache.hadoop.fs.FileContext.getFileContext(
          target.toUri, f.getConf)
        fc.rename(f.makeQualified(tmp), f.makeQualified(target),
          org.apache.hadoop.fs.Options.Rename.OVERWRITE)
      }
    }
  }

  /** Application-level store property (e.g. the signature width a
    * streaming dedup store was built with), kept in the same tiny meta
    * file as the bucket count. */
  def getProperty(spark: SparkSession, root: String, key: String): Option[String] =
    readProps(fs(spark, root), root).get(key)

  /** Set (or overwrite) an application-level store property, preserving
    * all other meta lines. A read-merge-write of a small file — callers
    * serialize writers the same way they do for `upsert`. */
  def setProperty(spark: SparkSession, root: String, key: String,
                  value: String): Unit =
    setProperties(spark, root, Map(key -> value))

  /** Set several properties in ONE meta-file write. Properties that must
    * stay mutually consistent (e.g. a z-order model and its bucket
    * granularity) go through this, not per-key [[setProperty]] calls: the
    * single small-file write means a crash leaves either all of them or
    * none, never a torn subset. */
  def setProperties(spark: SparkSession, root: String,
                    props: Map[String, String]): Unit = {
    val f = fs(spark, root)
    writeProps(f, root, readProps(f, root) ++ props)
  }

  /** Bucket count fixed at store creation (None until the first commit). */
  def numBuckets(spark: SparkSession, root: String): Option[Int] =
    getProperty(spark, root, "nBuckets").map(_.toInt)

  /** Cluster columns fixed at store creation (empty when the store is
    * unclustered). Every rewrite path ([[upsert]], [[compact]]) keeps each
    * written file sorted by these columns — see the `clusterBy` doc on
    * [[upsert]]. */
  def clusterColumns(spark: SparkSession, root: String): Seq[String] =
    getProperty(spark, root, "clusterBy")
      .map(_.split(",").map(_.trim).filter(_.nonEmpty).toSeq)
      .getOrElse(Nil)

  /** Discriminant (merge-key) columns recorded at store creation. Bucket
    * assignment hashes these columns, so they are a PHYSICAL-LAYOUT
    * property exactly like `nBuckets`: an upsert with a different
    * discriminant would probe the wrong buckets and silently duplicate
    * keys across buckets (the stored row lives in hash(keyA)'s bucket,
    * the update lands in hash(keyB)'s). [[upsert]] therefore validates
    * its config against this recording and fails loudly on a mismatch.
    * Empty only for stores created before the property existed; the next
    * upsert records it. */
  def discriminantColumns(spark: SparkSession, root: String): Seq[String] =
    getProperty(spark, root, "discriminant")
      .map(_.split(",").map(_.trim).filter(_.nonEmpty).toSeq)
      .getOrElse(Nil)

  private def bucketExpr(disc: Seq[Column], nBuckets: Int): Column =
    pmod(hash(disc: _*), lit(nBuckets))

  // ------------------------------------------------------------- manifests

  private def manifestPath(root: String, version: Long) =
    new Path(s"$root/snapshot=$version", manifestName)

  private def writeManifest(f: FileSystem, root: String, version: Long,
                            m: Manifest): Unit = {
    val body = (s"schema=${m.schema.toDDL}" +:
      m.buckets.toSeq.sorted.map { case (b, v) => s"bucket=$b version=$v" })
      .mkString("\n")
    writeSmallFile(f, manifestPath(root, version), body, overwrite = false)
  }

  private def readManifest(spark: SparkSession, root: String,
                           version: Long): Manifest = {
    val f = fs(spark, root)
    val lines = readSmallFile(f, manifestPath(root, version)).linesIterator.toSeq
    val schema = lines.collectFirst { case l if l.startsWith("schema=") =>
      StructType.fromDDL(l.stripPrefix("schema=")) }
      .getOrElse(throw new IllegalStateException(
        s"manifest for snapshot=$version has no schema line"))
    val buckets = lines.collect { case l if l.startsWith("bucket=") =>
      val Array(b, v) = l.stripPrefix("bucket=").split(" version=")
      b.trim.toInt -> v.trim.toLong
    }.toMap
    Manifest(schema, buckets)
  }

  private def bucketPath(root: String, version: Long, bucket: Int): String =
    s"$root/snapshot=$version/$bucketCol=$bucket"

  private def readBuckets(spark: SparkSession, root: String, m: Manifest,
                          only: Option[Set[Int]]): DataFrame = {
    val entries = only.fold(m.buckets)(s => m.buckets.view.filterKeys(s).toMap)
    if (entries.isEmpty)
      spark.createDataFrame(
        spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], m.schema)
    else {
      val paths = entries.toSeq.sorted.map { case (b, v) => bucketPath(root, v, b) }
      spark.read.schema(m.schema).parquet(paths: _*)
    }
  }

  // ----------------------------------------------------------------- reads

  /** Read the committed snapshot (None if the store is empty).
    *
    * READER-vs-VACUUM contract: the returned DataFrame scans the bucket
    * directories its manifest referenced at RESOLUTION time. A
    * concurrent [[vacuum]] never reclaims the version the pointer
    * commits to — but a reader can hold a resolution STALE (the store
    * advanced and vacuum dropped its version mid-scan), and then its
    * next action fails LOUDLY (missing file/path errors: absent inputs
    * are errors, not skips, under Spark's default
    * `spark.sql.files.ignoreMissingFiles=false`) — it can never return
    * silently partial rows. The failure is retryable: call `read` again
    * to re-resolve the committed pointer. Pinned live in
    * SnapshotStoreSpec's reader-vs-vacuum race. */
  def read(spark: SparkSession, root: String): Option[DataFrame] =
    currentVersion(spark, root).map(readVersion(spark, root, _))

  /** Time-travel read of any retained version: resolve that version's
    * manifest, scan the bucket directories it references (which may live in
    * older `snapshot=` directories — that sharing is the incrementality).
    * Versions committed by the pre-manifest format (a plain full-snapshot
    * parquet directory) are read directly — old stores stay readable, and
    * the next upsert migrates them to the bucketed layout. Carries
    * [[read]]'s reader-vs-vacuum contract: a `vacuum` that reclaims THIS
    * version makes actions on the returned DataFrame fail loudly, never
    * return partial rows — time-travel readers lagging behind the vacuum
    * horizon must retry against a retained version. */
  def readVersion(spark: SparkSession, root: String, version: Long): DataFrame = {
    val f = fs(spark, root)
    if (f.exists(manifestPath(root, version)))
      readBuckets(spark, root, readManifest(spark, root, version), None)
    else
      spark.read.parquet(s"$root/snapshot=$version") // legacy full snapshot
  }

  /** Versions whose manifests are still retained — readable for time
    * travel and usable as [[changes]] endpoints — ascending, up to the
    * committed version. A driver-side directory listing, no data scan.
    * What [[vacuum]] has not reclaimed; consumers that must not miss a
    * version window (audit backfill, lagging change feeds) enumerate
    * this BEFORE vacuuming. */
  def retainedVersions(spark: SparkSession, root: String): Seq[Long] = {
    val f = fs(spark, root)
    if (!f.exists(new Path(root))) Seq.empty
    else currentVersion(spark, root) match {
      case None => Seq.empty
      case Some(current) =>
        f.listStatus(new Path(root)).toSeq.map(_.getPath.getName)
          .collect { case n if n.startsWith("snapshot=") =>
            n.stripPrefix("snapshot=").toLong }
          .filter(v => v <= current && f.exists(manifestPath(root, v)))
          .sorted
    }
  }

  /** Bucket ids the committed manifest references — empty when the store
    * has no committed version or predates the bucketed-manifest format.
    * A driver-side metadata read (one small file), no data scan. */
  def manifestBucketIds(spark: SparkSession, root: String): Set[Int] =
    currentVersion(spark, root) match {
      case Some(v) if fs(spark, root).exists(manifestPath(root, v)) =>
        readManifest(spark, root, v).buckets.keySet
      case _ => Set.empty
    }

  /** Pruned read of ONLY the given buckets of the committed version — the
    * primitive behind bucket-SAMPLED health gauges
    * ([[graft.operators.Layout.zOrderDriftStats]]): bucket membership is
    * `hash(discriminant)`, independent of every other column, so a
    * deterministic bucket subset is an unbiased row sample and a
    * ratio-shaped statistic computed over it (occupancy skew, null rates)
    * estimates the full-store value at `|buckets|/nBuckets` of the scan
    * cost. Ids absent from the manifest are ignored (a bucket can be
    * empty). */
  def readBucketSubset(spark: SparkSession, root: String,
                       buckets: Set[Int]): DataFrame = {
    val v = currentVersion(spark, root).getOrElse(throw
      new IllegalArgumentException(s"store at $root has no committed version"))
    require(fs(spark, root).exists(manifestPath(root, v)),
      s"store at $root predates the bucketed-manifest format; run one " +
        "upsert to migrate it, then read bucket subsets")
    readBuckets(spark, root, readManifest(spark, root, v), Some(buckets))
  }

  // ----------------------------------------------------------- change feed

  /** Manifest for `version` if it is still retained, with a vacuum-aware
    * error when it is not (change-feed reads need BOTH endpoint manifests;
    * `vacuum(keep=N)` bounds how far back a consumer may lag). */
  private def retainedManifest(spark: SparkSession, root: String,
                               version: Long): Manifest = {
    val f = fs(spark, root)
    require(f.exists(manifestPath(root, version)),
      s"snapshot=$version of $root has no retained manifest — either the " +
        "version never committed, vacuum() reclaimed it (raise `keep` to " +
        "cover the slowest change-feed consumer's lag), or it predates the " +
        "bucketed-manifest format")
    readManifest(spark, root, version)
  }

  /** Bucket-granular change feed: the buckets whose data location moved
    * between two committed versions, straight from the manifest diff — a
    * driver-side metadata read, no data scan. This is the coarse feed an
    * incremental downstream job keys its recomputation on (re-derive only
    * partitions fed by these buckets). Includes buckets [[compact]]
    * rewrote without changing content (their location moved; the
    * row-level [[changes]] diff of such a bucket is empty). */
  def changedBuckets(spark: SparkSession, root: String,
                     fromVersion: Long, toVersion: Long): Set[Int] = {
    require(fromVersion <= toVersion,
      s"fromVersion $fromVersion must be <= toVersion $toVersion")
    val mFrom = retainedManifest(spark, root, fromVersion)
    val mTo = retainedManifest(spark, root, toVersion)
    diffBucketIds(mFrom.buckets, mTo.buckets)
  }

  /** Manifest-diff kernel for [[changedBuckets]]: the UNION of both
    * manifests' bucket ids, filtered to those whose data location
    * differs — so a bucket present at `from` but absent at `to`
    * (whole-bucket removal, produced when [[delete]] empties a bucket)
    * reports as changed and its rows classify `delete`, instead of
    * silently vanishing from a to-side-only iteration. */
  private[graft] def diffBucketIds(from: Map[Int, Long],
                                   to: Map[Int, Long]): Set[Int] =
    (from.keySet ++ to.keySet).filter(b => from.get(b) != to.get(b))

  /** Row-level change-data feed between two committed versions: the NET
    * difference of the stored state, classified per discriminant key as
    * `insert` (key absent at `fromVersion`), `update` (present at both
    * with any column differing — post-image values), or `delete` (absent
    * at `toVersion` — produced by [[delete]]; delete rows carry their
    * PRE-image values, there being no post-image). Output schema: the
    * store's columns plus a `_change_type` string.
    *
    * Scale shape — this is the point of the operator: the manifest diff
    * names exactly the buckets that were rewritten in the interval, and
    * BOTH sides of the diff read only those buckets
    * ([[readBuckets]] with the changed set), so bytes scanned are
    * proportional to the churned fraction of the store, not its size —
    * a 0.1%-churn day on a 100 TB store diffs ~2 × 100 GB, where a naive
    * `post.except(pre)` reads 200 TB. The single exchange is the key join
    * over the changed buckets' rows. Unchanged rows carried along by a
    * bucket rewrite (an upsert rewrites whole buckets) join equal and are
    * dropped, so feed SIZE is the true row churn even though feed BYTES
    * are bucket-granular.
    *
    * NET semantics across multi-version windows: a row updated and then
    * reverted within (from, to] compares equal and is absent from the
    * feed; intermediate states are not reconstructed (the store keeps
    * state snapshots, not a commit log). Consumers needing per-commit
    * granularity walk (v, v+1) pairs, bounded by vacuum retention. */
  def changes(spark: SparkSession, root: String,
              fromVersion: Long, toVersion: Long): DataFrame = {
    val spark0 = spark
    val keys = discriminantColumns(spark, root)
    require(keys.nonEmpty,
      s"store at $root has no recorded discriminant (created before the " +
        "property existed) — run one upsert to backfill it, then diff")
    val mFrom = retainedManifest(spark, root, fromVersion)
    val mTo = retainedManifest(spark, root, toVersion)
    require(mFrom.schema == mTo.schema,
      s"schema changed between snapshot=$fromVersion and snapshot=$toVersion")
    val changed = changedBuckets(spark, root, fromVersion, toVersion)
    val pre = readBuckets(spark0, root, mFrom, Some(changed))
    val post = readBuckets(spark0, root, mTo, Some(changed))
    val dataCols = mTo.schema.fieldNames.toSeq
    val preS = pre.select(
      keys.map(col) :+ struct(dataCols.map(col): _*).as("__pre"): _*)
    val postS = post.select(
      keys.map(col) :+ struct(dataCols.map(col): _*).as("__post"): _*)
    // keys are unique per committed snapshot (the upsert merge's contract),
    // so the full-outer key join is 1:1; <=> compares the full row structs
    // null-safely, classifying carried-along unchanged rows out of the feed
    val picked = coalesce(col("__post"), col("__pre"))
    preS.join(postS, keys, "full_outer")
      .withColumn("_change_type",
        when(col("__pre").isNull, lit("insert"))
          .when(col("__post").isNull, lit("delete"))
          .when(!(col("__pre") <=> col("__post")), lit("update")))
      .filter(col("_change_type").isNotNull)
      .select(dataCols.map(c => picked.getField(c).as(c)) :+
        col("_change_type"): _*)
  }

  // ---------------------------------------------------------------- vacuum

  /** Reclaim space while preserving the `keep` most recent committed
    * versions (always including the committed one). Removal is
    * (version, bucket)-granular: a bucket directory in an old snapshot
    * survives as long as ANY retained manifest still references it; only
    * unreferenced bucket directories, dropped versions' manifests, and
    * orphans ABOVE the committed version (crashed writers — full-size data
    * that would otherwise leak forever) are deleted. On a store with NO
    * committed version, everything on disk is a crashed first writer's
    * leftovers and is reclaimed (this is also how a wedged `claim=0` from
    * a failed first commit is recovered). Returns the versions whose
    * readability was removed this call. Single-process only — do not run
    * concurrently with a writer.
    *
    * Concurrent READERS are safe in the no-silent-partial sense: the
    * committed version is always retained, and a reader whose resolved
    * version this call reclaims fails LOUDLY on its next action (absent
    * inputs are errors under `ignoreMissingFiles=false`) and re-resolves
    * — it can never read a partial state ([[read]]'s contract; pinned by
    * SnapshotStoreSpec's reader-vs-vacuum race). Size `keep` to cover
    * the slowest reader's/change-feed consumer's lag. */
  def vacuum(spark: SparkSession, root: String, keep: Int = 2): Seq[Long] = {
    val f = fs(spark, root)
    if (!f.exists(new Path(root))) return Seq.empty
    val currentOpt = currentVersion(spark, root)
    val current = currentOpt.getOrElse(-1L)
    val names = f.listStatus(new Path(root)).toSeq.map(_.getPath.getName)
    val versions = names
      .collect { case n if n.startsWith("snapshot=") => n.stripPrefix("snapshot=").toLong }
      .sorted
    // one listing per snapshot dir per vacuum, shared by the legacy-data
    // readability probe below and the sweep loop further down — a second
    // listStatus per dir doubles driver round-trips on object stores, and
    // previously-vacuumed shells would otherwise be re-listed on every
    // vacuum forever
    val dirEntries: Map[Long, Seq[org.apache.hadoop.fs.FileStatus]] =
      versions.map(v =>
        v -> f.listStatus(new Path(root, s"snapshot=$v")).toSeq).toMap
    // a version is readable either through its manifest or — legacy
    // pre-manifest format — through bare part files directly under its
    // snapshot dir; BOTH count toward `keep` retention. Versions already
    // vacuumed (manifest gone, no bare data) are shells, not candidates —
    // without this, raising `keep` after a vacuum would try to read a
    // deleted manifest
    def hasLegacyData(v: Long): Boolean =
      dirEntries(v)
        .exists(st => st.isFile && st.getPath.getName.endsWith(".parquet"))
    val readableOld = versions
      .filter(v => v <= current &&
        (f.exists(manifestPath(root, v)) || hasLegacyData(v)))
    val retained = (readableOld.takeRight(keep.max(1)) ++ currentOpt).distinct
    // every (version, bucket) still referenced by a retained manifest
    // (legacy pre-manifest current versions contribute nothing — their data
    // lives directly under their own snapshot dir, untouched below)
    val live: Set[(Long, Int)] = retained
      .filter(v => f.exists(manifestPath(root, v)))
      .flatMap { v =>
        // .toSeq FIRST: mapping the Map[bucket -> version] directly
        // through a pair-swapping function rebuilds a MAP keyed by
        // version, silently collapsing every bucket that shares a holding
        // version to ONE surviving entry — vacuum then deleted LIVE
        // bucket directories (caught by ExamplesSpec's opt-out pipeline:
        // a store whose manifest pointed seven buckets at version 0 kept
        // one of them)
        readManifest(spark, root, v).buckets.toSeq
          .map { case (b, ver) => (ver, b) }
      }.toSet
    val orphans = versions.filter(_ > current)
    val droppedOld = readableOld.filterNot(retained.contains)
    orphans.foreach(v => f.delete(new Path(root, s"snapshot=$v"), true))
    // also sweep previously-vacuumed shells for buckets nothing points at
    (droppedOld ++ versions.filter(v =>
        v <= current && !readableOld.contains(v)))
      .filterNot(retained.contains).foreach { v =>
      // drop readability (manifest) and any bucket data nothing points at
      f.delete(manifestPath(root, v), false)
      var remaining = 0
      dirEntries(v).foreach { st =>
        val n = st.getPath.getName
        if (n.startsWith(s"$bucketCol=")) {
          if (!live((v, n.stripPrefix(s"$bucketCol=").toInt)))
            f.delete(st.getPath, true)
          else remaining += 1
        } else
          // a dropped LEGACY version's full-snapshot part files (and stray
          // markers): bare files are never shared across versions — only
          // manifests share buckets — so nothing can reference them once
          // the version is dropped. Without this a migrated pre-manifest
          // store leaks every old version's full-table data forever,
          // still time-travel-readable despite being "vacuumed".
          f.delete(st.getPath, true)
      }
      // `remaining` counts the still-live bucket dirs left behind, so the
      // emptiness check needs no second listing
      if (remaining == 0)
        f.delete(new Path(root, s"snapshot=$v"), true)
    }
    // crashed writers' claims above the committed version (claims <= current
    // are kept: they are what stops a stale writer re-claiming a committed
    // version)
    names.collect { case n if n.startsWith("claim=") => n.stripPrefix("claim=").toLong }
      .filter(_ > current)
      .foreach(v => f.delete(new Path(root, s"claim=$v"), false))
    (droppedOld ++ orphans).sorted
  }

  // --------------------------------------------------------------- compact

  /** Rewrite the live version's FRAGMENTED buckets — bucket directories
    * holding more than `maxFilesPerBucket` parquet files — into one file
    * each, committed as a new snapshot under the same claim + manifest +
    * atomic-pointer protocol as [[upsert]]. Incremental upserts fragment
    * buckets because each merge writes its bucket through the shuffle's
    * partitioning (up to `spark.sql.shuffle.partitions` files per touched
    * bucket per version); a long-lived store degrades into many small
    * files per bucket, which taxes every read's file listing and scan
    * setup. `vacuum` reclaims dead VERSIONS; compact reclaims
    * fragmentation inside the live one.
    *
    * Untouched buckets keep their existing (version, directory) reference
    * in the new manifest — compaction is O(fragmented buckets), not
    * O(table). Readers are never disturbed: they resolve the old pointer
    * (and its intact manifest) until the atomic rename publishes the new
    * version, and time travel to prior versions keeps working until
    * `vacuum` drops them. A crashed compactor leaves an orphan claim +
    * snapshot above the committed pointer — exactly the leftovers
    * `vacuum` already reclaims. Do not run concurrently with a writer
    * (the claim makes the race fail loudly, not silently).
    *
    * Returns the number of buckets rewritten (0 = store already compact —
    * nothing claimed, no version consumed). */
  def compact(spark: SparkSession, root: String,
              maxFilesPerBucket: Int = 1): Int = {
    require(maxFilesPerBucket >= 1, "maxFilesPerBucket must be >= 1")
    val f = fs(spark, root)
    val currentOpt = currentVersion(spark, root)
    if (currentOpt.isEmpty) return 0
    val v = currentOpt.get
    // legacy full-snapshot stores have no manifest; the next upsert
    // migrates them, after which compact applies
    if (!f.exists(manifestPath(root, v))) return 0
    val m = readManifest(spark, root, v)
    // one RECURSIVE listing per referenced snapshot directory instead of a
    // listStatus per bucket: at the documented O(10k)-bucket sizing the
    // per-bucket probe is thousands of serial driver round-trips on every
    // invocation (including no-op ones); grouped listing is O(versions)
    val filesPerBucket: Map[(Long, Int), Int] = m.buckets.values.toSet
      .flatMap { (ver: Long) =>
        val counts = scala.collection.mutable.Map.empty[(Long, Int), Int]
        val it = f.listFiles(new Path(root, s"snapshot=$ver"), true)
        while (it.hasNext) {
          val st = it.next()
          val name = st.getPath.getName
          val dir = st.getPath.getParent.getName
          if (st.isFile && !name.startsWith("_") && !name.startsWith(".") &&
              dir.startsWith(s"$bucketCol=")) {
            val key = (ver, dir.stripPrefix(s"$bucketCol=").toInt)
            counts(key) = counts.getOrElse(key, 0) + 1
          }
        }
        counts
      }.toMap
    val frag = m.buckets.filter { case (b, ver) =>
      filesPerBucket.getOrElse((ver, b), 0) > maxFilesPerBucket
    }.keySet
    if (frag.isEmpty) return 0
    val next = v + 1
    claim(f, root, next)
    // one read per HOLDING VERSION — multi-path, basePath-anchored so the
    // bucket partition column is recovered from the directory names —
    // instead of one relation per fragmented bucket: a long-lived store
    // compacts thousands of buckets at once, and a per-bucket relation
    // chain is thousands of serial driver-side footer/listing reads plus
    // a bucket-count-deep union plan, exactly when compaction is most
    // needed; grouped, the plan is O(referenced versions) legs.
    // repartition on the bucket column sends each bucket to exactly one
    // task, so each rewritten directory holds ONE file
    val union = frag.toSeq.groupBy(b => m.buckets(b)).toSeq.sortBy(_._1)
      .map { case (ver, bs) =>
        spark.read.schema(m.schema)
          .option("basePath", s"$root/snapshot=$ver")
          .parquet(bs.sorted.map(b => bucketPath(root, ver, b)): _*)
      }.reduce(_ unionByName _)
      // the recovered partition column's type follows
      // spark.sql.sources.partitionColumnTypeInference (StringType when
      // disabled); pin it so repartition/partitionBy always see the
      // IntegerType the manifest records, independent of session config
      .withColumn(bucketCol, col(bucketCol).cast("int"))
    // a clustered store's compaction re-sorts each bucket (one bucket per
    // task, so the single rewritten file is FULLY sorted — compaction
    // also repairs the overlapping per-file ranges multi-task upserts
    // leave behind)
    val cluster = clusterColumns(spark, root)
    val arranged =
      if (cluster.isEmpty) union.repartition(col(bucketCol))
      else union.repartition(col(bucketCol))
        .sortWithinPartitions((bucketCol +: cluster).map(col): _*)
    arranged
      .write.mode("overwrite").partitionBy(bucketCol)
      .parquet(s"$root/snapshot=$next")
    writeManifest(f, root, next,
      Manifest(m.schema, m.buckets ++ frag.map(_ -> next)))
    commitPointer(f, root, next)
    frag.size
  }

  /** Full-store rewrite commit: read every bucket of the current version,
    * apply `transform`, and commit the result as a new version in which
    * every bucket is rewritten — [[compact]]'s machinery with a row
    * transform, for maintenance that must change STORED column values
    * (e.g. re-ranking a persisted layout column against a refitted model,
    * [[graft.operators.Layout.zOrderMaintain]]). Versioned like any
    * commit: old versions stay readable, [[vacuum]] applies.
    *
    * Contract on `transform`: schema-preserving (same columns, same
    * types — checked) and bucket-preserving (it must not change
    * discriminant column values — bucket membership is their hash; not
    * checkable without a second shuffle, so it is a stated requirement).
    * The `__bucket` partition column rides through the transform; leave
    * it untouched. Row-DROPPING transforms are legal (delete-shaped
    * maintenance): the committed manifest records only the bucket
    * directories the write actually produced, so an emptied bucket
    * drops out rather than leaving a dangling path. Rows whose
    * transformed values differ WILL appear as updates in the row-level
    * [[changes]] feed across the rewrite — a stored column changed, so
    * that is the truthful feed.
    *
    * Cost: one full read + one full clustered write (the point of a
    * maintenance rewrite); one exchange on the bucket column so each
    * bucket lands fully sorted in one file, like [[compact]]. */
  def rewrite(spark: SparkSession, root: String,
              transform: DataFrame => DataFrame): Long = {
    val f = fs(spark, root)
    val v = currentVersion(spark, root).getOrElse(throw
      new IllegalArgumentException(s"store at $root has no committed version"))
    require(f.exists(manifestPath(root, v)),
      s"store at $root predates the bucketed-manifest format; run one " +
        "upsert to migrate it, then rewrite")
    val m = readManifest(spark, root, v)
    // an emptied-out store (delete() can remove every bucket) has nothing
    // to transform: no-op, no version burn
    if (m.buckets.isEmpty) return v
    val union = m.buckets.toSeq.groupBy(_._2).toSeq.sortBy(_._1)
      .map { case (ver, bs) =>
        spark.read.schema(m.schema)
          .option("basePath", s"$root/snapshot=$ver")
          .parquet(bs.map(_._1).sorted.map(b => bucketPath(root, ver, b)): _*)
      }.reduce(_ unionByName _)
      .withColumn(bucketCol, col(bucketCol).cast("int"))
    val transformed = transform(union)
    require(transformed.columns.sorted.toSeq == union.columns.sorted.toSeq,
      "rewrite transform must preserve the store's columns (got " +
        s"${transformed.columns.mkString(",")}, expected " +
        s"${union.columns.mkString(",")})")
    m.schema.fields.foreach { fld =>
      require(transformed.schema(fld.name).dataType == fld.dataType,
        s"rewrite transform changed the type of '${fld.name}' " +
          s"(${transformed.schema(fld.name).dataType} != ${fld.dataType})")
    }
    val next = v + 1
    claim(f, root, next)
    val cluster = clusterColumns(spark, root)
    val arranged =
      if (cluster.isEmpty) transformed.repartition(col(bucketCol))
      else transformed.repartition(col(bucketCol))
        .sortWithinPartitions((bucketCol +: cluster).map(col): _*)
    arranged
      .write.mode("overwrite").partitionBy(bucketCol)
      .parquet(s"$root/snapshot=$next")
    // manifest from the directories the write ACTUALLY produced — a
    // row-dropping transform (legal: delete-shaped maintenance) can empty
    // a bucket, and a manifest entry pointing at an unwritten directory
    // would make every later read of the store throw on a missing path
    val writtenBuckets = f.listStatus(new Path(root, s"snapshot=$next")).toSeq
      .map(_.getPath.getName)
      .collect { case n if n.startsWith(s"$bucketCol=") =>
        n.stripPrefix(s"$bucketCol=").toInt }
      .toSet
    writeManifest(f, root, next,
      Manifest(m.schema, writtenBuckets.map(_ -> next).toMap))
    commitPointer(f, root, next)
    next
  }

  /** Key-granular removal: commit a new version with every row whose
    * discriminant key appears in `keys` deleted — the right-to-be-
    * forgotten / opt-out primitive a training-data store needs, and the
    * write path that makes the change feed's `delete` classification
    * reachable (until now [[changes]] documented it as "if a removal
    * path is ever added"; this is that path, and whole-bucket removals
    * exercise [[diffBucketIds]]' union diff).
    *
    * Scale shape, mirroring [[upsert]]: the keys hash to their buckets
    * (the same conform-to-stored-types discipline — Murmur3 of an INT is
    * not Murmur3 of a BIGINT), ONLY those buckets are read, anti-joined,
    * and rewritten; untouched buckets keep their manifest location. A
    * 1k-key opt-out against a 100 TB store costs O(touched buckets), not
    * O(table). A bucket whose rows are ALL deleted drops out of the
    * manifest entirely. Deleting keys that match nothing commits
    * nothing and returns 0 (no claim, no version burn).
    *
    * `keys` must carry the recorded discriminant columns; extra columns
    * are ignored. Returns the number of rows removed. Versioned like any
    * commit: time-travel still reads the pre-delete versions until
    * [[vacuum]] reclaims them — an opt-out pipeline that must FORGET the
    * bytes follows the delete with `vacuum(keep = 1)`. */
  def delete(spark: SparkSession, root: String, keys: DataFrame): Long = {
    val f = fs(spark, root)
    val v = currentVersion(spark, root).getOrElse(throw
      new IllegalArgumentException(s"store at $root has no committed version"))
    require(f.exists(manifestPath(root, v)),
      s"store at $root predates the bucketed-manifest format; run one " +
        "upsert to migrate it, then delete")
    val disc = discriminantColumns(spark, root)
    require(disc.nonEmpty,
      s"store at $root has no recorded discriminant (created before the " +
        "property existed) — run one upsert to backfill it, then delete")
    disc.foreach(c => require(keys.columns.contains(c),
      s"keys must carry discriminant column '$c'"))
    val m = readManifest(spark, root, v)
    val buckets = numBuckets(spark, root).getOrElse(DefaultBuckets)
    // conform key types to STORED types before hashing or joining:
    // bucket assignment hashes the stored type, and an unconformed key
    // would probe the wrong bucket and silently delete nothing.
    // Materialized ONCE (eager localCheckpoint — bounded: an opt-out
    // batch is small by design): the key set feeds three separate jobs
    // (touched-bucket collect, semi count, anti rewrite), and a
    // nondeterministic input (limit/sample) re-evaluated per job would
    // desynchronize them — victims outside the first evaluation's
    // touched set would silently survive while nDel counted them.
    val k = disc.foldLeft(keys.select(disc.map(col): _*).distinct()) {
      (d, c) =>
        val stored = m.schema.fields.find(_.name == c).getOrElse(throw
          new IllegalArgumentException(
            s"discriminant '$c' is not a stored column")).dataType
        if (d.schema(c).dataType != stored) d.withColumn(c, col(c).cast(stored))
        else d
    }.localCheckpoint(true)
    val touched = k
      .select(bucketExpr(disc.map(col), buckets).as(bucketCol))
      .distinct().collect().map(_.getInt(0)).toSet
      .intersect(m.buckets.keySet)
    if (touched.isEmpty) return 0L
    val target = readBuckets(spark, root, m, Some(touched))
    val nDel = target.join(k, disc, "left_semi").count()
    if (nDel == 0L) return 0L
    val next = v + 1
    claim(f, root, next)
    val remaining = target.join(k, disc, "left_anti")
      .withColumn(bucketCol, bucketExpr(disc.map(col), buckets))
    val cluster = clusterColumns(spark, root)
    val arranged =
      if (cluster.isEmpty) remaining
      else remaining.sortWithinPartitions((bucketCol +: cluster).map(col): _*)
    arranged
      .write.mode("overwrite").partitionBy(bucketCol)
      .parquet(s"$root/snapshot=$next")
    val writtenBuckets = f.listStatus(new Path(root, s"snapshot=$next")).toSeq
      .map(_.getPath.getName)
      .collect { case n if n.startsWith(s"$bucketCol=") =>
        n.stripPrefix(s"$bucketCol=").toInt }
      .toSet
    // touched buckets that produced no surviving rows are NOT re-added:
    // the manifest forgets them (whole-bucket removal)
    writeManifest(f, root, next,
      Manifest(m.schema,
        m.buckets.view.filterKeys(!touched(_)).toMap ++
          writtenBuckets.map(_ -> next)))
    commitPointer(f, root, next)
    nDel
  }

  // ---------------------------------------------------------------- upsert

  /** Merge `updates` into the store and commit a new snapshot, rewriting
    * ONLY the buckets that contain update keys. Returns the merge result
    * with `target` re-pointed at the COMMITTED snapshot and
    * `written`/`errors` eagerly materialized (localCheckpoint) — a lazy
    * result would re-run the merge against the old snapshot on every
    * action, disagreeing with what was committed (wall-clock stamps) and
    * breaking outright once `vacuum` removes the old version. With the
    * default `current_timestamp()` clock, `written`'s stamps come from its
    * own materialization pass; pass a fixed `cfg.clock` when exact stamp
    * equality between snapshot and written-rows output matters.
    *
    * `nBuckets` applies only when the store is created by this call; an
    * existing store keeps its recorded bucket count. The touched-bucket set
    * is collected to the driver, but it is bounded by `nBuckets`, not by
    * the data.
    *
    * `clusterBy` (creation-time, persisted like `nBuckets`) declares a
    * DATA-LAYOUT clustering: every file any rewrite path writes is sorted
    * by these columns, so parquet's row-group/page min-max statistics
    * turn a pushed range predicate into file skipping instead of a full
    * bucket scan — at 100 TB widths the difference between reading one
    * row group and reading the table (the public `OPTIMIZE ... ZORDER` /
    * `SORTED BY` layout lever, in its single-dimension form). Cost is one
    * LOCAL sort per written partition (no extra exchange — measured in
    * SCALEPROBE `snapshot_cluster`); reads are unchanged and results are
    * row-identical (clustering is physical layout only). A multi-task
    * upsert leaves overlapping ranges across a bucket's files;
    * [[compact]] re-sorts each bucket into one fully-sorted file.
    *
    * BREAK-EVEN (measured, SCALEPROBE `snapshot_cluster`, 5M rows,
    * local[32]): the clustered write costs ~1.6× the unclustered one,
    * and scans pay off only when predicates are SELECTIVE on the
    * cluster column — ~1.6× faster at 1% selectivity, parity at 10%
    * and at full scans. Cluster a store its consumers will slice
    * narrowly and repeatedly; do NOT cluster one that is scanned wide —
    * you pay the write premium on every upsert and win nothing back.
    * (Local page-cached numbers understate the 1%-slice win at
    * storage-bandwidth-bound scale, but the shape — narrow slices pay,
    * wide scans don't — is the decision rule.)
    */
  def upsert(spark: SparkSession, root: String, updates: DataFrame,
             cfg: UpsertConfig = UpsertConfig(),
             nBuckets: Int = DefaultBuckets,
             clusterBy: Seq[String] = Nil): MergeResult = {
    require(nBuckets > 0, "nBuckets must be positive")
    require(clusterBy.forall(c => c.nonEmpty && !c.contains(",")),
      "clusterBy column names must be non-empty and comma-free")
    require(cfg.discriminant.nonEmpty &&
      cfg.discriminant.forall(c => c.nonEmpty && !c.contains(",")),
      "discriminant column names must be non-empty and comma-free")
    val f = fs(spark, root)
    val currentOpt = currentVersion(spark, root)
    val buckets = numBuckets(spark, root).getOrElse(nBuckets)
    // legacy (pre-manifest) committed stores have no manifest: read the
    // full snapshot and rewrite everything once — a one-shot migration to
    // the bucketed layout
    val oldManifest = currentOpt
      .filter(v => f.exists(manifestPath(root, v)))
      .map(readManifest(spark, root, _))

    // Conform the batch to the STORED column types up front (the DB
    // analog: inserting into a typed table coerces values to the columns'
    // types). This is load-bearing twice over: (a) bucket assignment must
    // hash stored types — Murmur3 hash(5: INT) != hash(5L: BIGINT), so an
    // unconformed batch would probe the wrong buckets; (b) the merge's
    // CaseWhen otherwise WIDENS output types (INT target + BIGINT update →
    // BIGINT column), and a widened write would both hash rows into
    // buckets the touched set never read AND silently rewrite the store
    // schema in the new manifest.
    val storedSchema: Option[StructType] = (currentOpt, oldManifest) match {
      case (_, Some(m)) => Some(m.schema)
      case (Some(v), None) => Some(readVersion(spark, root, v).schema) // legacy
      case _ => None
    }
    val u = storedSchema.fold(updates) { sch =>
      updates.columns.foldLeft(updates) { (d, c) =>
        sch.fields.find(_.name == c) match {
          case Some(fld) if fld.dataType != d.schema(c).dataType =>
            d.withColumn(c, col(c).cast(fld.dataType))
          case _ => d
        }
      }
    }
    val touched: Set[Int] = u
      .select(bucketExpr(cfg.discriminant.map(col), buckets).as(bucketCol))
      .distinct()
      .collect().map(_.getInt(0)).toSet

    // merge sees only the touched buckets' rows — the pruned multi-path
    // scan is what makes a small batch O(touched), not O(table)
    val target = (currentOpt, oldManifest) match {
      case (Some(_), Some(m)) => readBuckets(spark, root, m, Some(touched))
      case (Some(v), None) => readVersion(spark, root, v) // legacy: full table
      case (None, _) => spark.createDataFrame(
        spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], u.schema)
    }

    val result = InsertOrUpdate.merge(target, u, cfg)
    // an existing store's recorded clustering wins (creation-time, like
    // nBuckets); validate BEFORE claiming the version so a typo fails
    // without leaving a stale claim behind
    val cluster: Seq[String] =
      if (currentOpt.isDefined) clusterColumns(spark, root) else clusterBy
    // a conflicting layout request on an existing store fails LOUDLY —
    // silently dropping it would hand the caller unclustered (or
    // differently-clustered) files while they believe clusterBy held
    // (same discipline as Layout.zOrderUpsert's model-mismatch check)
    if (currentOpt.isDefined)
      require(clusterBy.isEmpty || clusterBy == cluster,
        s"store at $root records clusterBy=" +
          s"${if (cluster.isEmpty) "(none)" else cluster.mkString(",")} " +
          s"but this upsert requested ${clusterBy.mkString(",")}; the " +
          "recorded creation-time layout wins — re-create the store to " +
          "change it")
    cluster.foreach(c => require(result.target.columns.contains(c),
      s"clusterBy column '$c' is not a stored column"))
    // the discriminant is layout-load-bearing (bucket assignment hashes
    // it): an upsert with a different key set would probe the wrong
    // buckets and silently duplicate keys across buckets, so a mismatch
    // against the recorded creation-time discriminant fails loudly BEFORE
    // claiming (stores created before the property record it on their
    // next upsert instead)
    val recordedDisc = discriminantColumns(spark, root)
    if (currentOpt.isDefined && recordedDisc.nonEmpty)
      require(cfg.discriminant == recordedDisc,
        s"store at $root records discriminant=${recordedDisc.mkString(",")} " +
          s"but this upsert used ${cfg.discriminant.mkString(",")}; the " +
          "recorded creation-time merge key wins — re-create the store to " +
          "change it")
    val next = currentOpt.getOrElse(-1L) + 1L
    claim(f, root, next)

    val withBucket = result.target
      .withColumn(bucketCol, bucketExpr(cfg.discriminant.map(col), buckets))
    val arranged =
      if (cluster.isEmpty) withBucket
      // local sort only — partitionBy splits each task's (bucket, ...)-
      // sorted stream into per-bucket files that stay sorted by the
      // cluster columns; no extra exchange
      else withBucket.sortWithinPartitions((bucketCol +: cluster).map(col): _*)
    arranged
      .write.mode("overwrite").partitionBy(bucketCol)
      .parquet(s"$root/snapshot=$next")
    // manifest: untouched buckets keep their old location; touched buckets
    // point here when they produced data (a touched bucket can end empty
    // when every row in it was a prohibited insert)
    val writtenBuckets = f.listStatus(new Path(root, s"snapshot=$next")).toSeq
      .map(_.getPath.getName)
      .collect { case n if n.startsWith(s"$bucketCol=") =>
        n.stripPrefix(s"$bucketCol=").toInt }
      .toSet
    val newBuckets =
      oldManifest.fold(Map.empty[Int, Long])(_.buckets.view.filterKeys(!touched(_)).toMap) ++
        writtenBuckets.map(_ -> next)
    writeManifest(f, root, next,
      Manifest(result.target.schema, newBuckets))

    // absent for new stores AND legacy stores being migrated; merged so
    // application properties set before the first commit survive. The
    // discriminant backfill also upgrades pre-property stores on their
    // next upsert (their recorded nBuckets is preserved — `buckets`
    // already resolved to it above).
    val existingProps = readProps(f, root)
    if (numBuckets(spark, root).isEmpty ||
        existingProps.get("discriminant").forall(_.trim.isEmpty))
      writeProps(f, root, existingProps +
        ("nBuckets" -> buckets.toString) +
        ("discriminant" -> cfg.discriminant.mkString(",")) ++
        (if (cluster.nonEmpty) Map("clusterBy" -> cluster.mkString(","))
         else Map.empty))
    commitPointer(f, root, next)
    MergeResult(
      target = readVersion(spark, root, next),
      written = result.written.localCheckpoint(true),
      errors = result.errors.localCheckpoint(true))
  }

  /** Create-exclusive claim on `version`: exactly one writer can ever hold
    * it, so concurrent writers serialize instead of overwriting each other.
    *
    * The primitive must be ATOMIC create-if-absent. HDFS's `create(p,
    * overwrite = false)` is; Hadoop's LocalFileSystem merely EMULATES it
    * with a non-atomic exists-then-create, so two same-box writers racing
    * the claim could BOTH pass the check, both "win", and silently
    * double-commit one version (caught by the racing-write-pairs spec).
    * For `file:` filesystems the claim therefore goes through POSIX
    * `O_CREAT|O_EXCL` (NIO `Files.createFile`), the real primitive. */
  private def claim(f: FileSystem, root: String, version: Long): Unit = {
    val p = new Path(root, s"claim=$version")
    def lost(): Nothing = throw new ConcurrentWriteException(
      s"another writer already claimed snapshot $version of $root " +
        s"(claim file $p exists); re-read and retry. If this is a crashed " +
        "writer's leftover above the committed version, vacuum() reclaims it.")
    try {
      if (f.getScheme == "file") {
        val local = java.nio.file.Paths.get(p.toUri.getPath)
        // a first-ever claim can precede the store directory itself
        java.nio.file.Files.createDirectories(local.getParent)
        java.nio.file.Files.createFile(local)
      } else {
        val out = f.create(p, false)
        out.close()
      }
    } catch {
      case _: java.nio.file.FileAlreadyExistsException => lost()
      case _: java.io.IOException if f.exists(p) => lost()
    }
  }

  // the atomic swap is what makes the pointer commit safe: racing readers
  // see the old version or the new, never an absent or torn pointer (the
  // local-FS hazards are documented on atomicReplaceSmallFile — both were
  // observed as reader failures in the racing-writers spec before it)
  private def commitPointer(f: FileSystem, root: String,
                            version: Long): Unit =
    atomicReplaceSmallFile(f, root, pointerName, version.toString)
}
