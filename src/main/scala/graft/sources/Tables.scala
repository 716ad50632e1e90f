package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.{col, expr, lit}
import org.apache.spark.sql.types.{LongType, TimestampNTZType, TimestampType}

/** Helpers for the parquet fixture layout (`/root/repo/TESTDATA.md`):
  * one `<name>.parquet` per table under a scale-factor directory.
  */
object Tables {
  /** The harness star schema + LLM-pipeline tables (FIXTURES.md §2). */
  val all: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  def path(dir: String, table: String): String = s"$dir/$table.parquet"

  def load(spark: SparkSession, dir: String, table: String): DataFrame =
    spark.read.parquet(path(dir, table))

  /** Session-scoped relation cache over [[load]] — catalog-metadata
    * caching, the thing a metastore-backed engine gives every query for
    * free. A bare `spark.read.parquet` pays file listing + footer schema
    * inference on EVERY call (measured 60–80 ms warm per call on a
    * single-file local fixture; on an object store it is a remote LIST +
    * GET per table per query), yet the fixture tables are immutable for
    * the life of a session. The cache holds the ANALYZED DataFrame per
    * (session, dir, table) — logical-plan reuse only, no data is pinned
    * (nothing is `.cache()`d). The map is weakly keyed by the session and
    * its values are held through SoftReferences: a Dataset strongly
    * references its SparkSession, so strongly-held values would pin the
    * weak key forever (the entry could never be collected and a stopped
    * session would leak its analyzed plans); softly held, the GC clears
    * entries under memory pressure, unpinning the key, and a cleared
    * entry simply reloads on next access — standard memory-sensitive
    * cache behavior.
    *
    * Use for read-only reference/fixture tables. For a path whose
    * contents change mid-session, use [[load]] — a cached relation
    * snapshots its file listing exactly like any held DataFrame, so a
    * re-`load` (which re-lists) is the refresh mechanism, or call
    * `spark.catalog.refreshByPath` and [[invalidateCached]]. */
  def loadCached(spark: SparkSession, dir: String, table: String): DataFrame = {
    val perSession = relationCache.synchronized {
      var m = relationCache.get(spark)
      if (m == null) {
        m = new java.util.concurrent.ConcurrentHashMap[(String, String),
          java.lang.ref.SoftReference[DataFrame]]()
        relationCache.put(spark, m)
      }
      m
    }
    val key = (dir, table)
    val ref = perSession.get(key)
    val hit = if (ref == null) null else ref.get()
    if (hit != null) hit
    else {
      // racing loaders may both build the relation; benign — identical
      // analyzed plans, last writer wins the cache slot
      val df = load(spark, dir, table)
      perSession.put(key, new java.lang.ref.SoftReference(df))
      df
    }
  }

  /** Drop [[loadCached]] entries for a session (all of them) — pair with
    * `spark.catalog.refreshByPath` when a cached table's files changed. */
  def invalidateCached(spark: SparkSession): Unit =
    relationCache.synchronized { relationCache.remove(spark); () }

  private val relationCache =
    new java.util.WeakHashMap[SparkSession,
      java.util.concurrent.ConcurrentHashMap[(String, String),
        java.lang.ref.SoftReference[DataFrame]]]()

  /** Schema-adaptive event-time decode. The harness regenerates fixtures
    * across parquet timestamp encodings: `timestamp[ns]` surfaces as
    * LongType epoch-nanos under `spark.sql.legacy.parquet.nanosAsLong`;
    * naive `timestamp[us]` surfaces as TIMESTAMP_NTZ; tz-adjusted as
    * TIMESTAMP. All three are normalized to session-zone TimestampType
    * (every graft session pins UTC), so windows, as-of joins and the
    * DuckDB oracle's naive `CAST(ts AS TIMESTAMP)` see identical instants
    * regardless of fixture vintage. Works on streaming DataFrames too —
    * the branch is schema-only. */
  def withEventTimestamp(df: DataFrame, column: String = "ts"): DataFrame =
    df.schema(column).dataType match {
      case LongType =>
        df.withColumn(column, expr(s"timestamp_micros(`$column` div 1000)"))
      case TimestampNTZType => df.withColumn(column, col(column).cast(TimestampType))
      case TimestampType    => df
      case other => throw new IllegalArgumentException(
        s"column `$column` has unsupported event-time type $other " +
          "(expected LongType nanos, TIMESTAMP_NTZ, or TIMESTAMP)")
    }

  /** Format-generalized load: `<dir>/<table>.<format>` through any Spark
    * batch source (parquet, csv, json, orc, ...). Text formats carry no
    * schema — pass `header`/`inferSchema` (csv) or rely on JSON inference
    * for exploration, and pin an explicit `schema` option-free via the
    * returned DataFrame's `.to(schema)` for production reads (inference
    * costs an extra pass over the files and infers loosely at 100 TB). */
  def loadAs(spark: SparkSession, dir: String, table: String, format: String,
             options: Map[String, String] = Map.empty): DataFrame =
    spark.read.format(format).options(options).load(s"$dir/$table.$format")

  /** PERMISSIVE text-format load with a quarantine channel: malformed
    * JSON/CSV records land in the `errors` side (the raw record text +
    * an error tag) instead of failing the scan or silently nulling every
    * field — the SOURCE-side analogue of the sink's errors-as-data
    * contract (reference `errors.py:6-11`, `writers.py:94-95`): one
    * corrupt line in a 100 TB crawl costs one quarantined row, never the
    * job. The caller supplies the EXPECTED `schema` (never inference —
    * inference both costs an extra pass and would widen types to fit the
    * corruption); the corrupt-record column is appended internally and
    * does not leak into `ok`. Both outputs derive from one scan. The
    * `errors` side carries (error tag, raw record text, the partially
    * parsed columns) — the [[graft.core.ErrorChannel]] message+row
    * convention, which also satisfies the engine's restriction that a
    * raw-file query may not reference ONLY the internal corrupt-record
    * column (the usual `.cache()` workaround would be a 100 TB landmine
    * here). */
  def loadWithErrors(spark: SparkSession, path: String, format: String,
                     schema: org.apache.spark.sql.types.StructType,
                     options: Map[String, String] = Map.empty): graft.core.ErrorChannel.Split = {
    quarantineChecks(format, schema)
    quarantineSplit(
      spark.read.format(format)
        .options(options ++ quarantineOptions)
        .schema(schema.add("__corrupt_record", org.apache.spark.sql.types.StringType))
        .load(path),
      format, schema)
  }

  /** [[loadWithErrors]] for Structured Streaming file sources: the same
    * PERMISSIVE parse + quarantine split over `readStream` — a corrupt
    * line in a streamed crawl becomes one quarantined row in the errors
    * stream (route it to its own sink), never a dead query. Both returned
    * streams derive from one source; each started sink runs its own
    * file-source scan of new files, as with any multi-sink stream. */
  def streamWithErrors(spark: SparkSession, path: String, format: String,
                       schema: org.apache.spark.sql.types.StructType,
                       options: Map[String, String] = Map.empty): graft.core.ErrorChannel.Split = {
    quarantineChecks(format, schema)
    quarantineSplit(
      spark.readStream.format(format)
        .options(options ++ quarantineOptions)
        .schema(schema.add("__corrupt_record", org.apache.spark.sql.types.StringType))
        .load(path),
      format, schema)
  }

  private def quarantineChecks(format: String,
                               schema: org.apache.spark.sql.types.StructType): Unit = {
    require(format == "json" || format == "csv",
      s"corrupt-record quarantine applies to text formats (json, csv), got $format")
    require(!schema.fieldNames.contains("__corrupt_record"),
      "schema must not already contain __corrupt_record")
  }

  private val quarantineOptions = Map(
    "mode" -> "PERMISSIVE",
    "columnNameOfCorruptRecord" -> "__corrupt_record")

  private def quarantineSplit(df: DataFrame, format: String,
                              schema: org.apache.spark.sql.types.StructType): graft.core.ErrorChannel.Split =
    graft.core.ErrorChannel.Split(
      ok = df.filter(col("__corrupt_record").isNull).drop("__corrupt_record"),
      errors = df.filter(col("__corrupt_record").isNotNull)
        .select(lit(s"malformed $format record").as("error") +:
          col("__corrupt_record").as("raw") +:
          schema.fieldNames.toIndexedSeq.map(col): _*))

  /** Typed load: the `Dataset[T]` face of a table for statically-typed
    * chains (SURVEY.md §1.3 — case classes where the chain is statically
    * typed, DataFrame otherwise). Columns are matched by name. */
  def typed[T: org.apache.spark.sql.Encoder](
      spark: SparkSession, dir: String, table: String): org.apache.spark.sql.Dataset[T] =
    load(spark, dir, table).as[T]

  /** Register each existing table as a temp view so `spark.sql` queries see
    * the same names the DuckDB oracle does. Idempotent. Existence goes
    * through the Hadoop FileSystem of the path, so s3a://, hdfs:// and
    * local paths all behave the same (a bare java.io.File check would be
    * local-only). */
  def registerViews(spark: SparkSession, dir: String,
                    tables: Seq[String] = all): Unit = {
    // old-vintage events.parquet carries timestamp[ns]; without this flag
    // the schema read throws PARQUET_TYPE_ILLEGAL in sessions that didn't
    // set it (harmless when the fixture is already timestamp[us])
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    tables.foreach { t =>
      val p = new org.apache.hadoop.fs.Path(path(dir, t))
      val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
      // loadCached: re-registering the catalog for every Select would
      // otherwise pay listing + schema inference for all ten tables per
      // query (the view registration itself is a cheap name binding)
      if (fs.exists(p))
        loadCached(spark, dir, t).createOrReplaceTempView(t)
    }
  }

  /** [[registerViews]] for any batch file format: registers each existing
    * `<dir>/<table>.<format>` as a temp view. Same existence semantics
    * (Hadoop FileSystem — s3a://, hdfs://, local all behave the same). */
  def registerViewsAs(spark: SparkSession, dir: String, format: String,
                      options: Map[String, String] = Map.empty,
                      tables: Seq[String] = all): Unit =
    tables.foreach { t =>
      val p = new org.apache.hadoop.fs.Path(s"$dir/$t.$format")
      val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
      if (fs.exists(p))
        spark.read.format(format).options(options).load(p.toString)
          .createOrReplaceTempView(t)
    }
}
