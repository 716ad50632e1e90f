package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.core.{JdbcEngine, RunContext, SourceNode}

/** Configuration mirroring the reference `Select` options
  * (`/root/reference/bonobo_sqlalchemy/readers.py:45-49`):
  * `query` (positional, default `'SELECT 1'`), `pack_size=1000`, `limit`.
  *
  * `packSize` maps to the JDBC `fetchsize` (rows per DB round-trip) — the
  * reference's serial LIMIT/OFFSET page loop (`readers.py:59-77`) is replaced
  * by the driver-side cursor batching plus, when partition options are given,
  * fully parallel partitioned reads. `limit` maps to `.limit(n)`, which
  * Catalyst pushes down (`LimitPushDown`).
  *
  * The reference's single-pack pagination bug (`readers.py:55,63` — stops
  * after one page when `limit` is unset; see SURVEY.md §2.1) is NOT
  * reproduced: per the documented intent (`readers.py:9`), reads are
  * exhaustive.
  */
final case class SelectConfig(
    query: String = "SELECT 1",
    packSize: Int = 1000,
    limit: Option[Long] = None,
    /** Divergence from the reference: `readers.py:66` passes
      * `use_labels=True` unconditionally (every SQLAlchemy column comes
      * back `table_column`-qualified), while here labeling is OPT-IN —
      * Spark schemas already qualify ambiguous columns at analysis time,
      * so the default keeps natural names and `useLabels = true`
      * reproduces the reference's wire format when a downstream contract
      * expects it (SURVEY.md §2.1 fine print). */
    useLabels: Boolean = false,
    /** Parallel JDBC read spec: (column, lowerBound, upperBound,
      * numPartitions). Replaces the reference's serial LIMIT/OFFSET page
      * loop (`readers.py:59-77`) with N concurrent range-partitioned
      * cursors — the difference between a single-connection drain and a
      * cluster-wide ingest at 100 TB. */
    partition: Option[JdbcPartitioning] = None)

/** Range partitioning for parallel JDBC scans. */
final case class JdbcPartitioning(
    column: String, lowerBound: Long, upperBound: Long, numPartitions: Int)

/** Where a `Select` runs its SQL. The reference has one backend (a live
  * SQLAlchemy engine); the rebuild splits it so the JDBC path stays
  * compilable while local tests run on the parquet fixtures
  * (SURVEY.md §7.5 "JDBC unavailability in harness").
  */
sealed trait SqlBackend extends Serializable

/** A directory of `<table>.parquet` files exposed as SQL tables. */
final case class ParquetCatalog(dir: String, tables: Seq[String] = Tables.all)
    extends SqlBackend

/** A directory of `<table>.<format>` files in any Spark batch format
  * (csv, json, orc, parquet, ...) exposed as SQL tables. `options` go to
  * the reader (e.g. `header`/`inferSchema` for csv). Prefer parquet/orc
  * for scale — text formats splittable-but-schemaless cost an inference
  * pass and parse CPU on every scan. */
final case class FileCatalog(dir: String, format: String,
    options: Map[String, String] = Map.empty, tables: Seq[String] = Tables.all)
    extends SqlBackend

/** A live JDBC database (the reference's SQLAlchemy engine). */
final case class JdbcBackend(engine: JdbcEngine) extends SqlBackend

/** Spark-native `Select`: executes a user SQL string against a backend.
  *
  * Mirrors `readers.py:51-77`: the query string is sanitized by stripping
  * trailing ``' \n;'`` (`readers.py:52`); schema is resolved at plan time
  * (strictly stronger than the reference's first-row field inference at
  * `readers.py:73-74` — empty results still carry a schema; divergence
  * documented in SURVEY.md §7.4).
  */
final case class Select(
    config: SelectConfig,
    backendService: String = "sql.backend")
    extends SourceNode {

  override def apply(ctx: RunContext): DataFrame =
    Select.run(ctx.spark, ctx.services[SqlBackend](backendService), config)
}

object Select {
  def apply(query: String): Select = Select(SelectConfig(query))
  def apply(query: String, limit: Long): Select =
    Select(SelectConfig(query, limit = Some(limit)))

  /** `query.strip(' \n;')` (`readers.py:52`). */
  def sanitize(query: String): String = {
    val strip = Set(' ', '\n', ';')
    query.dropWhile(strip).reverse.dropWhile(strip).reverse
  }

  def run(spark: SparkSession, backend: SqlBackend, cfg: SelectConfig): DataFrame = {
    val sql = sanitize(cfg.query)
    val df = backend match {
      case ParquetCatalog(dir, tables) =>
        Tables.registerViews(spark, dir, tables)
        spark.sql(sql)
      case FileCatalog(dir, format, options, tables) =>
        Tables.registerViewsAs(spark, dir, format, options, tables)
        spark.sql(sql)
      case JdbcBackend(e) =>
        spark.read
          .format("jdbc")
          .options(e.options)
          .options(jdbcOptions(cfg))
          .load()
    }
    cfg.limit.fold(df) { n =>
      require(n >= 0 && n <= Int.MaxValue,
        s"limit $n out of range [0, ${Int.MaxValue}] (Spark limits are Int)")
      df.limit(n.toInt)
    }
  }

  /** The JDBC option map a [[SelectConfig]] resolves to (unit-testable
    * without a live database). Partitioned reads use `dbtable` with a
    * subquery alias — Spark requires partition options with `dbtable`,
    * not `query`. */
  private[graft] def jdbcOptions(cfg: SelectConfig): Map[String, String] = {
    val sql = sanitize(cfg.query)
    val base = Map("fetchsize" -> cfg.packSize.toString)
    cfg.partition match {
      case None => base + ("query" -> sql)
      case Some(p) => base ++ Map(
        "dbtable" -> s"($sql) graft_select",
        "partitionColumn" -> p.column,
        "lowerBound" -> p.lowerBound.toString,
        "upperBound" -> p.upperBound.toString,
        "numPartitions" -> p.numPartitions.toString)
    }
  }

  /** Labeled projection reproducing `use_labels=True` (`readers.py:66`):
    * every column is renamed `<table>_<column>`. In the reference SQLAlchemy
    * derives the table prefix; here the caller names it (the rebuild cannot
    * reverse-engineer source tables out of arbitrary SQL — divergence noted).
    */
  def labeled(df: DataFrame, table: String): DataFrame =
    df.toDF(df.columns.map(c => s"${table}_$c").toIndexedSeq: _*)
}
