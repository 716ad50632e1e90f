package graft

import org.apache.spark.sql.SparkSession

import graft.core.{Graph, JdbcEngine, Node, ServiceRegistry}
import graft.sinks.JdbcDdl
import graft.sources.{ParquetCatalog, Select}

/** CLI harness, the `bonobo.get_argument_parser()` analog
  * (`/root/reference/examples/select_insert.py:21-23`): run an ad-hoc SQL
  * pipeline against a parquet catalog from the command line.
  *
  * Usage: graft.Main --dir <sfDir> --query '<sql>' [--limit N] [--rows N]
  *
  * Table-management mode, the `examples/commands.py:20-59` analog:
  * `--drop <table>` and/or `--create <table>` (create synthesizes the DDL
  * from the catalog table's parquet schema; drop precedes create, as in
  * the reference's `--drop --create` recreate idiom), `--pk a,b` for the
  * primary key, `--jdbc <url>` for the target database, `--echo true` to
  * print every statement (with no `--jdbc`, statements are always echoed
  * instead of executed — the dry-run form).
  */
object Main {
  def main(args: Array[String]): Unit = {
    val opts = args.sliding(2, 2).collect {
      case Array(k, v) if k.startsWith("--") => k.drop(2) -> v
    }.toMap
    val dir = opts.getOrElse("dir", "/root/testdata/sf0.001")
    val query = opts.getOrElse("query", "SELECT 1")
    val limit = opts.get("limit").map(_.toLong)
    val rows = opts.getOrElse("rows", "20").toInt

    val spark = SparkSession.builder()
      .master(sys.env.getOrElse("SPARK_MASTER", "local[*]"))
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    GraftExtensions.register(spark)
    try {
      if (opts.contains("drop") || opts.contains("create"))
        runDdl(spark, dir, opts.get("drop"), opts.get("create"),
          opts.get("pk").map(_.split(",").map(_.trim).toSeq)
            .getOrElse(Seq.empty),
          opts.get("jdbc"), opts.get("echo").exists(_.toBoolean))
      else {
        val select = limit.fold(Select(query))(n => Select(query, n))
        Graph(select, Node.prettyPrinter(rows))
          .run(spark,
            ServiceRegistry(Map("sql.backend" -> ParquetCatalog(dir))))
          .count()
        ()
      }
    } finally spark.stop()
  }

  /** The `--drop/--create/--echo` table-management engine
    * (`examples/commands.py:20-59`): synthesize DROP and/or CREATE
    * statements (CREATE's schema comes from the catalog's parquet table —
    * the rebuild's analog of the reference's declarative table metadata)
    * and run them through one driver-side JDBC statement each, echoing
    * when asked — or always, when there is no database to run against.
    * `typeFor` is [[graft.sinks.JdbcDdl.createTableSql]]'s dialect seam
    * (Postgres by default; the spec targets embedded Derby through it). */
  private[graft] def runDdl(
      spark: SparkSession, dir: String,
      drop: Option[String], create: Option[String], pk: Seq[String],
      jdbcUrl: Option[String], echo: Boolean,
      typeFor: org.apache.spark.sql.types.DataType => String =
        JdbcDdl.sqlType,
      existenceGuard: Boolean = true,
      out: String => Unit = println): Unit = {
    val stmts =
      drop.toSeq.map(t => JdbcDdl.dropTableSql(t, existenceGuard)) ++
        create.toSeq.map { t =>
          val schema = spark.read.parquet(s"$dir/$t.parquet").schema
          JdbcDdl.createTableSql(t, schema, pk, typeFor, existenceGuard)
        }
    if (echo || jdbcUrl.isEmpty) stmts.foreach(out)
    jdbcUrl.foreach { url =>
      val engine = JdbcEngine(url)
      stmts.foreach(JdbcDdl.execute(engine, _))
    }
  }
}
