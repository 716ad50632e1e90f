package graft

import org.apache.spark.sql.SparkSession

import graft.core.{Graph, Node, ServiceRegistry}
import graft.sources.{ParquetCatalog, Select}

/** CLI harness, the `bonobo.get_argument_parser()` analog
  * (`/root/reference/examples/select_insert.py:21-23`): run an ad-hoc SQL
  * pipeline against a parquet catalog from the command line.
  *
  * Usage: graft.Main --dir <sfDir> --query '<sql>' [--limit N] [--rows N]
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
      val select = limit.fold(Select(query))(n => Select(query, n))
      Graph(select, Node.prettyPrinter(rows))
        .run(spark, ServiceRegistry(Map("sql.backend" -> ParquetCatalog(dir))))
        .count()
      ()
    } finally spark.stop()
  }
}
