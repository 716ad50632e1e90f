package graft.tools

import org.apache.spark.sql.SparkSession

/** Dev loop: run ONE named `SparkEntry.queries` entry against a testdata
  * dir and print its rows — the targeted companion of `graft.Verify`
  * (which runs all of them and writes parquet for the DuckDB gate). Use
  * it to eyeball a new contract query's output at several SFs before
  * wiring floors, without paying for the full suite.
  *
  * Usage: runMain graft.tools.QueryRun <sfDir> <queryName> [numRows|explain]
  * (`explain` prints the formatted physical plan instead of rows — the
  * .explain audit loop for a new contract query.)
  */
object QueryRun {
  def main(args: Array[String]): Unit = {
    require(args.length >= 2,
      "usage: QueryRun <sfDir> <queryName> [numRows|explain]")
    val Array(sfDir, name) = args.take(2)
    val explain = args.lift(2).contains("explain")
    val numRows = args.lift(2).flatMap(_.toIntOption).getOrElse(50)
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}]")
      .config("spark.sql.shuffle.partitions",
        sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"))
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    graft.GraftExtensions.register(spark)
    val fn = graft.SparkEntry.queries.getOrElse(name,
      sys.error(s"unknown query '$name'; known: " +
        graft.SparkEntry.queries.keys.toSeq.sorted.mkString(", ")))
    val df = fn(spark, sfDir)
    if (explain) df.explain("formatted")
    else df.show(numRows, truncate = false)
    spark.stop()
  }
}
