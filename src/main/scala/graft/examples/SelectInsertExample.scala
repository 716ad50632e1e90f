package graft.examples

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.core.{Graph, Node, ServiceRegistry}
import graft.sinks.{SnapshotStore, UpsertConfig}
import graft.sources.{ParquetCatalog, Select}

/** The reference's flagship example re-expressed on Spark
  * (`/root/reference/examples/select_insert.py`: Graph(Select(...),
  * InsertOrUpdate(...)) — read a table with SQL, upsert into another,
  * print what was written). The "database" here is a [[SnapshotStore]]
  * directory; pass a different `--store` to keep state across runs.
  */
object SelectInsertExample {
  def main(args: Array[String]): Unit = {
    val opts = args.sliding(2, 2).collect {
      case Array(k, v) if k.startsWith("--") => k.drop(2) -> v
    }.toMap
    val dir = opts.getOrElse("dir", "/root/testdata/sf0.001")
    val store = opts.getOrElse("store",
      java.nio.file.Files.createTempDirectory("graft_example").toString)

    val spark = SparkSession.builder()
      .master(sys.env.getOrElse("SPARK_MASTER", "local[*]"))
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    try {
      // Select(...) -> transform -> InsertOrUpdate(...), one action.
      val extracted = Graph(
        Select("SELECT n_nationkey AS id, n_name AS value FROM nation"),
        Node.prettyPrinter(5))
        .run(spark, ServiceRegistry(Map("sql.backend" -> ParquetCatalog(dir))))
      val result = SnapshotStore.upsert(spark, store,
        extracted.withColumn("value", lower(col("value"))),
        UpsertConfig(discriminant = Seq("id")))
      println(s"written=${result.written.count()} errors=${result.errors.count()}")
      println(s"store=$store version=${SnapshotStore.currentVersion(spark, store)}")
      SnapshotStore.read(spark, store).foreach(_.orderBy("id").show(5))
    } finally spark.stop()
  }
}
