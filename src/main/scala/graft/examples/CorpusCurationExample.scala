package graft.examples

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.core.{Graph, Node, RunContext, ServiceRegistry}
import graft.operators.Dedup
import graft.sinks.{SnapshotStore, UpsertConfig}
import graft.sources.{ParquetCatalog, Select}
import graft.functions.{TextFunctions => T}

/** The training-corpus curation pipeline as a Graph — the shape the LLM
  * extension exists for, run end to end through the same kernel as the
  * reference's select→insert example:
  *
  *   Select(documents) → quality filter → exact dedup → near-dup cluster
  *   drop → split assignment → SnapshotStore upsert (durable, versioned).
  *
  * Re-running converges (the merge is idempotent on doc_id, the at-least-
  * once contract), and each run commits a new time-travelable version.
  * Every stage here is the oracle-checked operator behind a contract query
  * (`corpus_dedup`, `corpus_split`) — this file just composes them the way
  * a user would.
  */
object CorpusCurationExample {

  /** The curation chain as reusable nodes (also driven by the spec). */
  def curate(docs: DataFrame): DataFrame = {
    val kept = docs
      .withColumn("quality", T.qualityScore(col("text")))
      .filter(col("quality") >= 0.5)
    val exact = Dedup.exactByFingerprint(kept, "text", "doc_id")
    val pairs = Dedup.ngramJaccardPairs(exact, "text", "doc_id",
      shingleSize = 3, threshold = 0.1)
    Dedup.dropNearDuplicates(exact, "doc_id", pairs)
      .withColumn("split", T.stableSplit(col("doc_id"), 0.9))
      .withColumn("lang_id", T.langId(col("text")))
      .select("doc_id", "lang_id", "quality", "split", "text")
  }

  def main(args: Array[String]): Unit = {
    val opts = args.sliding(2, 2).collect {
      case Array(k, v) if k.startsWith("--") => k.drop(2) -> v
    }.toMap
    val dir = opts.getOrElse("dir", "/root/testdata/sf0.001")
    val store = opts.getOrElse("store",
      java.nio.file.Files.createTempDirectory("graft_corpus").toString)

    val spark = SparkSession.builder()
      .master(sys.env.getOrElse("SPARK_MASTER", "local[*]"))
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    try {
      val curated = Graph(
        Select("SELECT doc_id, text FROM documents"),
        new Node { def apply(in: DataFrame, ctx: RunContext) = curate(in) })
        .run(spark, ServiceRegistry(Map("sql.backend" -> ParquetCatalog(dir))))
      val result = SnapshotStore.upsert(spark, store, curated,
        UpsertConfig(discriminant = Seq("doc_id")))
      println(s"curated=${result.written.count()} errors=${result.errors.count()}")
      println(s"store=$store version=${SnapshotStore.currentVersion(spark, store)}")
      SnapshotStore.read(spark, store).foreach { t =>
        t.groupBy("lang_id", "split").count()
          .orderBy("lang_id", "split").show()
      }
    } finally spark.stop()
  }
}
