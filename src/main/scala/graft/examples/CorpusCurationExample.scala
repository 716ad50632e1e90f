package graft.examples

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.core.{Graph, Node, RunContext, ServiceRegistry}
import graft.operators.{Dedup, Packing, Selection}
import graft.sinks.{SnapshotStore, UpsertConfig}
import graft.sources.{ParquetCatalog, Select}
import graft.functions.{TextFunctions => T}

/** The training-corpus curation pipeline as a Graph — the shape the LLM
  * extension exists for, run end to end through the same kernel as the
  * reference's select→insert example:
  *
  *   Select(documents) → quality + repetition filters → exact dedup →
  *   near-dup cluster drop → decontaminate vs the eval set → split
  *   assignment → per-language token-budget fill → SnapshotStore upsert
  *   (durable, versioned).
  *
  * Re-running converges (the merge is idempotent on doc_id, the at-least-
  * once contract), and each run commits a new time-travelable version.
  * Every stage here is the oracle-checked operator behind a contract query
  * (`corpus_dedup`, `decontaminate`, `corpus_split`, `budget_select`,
  * `text_repetition`) — this file just composes them the way a user would.
  */
object CorpusCurationExample {

  /** The curation chain as reusable nodes (also driven by the spec).
    * `evalSet` holds benchmark documents that must not leak into training
    * (nor near-copies of them); `tokenBudget` caps tokens per language. */
  def curate(docs: DataFrame, evalSet: Option[DataFrame] = None,
             tokenBudget: Long = 0L): DataFrame = {
    val kept = docs
      .withColumn("quality", T.qualityScore(col("text")))
      .filter(col("quality") >= 0.5)
      .filter(T.tokenRepetition(col("text")) <= 0.8) // degenerate-text gate
    val exact = Dedup.exactByFingerprint(kept, "text", "doc_id")
    val pairs = Dedup.ngramJaccardPairs(exact, "text", "doc_id",
      shingleSize = 3, threshold = 0.1)
    val deduped = Dedup.dropNearDuplicates(exact, "doc_id", pairs)
    val clean = evalSet.fold(deduped)(ev =>
      Dedup.decontaminate(deduped, ev, "text", "doc_id", shingleSize = 5))
    val labeled = clean
      .withColumn("split", T.stableSplit(col("doc_id"), 0.9))
      .withColumn("lang_id", T.langId(col("text")))
      .withColumn("n_tokens", T.tokenCount(col("text")).cast("long"))
    val selected =
      if (tokenBudget <= 0L) labeled
      else Selection.tokenBudgetPerStratum(labeled, "lang_id", "n_tokens",
        tokenBudget, rankBy = Seq(col("quality").desc, col("doc_id")))
        .drop("cum_tokens")
    selected.select("doc_id", "lang_id", "quality", "split", "text")
  }

  /** Batch prep on top of [[curate]]'s output: chunk long documents to the
    * context size (sliding windows, 1/8 overlap), then next-fit-pack the
    * chunks into `contextTokens`-capacity training sequences — each output
    * row is a chunk with its (shard, seq) bin assignment, ready for a
    * tokenizer to concatenate per bin. Both stages are the oracle-checked
    * operators behind `chunk_docs` and `pack_sequences`. */
  def prepareBatches(curated: DataFrame, contextTokens: Int = 2048,
                     shards: Int = 64): DataFrame = {
    // both packSequences' walk and the payload join read the chunk
    // relation — persist it so the tokenize+slice projection over the
    // curated corpus runs once, not per consumer
    val chunks = Packing.chunkDocuments(curated, "text", "doc_id",
        chunkTokens = contextTokens, overlap = contextTokens / 8)
      .withColumn("chunk_id",
        concat_ws(":", col("doc_id"), col("chunk")))
      .withColumn("shard", pmod(xxhash64(col("chunk_id")), lit(shards)).cast("int"))
      .persist()
    val packed = Packing.packSequences(chunks, "chunk_id", "n_tokens",
        capacity = contextTokens, shardCol = "shard")
      .join(chunks.drop("shard"), Seq("chunk_id"))
      .select("chunk_id", "doc_id", "chunk", "chunk_text", "n_tokens",
        "shard", "seq")
    graft.core.CacheAutoRelease.afterFirstUse(chunks)
    packed
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
        // two actions below — cache the packed result so the pipeline
        // (curation scan included) doesn't re-execute per action
        val packed = prepareBatches(t.filter(col("split") === "train"),
          contextTokens = 512, shards = 8).persist()
        val bins = packed.select("shard", "seq").distinct().count()
        println(s"packed ${packed.count()} chunks into $bins sequences " +
          "(512-token capacity)")
        packed.unpersist()
      }
    } finally spark.stop()
  }
}
