package graft.examples

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.operators.Dedup

/** The incremental-ingest loop with standing LSH state — how a crawl
  * pipeline runs near-dedup at 100 TB without ever re-pairing the corpus:
  * the retained corpus's MinHash band keys live in a persisted key table;
  * each arriving batch is deduplicated against those keys (plus within
  * itself), and the survivors are appended to BOTH the corpus and the key
  * table. Per-batch cost is one scan of the batch, one key join, and a
  * candidate-only verification read of the corpus — |batch|-proportional,
  * measured in SCALEPROBE `incremental_dedup_scale`. The batch analogue of
  * the streaming `StreamOps.dedupeNearAgainstStore`; the dedup decision
  * itself is the oracle-checked operator behind the `incremental_dedup`
  * and `incremental_ingest` contract queries.
  */
object IncrementalIngestExample {

  /** One ingest step against the standing state under `root` (parquet
    * `corpus/` + `band_keys/`): dedup `batch`, append survivors to both,
    * return the survivors. The first call bootstraps empty state. The
    * banding parameters are part of the standing state's contract — they
    * must not change between calls (re-run [[Dedup.minHashBandKeys]] over
    * the corpus to migrate). */
  def ingest(spark: SparkSession, batch: DataFrame, root: String,
             threshold: Double = 0.9, shingleSize: Int = 3,
             numHashes: Int = 64, bands: Int = 16): DataFrame = {
    val corpusPath = s"$root/corpus"
    val keysPath = s"$root/band_keys"
    def exists(p: String): Boolean = {
      val hp = new org.apache.hadoop.fs.Path(p)
      hp.getFileSystem(spark.sparkContext.hadoopConfiguration).exists(hp)
    }
    val old =
      if (exists(corpusPath)) spark.read.parquet(corpusPath)
      else batch.limit(0)
    val oldKeys =
      if (exists(keysPath)) Some(spark.read.parquet(keysPath)) else None
    val pairs = Dedup.minHashLshAgainst(batch, old, "text", "doc_id",
      shingleSize = shingleSize, numHashes = numHashes, bands = bands,
      threshold = threshold, oldKeys = oldKeys)
    val doomed = pairs.filter(!col("other_is_new"))
      .select(col("id_new").as("doc_id"))
      .unionByName(pairs.filter(col("other_is_new"))
        .select(col("id_other").as("doc_id")))
      .distinct()
    // The dedup decision must be MATERIALIZED before the state it reads is
    // mutated: appending to corpusPath refreshes that path and invalidates
    // any cached plan referencing it, so a lazily-recomputed `survivors`
    // would re-read the corpus WITH the batch already appended and doom
    // every survivor against its own copy. An eager localCheckpoint cuts
    // the lineage (a persist alone is dropped by the refresh). At cluster
    // scale, land survivors to their own immutable path first and append
    // from there — same principle, durable form.
    val survivors = batch.join(doomed, Seq("doc_id"), "left_anti")
      .localCheckpoint(true)
    survivors.write.mode("append").parquet(corpusPath)
    Dedup.minHashBandKeys(survivors, "text", "doc_id",
        shingleSize = shingleSize, numHashes = numHashes, bands = bands)
      .write.mode("append").parquet(keysPath)
    survivors
  }

  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.001")
    val root = java.nio.file.Files.createTempDirectory("graft_ingest").toString
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val docs = spark.read.parquet(s"$dir/documents.parquet")
      .select("doc_id", "text")
    // two arriving slices; the second half-overlaps the first
    val b1 = docs.filter(col("doc_id") % 2 === 0)
    val b2 = docs.filter(col("doc_id") % 4 < 2) // evens overlap b1
    val s1 = ingest(spark, b1, root).count()
    val s2 = ingest(spark, b2, root).count()
    println(s"INGEST batch1_survivors=$s1 batch2_survivors=$s2 root=$root")
    spark.stop()
  }
}
