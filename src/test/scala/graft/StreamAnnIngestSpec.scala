package graft

import scala.collection.mutable.ArrayBuffer

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.operators.Similarity
import graft.streaming.StreamOps

/** Streaming ingest into a persisted ANN index ([[StreamOps.annAppendSink]])
  * — the streaming form of `AnnIngestExample`'s ingest day: standing-model
  * appends per epoch, with the epoch fence that makes at-least-once
  * redelivery a no-op. */
class StreamAnnIngestSpec extends SparkSpec {
  import spark.implicits._

  // deterministic diverse vectors (strictly positive, so no zero-vector
  // exclusions muddy the counts)
  private def vec(i: Long): Seq[Double] =
    Seq.tabulate(8)(d => math.abs(math.sin(i.toDouble * 31 + d)) + 0.1)

  test("streaming ANN ingest: epochs append with the STANDING model, a " +
    "redelivered epoch is fenced to a no-op (same epoch id => already " +
    "recorded => skipped), later epochs land, and probes retrieve the " +
    "streamed rows exactly") {
    implicit val sql = spark.sqlContext
    val path = java.nio.file.Files
      .createTempDirectory("graft_annstream").resolve("index").toString
    val base = (20L to 59L).map(i => (i, vec(i))).toDF("vec_id", "embedding")
    Similarity.ivfPqBuild(base, "embedding", path, nCells = 4, m = 4,
      ksub = 8)
    val batchA = Seq((100L, vec(100)), (101L, vec(101)))
    val epochs = ArrayBuffer[Long]()

    // epoch 0 appends and is recorded
    val mem1 = MemoryStream[(Long, Seq[Double])]
    val q1 = StreamOps.annAppendSink(mem1.toDF.toDF("vec_id", "embedding"),
      "embedding", path, idCol = "vec_id")(epochs += _)
    try { mem1.addData(batchA: _*); q1.processAllAvailable() }
    finally q1.stop()
    spark.read.parquet(s"$path/data").count() shouldBe 42L
    epochs.toSeq shouldBe Seq(0L)

    // crash-redelivery simulation: a fresh (uncheckpointed) query
    // re-delivers the SAME rows as epoch 0 again — the fence skips it
    // whole instead of silently duplicating the vectors
    val mem2 = MemoryStream[(Long, Seq[Double])]
    val q2 = StreamOps.annAppendSink(mem2.toDF.toDF("vec_id", "embedding"),
      "embedding", path, idCol = "vec_id")(epochs += _)
    try {
      mem2.addData(batchA: _*)
      q2.processAllAvailable()
      spark.read.parquet(s"$path/data").count() shouldBe 42L // no dup
      epochs.toSeq shouldBe Seq(0L) // callback not fired for the replay
      // a genuinely NEW epoch (id above the fence) lands normally
      mem2.addData((102L, vec(102)))
      q2.processAllAvailable()
    } finally q2.stop()
    spark.read.parquet(s"$path/data").count() shouldBe 43L
    epochs.toSeq shouldBe Seq(0L, 1L)
    // streamed rows were encoded with the STANDING model: an exhaustive
    // probe retrieves each streamed row at rank 1, cosine exactly 1
    val queries = Seq((100L, vec(100)), (102L, vec(102)))
      .toDF("query_id", "embedding")
    val top = Similarity.ivfPqProbeTopK(spark, path, queries, "embedding",
        "vec_id", "query_id", k = 1, nProbe = 4, shortlistFactor = 64)
      .select("query_id", "vec_id", "cosine")
      .as[(Long, Long, Double)].collect().toSet
    top shouldBe Set((100L, 100L, 1.0), (102L, 102L, 1.0))

    // LINEAGE GUARD: with the fence at 1, a stream restarted against a
    // fresh checkpoint restarts its epoch ids at 0 — batch boundaries no
    // longer correspond to the recorded ones, so the sink must fail
    // LOUDLY instead of silently skipping (losing rows) or appending
    // (duplicating them)
    val memL = MemoryStream[(Long, Seq[Double])]
    val qL = StreamOps.annAppendSink(memL.toDF.toDF("vec_id", "embedding"),
      "embedding", path, idCol = "vec_id")()
    try {
      memL.addData((103L, vec(103)))
      val lex = intercept[org.apache.spark.sql.streaming.StreamingQueryException] {
        qL.processAllAvailable()
      }
      lex.getMessage should include("checkpoint lineage")
    } finally qL.stop()
    spark.read.parquet(s"$path/data").count() shouldBe 43L // untouched

    // a torn/corrupt fence fails loudly with the recovery step named,
    // instead of wedging on a bare NumberFormatException
    java.nio.file.Files.write(
      java.nio.file.Paths.get(path, ".ingest_epoch"),
      "garbage".getBytes("UTF-8"))
    val memC = MemoryStream[(Long, Seq[Double])]
    val qC = StreamOps.annAppendSink(memC.toDF.toDF("vec_id", "embedding"),
      "embedding", path, idCol = "vec_id")()
    try {
      memC.addData((104L, vec(104)))
      val cex = intercept[org.apache.spark.sql.streaming.StreamingQueryException] {
        qC.processAllAvailable()
      }
      cex.getMessage should include("unreadable ingest fence")
    } finally qC.stop()

    // an unbuilt path refuses loudly instead of inventing a layout
    val junk = java.nio.file.Files
      .createTempDirectory("graft_annstream_junk").toString
    val mem3 = MemoryStream[(Long, Seq[Double])]
    val q3 = StreamOps.annAppendSink(mem3.toDF.toDF("vec_id", "embedding"),
      "embedding", junk, idCol = "vec_id")()
    try {
      mem3.addData((1L, vec(1)))
      val ex = intercept[org.apache.spark.sql.streaming.StreamingQueryException] {
        q3.processAllAvailable()
      }
      ex.getMessage should include("no recognized index layout")
    } finally q3.stop()
  }

  test("streaming ANN ingest serves the flat-PQ layout through the same " +
    "sink (layout detected from the relations, pqAppend path)") {
    implicit val sql = spark.sqlContext
    val path = java.nio.file.Files
      .createTempDirectory("graft_annstream_pq").resolve("index").toString
    val base = (20L to 59L).map(i => (i, vec(i))).toDF("vec_id", "embedding")
    Similarity.pqBuild(base, "embedding", "vec_id", path, m = 4, ksub = 8,
      idBuckets = 16)
    val mem = MemoryStream[(Long, Seq[Double])]
    val q = StreamOps.annAppendSink(mem.toDF.toDF("vec_id", "embedding"),
      "embedding", path, idCol = "vec_id")()
    try { mem.addData((200L, vec(200))); q.processAllAvailable() }
    finally q.stop()
    spark.read.parquet(s"$path/vectors").count() shouldBe 41L
    spark.read.parquet(s"$path/codes").count() shouldBe 41L
    // the hidden epoch file never pollutes the drift gauge's file sample
    Similarity.pqDriftStats(spark, path, "embedding").ratio should be >= 0.0

    // plain-IVF leg of the routing matrix (ivfAppend path)
    val ivfPath = java.nio.file.Files
      .createTempDirectory("graft_annstream_ivf").resolve("index").toString
    Similarity.ivfBuild(base, "embedding", ivfPath, nCells = 4)
    val memV = MemoryStream[(Long, Seq[Double])]
    val qV = StreamOps.annAppendSink(memV.toDF.toDF("vec_id", "embedding"),
      "embedding", ivfPath, idCol = "vec_id")()
    try { memV.addData((300L, vec(300))); qV.processAllAvailable() }
    finally qV.stop()
    spark.read.parquet(s"$ivfPath/data").count() shouldBe 41L
  }
}
