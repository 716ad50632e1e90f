package graft

import org.apache.spark.sql.functions._

import graft.sinks.{SnapshotStore, UpsertConfig}

class SnapshotStoreSpec extends SparkSpec {
  import spark.implicits._

  private val cfg = UpsertConfig(
    clock = Some(to_timestamp(lit("2026-01-01 00:00:00"))))

  test("empty store -> first upsert creates snapshot 0; merges accumulate; " +
    "re-applying a batch converges (at-least-once contract)") {
    val root = java.nio.file.Files.createTempDirectory("graft_snap").toString
    SnapshotStore.read(spark, root) shouldBe None

    val r0 = SnapshotStore.upsert(spark, root,
      Seq((1, "a"), (2, "b")).toDF("id", "value"), cfg)
    r0.written.count() shouldBe 2
    SnapshotStore.currentVersion(spark, root) shouldBe Some(0L)

    SnapshotStore.upsert(spark, root,
      Seq((2, "b2"), (3, "c")).toDF("id", "value"), cfg)
    SnapshotStore.currentVersion(spark, root) shouldBe Some(1L)
    val after = SnapshotStore.read(spark, root).get.orderBy("id")
      .collect().map(r => (r.getInt(0), r.getString(1)))
    after shouldBe Array((1, "a"), (2, "b2"), (3, "c"))

    // idempotence: replay the same batch -> same content, new version
    SnapshotStore.upsert(spark, root,
      Seq((2, "b2"), (3, "c")).toDF("id", "value"), cfg)
    val replayed = SnapshotStore.read(spark, root).get.orderBy("id")
      .collect().map(r => (r.getInt(0), r.getString(1)))
    replayed shouldBe after
    SnapshotStore.currentVersion(spark, root) shouldBe Some(2L)
  }

  test("time travel + vacuum: old versions readable until vacuumed, " +
    "committed version never removed") {
    val root = java.nio.file.Files.createTempDirectory("graft_snap3").toString
    SnapshotStore.upsert(spark, root, Seq((1, "a")).toDF("id", "value"), cfg)
    SnapshotStore.upsert(spark, root, Seq((1, "a2")).toDF("id", "value"), cfg)
    SnapshotStore.upsert(spark, root, Seq((2, "b")).toDF("id", "value"), cfg)
    SnapshotStore.readVersion(spark, root, 0).count() shouldBe 1
    SnapshotStore.vacuum(spark, root, keep = 1) shouldBe Seq(0L, 1L)
    SnapshotStore.currentVersion(spark, root) shouldBe Some(2L)
    SnapshotStore.read(spark, root).get.count() shouldBe 2
  }

  test("streaming foreachBatch upsert persists each epoch durably") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx = spark.sqlContext
    val root = java.nio.file.Files.createTempDirectory("graft_snap4").toString
    val mem = MemoryStream[(Int, String)]
    val q = graft.streaming.StreamOps.upsertSink(
      mem.toDF().toDF("id", "value")) { (batch, _) =>
        SnapshotStore.upsert(spark, root, batch, cfg); ()
      }
    try {
      mem.addData((1, "a"), (2, "b"))
      q.processAllAvailable()
      mem.addData((2, "b2"))
      q.processAllAvailable()
      SnapshotStore.read(spark, root).get.orderBy("id")
        .collect().map(r => (r.getInt(0), r.getString(1))) shouldBe
        Array((1, "a"), (2, "b2"))
    } finally q.stop()
  }

  test("reader never sees an uncommitted snapshot (orphan directories are inert)") {
    val root = java.nio.file.Files.createTempDirectory("graft_snap2").toString
    SnapshotStore.upsert(spark, root, Seq((1, "a")).toDF("id", "value"), cfg)
    // simulate a crashed writer: snapshot dir exists, pointer not moved
    Seq((99, "zz")).toDF("id", "value")
      .write.parquet(s"$root/snapshot=7")
    SnapshotStore.currentVersion(spark, root) shouldBe Some(0L)
    SnapshotStore.read(spark, root).get.count() shouldBe 1
    // vacuum reclaims the crashed writer's orphan, keeps the committed one
    SnapshotStore.vacuum(spark, root, keep = 1) shouldBe Seq(7L)
    SnapshotStore.read(spark, root).get.count() shouldBe 1
  }

  test("written/errors outputs survive vacuum (eagerly materialized)") {
    val root = java.nio.file.Files.createTempDirectory("graft_snap5").toString
    SnapshotStore.upsert(spark, root, Seq((1, "a")).toDF("id", "value"), cfg)
    val r = SnapshotStore.upsert(spark, root,
      Seq((1, "a2")).toDF("id", "value"), cfg)
    SnapshotStore.vacuum(spark, root, keep = 1)
    // lineage to the pre-merge snapshot is gone; materialized results live on
    r.written.count() shouldBe 1
    r.errors.count() shouldBe 0
  }
}
