package graft

import org.apache.spark.sql.functions._

import graft.core.{Operation, ProhibitedOperationError}
import graft.sinks.{InsertOrUpdate, JdbcUpsert, UpsertConfig}

class InsertOrUpdateSpec extends SparkSpec {
  import spark.implicits._

  private val clock = Some(to_timestamp(lit("2026-01-01 00:00:00")))
  private def cfg = UpsertConfig(clock = clock)

  /** The reference's golden integration scenario
    * (`tests/test_integration.py:171-188`): 10 generated rows
    * (i, "value for i") upserted into an empty table, read back, and
    * compared for exact equality. */
  test("golden round-trip: generator -> InsertOrUpdate -> Select") {
    val generated = (0 until 10).map(i => (i, s"value for $i"))
    val target = Seq.empty[(Int, String)].toDF("id", "value")
    val merged =
      InsertOrUpdate.merge(target, generated.toDF("id", "value"), cfg)
    val got = merged.target.orderBy("id")
      .collect().map(r => (r.getInt(0), r.getString(1)))
    got.toSeq shouldBe generated
    // written rows re-emitted downstream (writers.py:70-73)
    merged.written.count() shouldBe 10
    merged.errors.count() shouldBe 0
  }

  /** The reference's scenario 3 (`tests/test_integration.py:190-207`):
    * table_1 -> Select -> InsertOrUpdate(table_2) -> Select, golden compare —
    * reproduced at the file level (parquet snapshots stand in for tables). */
  test("golden DB->DB copy round-trip through parquet snapshots") {
    val tmp = java.nio.file.Files.createTempDirectory("graft_rt").toString
    val generated = (0 until 10).map(i => (i, s"value for $i"))
    // write table_1
    InsertOrUpdate.merge(Seq.empty[(Int, String)].toDF("id", "value"),
        generated.toDF("id", "value"), cfg)
      .target.write.parquet(s"$tmp/table_1")
    // copy table_1 -> table_2 via read + merge
    val t1 = spark.read.parquet(s"$tmp/table_1")
    InsertOrUpdate.merge(Seq.empty[(Int, String)].toDF("id", "value"), t1, cfg)
      .target.write.parquet(s"$tmp/table_2")
    val got = spark.read.parquet(s"$tmp/table_2").orderBy("id")
      .collect().map(r => (r.getInt(0), r.getString(1)))
    got.toSeq shouldBe generated
  }

  test("NULL discriminant never matches (reference '=' probe semantics, " +
    "writers.py:161-165): a NULL-key update inserts; a NULL-key target row " +
    "is never updated") {
    val target = Seq((Some(1), "t1"), (None, "t-null"))
      .toDF("id", "value")
    val updates = Seq((Some(1), "u1"), (None, "u-null"))
      .toDF("id", "value")
    val out = InsertOrUpdate.merge(target, updates, cfg).target
      .select("id", "value").collect()
      .map(r => (if (r.isNullAt(0)) None else Some(r.getInt(0)), r.getString(1)))
    // key 1 updated; target NULL row untouched; update NULL row inserted
    out should contain theSameElementsAs Seq(
      (Some(1), "u1"), (None, "t-null"), (None, "u-null"))
  }

  test("upsert is idempotent: applying the same batch twice == once") {
    val target = Seq((1, "old"), (2, "old")).toDF("id", "value")
    val updates = Seq((2, "new"), (3, "new")).toDF("id", "value")
    val once = InsertOrUpdate.merge(target, updates, cfg).target
    val twice = InsertOrUpdate.merge(once, updates, cfg).target
    twice.orderBy("id").collect().map(r => (r.getInt(0), r.getString(1))) shouldBe
      Array((1, "old"), (2, "new"), (3, "new"))
    once.except(twice).count() shouldBe 0
    twice.except(once).count() shouldBe 0
  }

  test("column rules: intersection projection, insert-only fields, defaults " +
    "(writers.py:167-176)") {
    val target = Seq((1, "v1", "locked1", 100)).toDF("id", "value", "ins_only", "keep")
    // update has an extra column (dropped) and misses 'keep' (left as-is)
    val updates = Seq((1, "v2", "locked2", "extra"), (2, "v2", "locked2", "extra"))
      .toDF("id", "value", "ins_only", "extra_col")
    val out = InsertOrUpdate
      .merge(target, updates, cfg.copy(insertOnlyFields = Set("ins_only")))
      .target.orderBy("id").collect()
    out.map(_.getString(1)) shouldBe Array("v2", "v2")
    // update branch must NOT touch ins_only; insert branch writes it
    out(0).getString(2) shouldBe "locked1"
    out(1).getString(2) shouldBe "locked2"
    // missing column: kept on update, null on insert (DB-default analog)
    out(0).getInt(3) shouldBe 100
    assert(out(1).isNullAt(3))
    out.head.schema.fieldNames should not contain "extra_col"
  }

  test("created_at/updated_at stamping (writers.py:105-111,128-129)") {
    val t0 = java.sql.Timestamp.valueOf("2020-06-15 00:00:00")
    val target = Seq((1, "old", t0, t0)).toDF("id", "value", "created_at", "updated_at")
    val updates = Seq((1, "upd"), (2, "ins")).toDF("id", "value")
    val out = InsertOrUpdate.merge(target, updates, cfg)
      .target.orderBy("id").collect()
    val stamp = java.sql.Timestamp.valueOf("2026-01-01 00:00:00")
    out(0).getTimestamp(2) shouldBe t0     // created_at preserved on update
    out(0).getTimestamp(3) shouldBe stamp  // updated_at stamped on update
    out(1).getTimestamp(2) shouldBe stamp  // both stamped on insert
    out(1).getTimestamp(3) shouldBe stamp
  }

  test("operation gating routes prohibited rows to the error channel " +
    "(writers.py:115-116,125-126 + errors-as-data writers.py:94-95)") {
    val target = Seq((1, "old")).toDF("id", "value")
    val updates = Seq((1, "upd"), (2, "ins")).toDF("id", "value")

    val insOnly = InsertOrUpdate.merge(target, updates,
      cfg.copy(allowedOperations = Set(Operation.Insert)))
    insOnly.target.orderBy("id").collect().map(_.getString(1)) shouldBe
      Array("old", "ins")
    insOnly.errors.select("error").head().getString(0) should include("UPDATE")

    val updOnly = InsertOrUpdate.merge(target, updates,
      cfg.copy(allowedOperations = Set(Operation.Update)))
    updOnly.target.collect().map(_.getString(1)) shouldBe Array("upd")
    updOnly.errors.select("error").head().getString(0) should include("INSERT")
  }

  test("strict mode throws ProhibitedOperationError (errors.py:6-7)") {
    val target = Seq((1, "old")).toDF("id", "value")
    val updates = Seq((1, "upd")).toDF("id", "value")
    intercept[ProhibitedOperationError] {
      InsertOrUpdate.merge(target, updates,
        cfg.copy(allowedOperations = Set(Operation.Insert), errorsAsData = false))
    }
    intercept[ProhibitedOperationError] {
      InsertOrUpdate.merge(target, updates,
        cfg.copy(allowedOperations = Set.empty, errorsAsData = false))
    }
  }

  test("fetch_columns maps {row-alias -> db-column} (dict intent, " +
    "writers.py:156,178-185; broken re-find writers.py:152 fixed by design)") {
    val target = Seq((1, "old", 99)).toDF("id", "value", "db_serial")
    val updates = Seq((1, "upd")).toDF("id", "value")
    val written = InsertOrUpdate.merge(target, updates,
      cfg.copy(fetchColumns = Map("serial_alias" -> "db_serial"))).written
    written.select("serial_alias").head().getInt(0) shouldBe 99
  }

  test("JDBC upsert SQL honors allowed operations (Postgres ON CONFLICT)") {
    val c = UpsertConfig(discriminant = Seq("id"),
      insertOnlyFields = Set("created_at"))
    val cols = Seq("id", "value", "created_at")
    val (both, _) = JdbcUpsert.upsertSql("t", cols, c, canInsert = true, canUpdate = true)
    both should include("ON CONFLICT (\"id\") DO UPDATE SET")
    both should include("\"value\" = EXCLUDED.\"value\"")
    (both should not).include("\"created_at\" = EXCLUDED")
    val (insOnly, _) = JdbcUpsert.upsertSql("t", cols, c, canInsert = true, canUpdate = false)
    insOnly should endWith("DO NOTHING")
    val (updOnly, bindOrder) = JdbcUpsert.upsertSql("t", cols, c, canInsert = false, canUpdate = true)
    updOnly should startWith("UPDATE")
    // created_at is never in a SET clause: insert-only by contract
    // (writers.py:128-129) even without listing it in insertOnlyFields
    bindOrder shouldBe Seq("value", "id")
    val (noUpd, _) = JdbcUpsert.upsertSql("t", Seq("id", "created_at"),
      c, canInsert = true, canUpdate = true)
    noUpd should endWith("DO NOTHING") // empty SET degrades, not malformed SQL
    intercept[IllegalArgumentException] {
      JdbcUpsert.upsertSql("t", Seq("id", "created_at"), c,
        canInsert = false, canUpdate = true)
    }
  }

  test("ANSI MERGE dialect synthesizes one-statement upserts and maps " +
    "operation gating to WHEN-clause presence") {
    import graft.sinks.AnsiMergeUpsertDialect
    val c = UpsertConfig(discriminant = Seq("id"),
      insertOnlyFields = Set("created_at"))
    val cols = Seq("id", "value", "created_at")
    val (both, bind) = AnsiMergeUpsertDialect.upsertSql("t", cols, c,
      canInsert = true, canUpdate = true)
    both should startWith("MERGE INTO \"t\" T USING (VALUES (?, ?, ?)) AS V")
    both should include("ON T.\"id\" = V.\"id\"")
    both should include("WHEN MATCHED THEN UPDATE SET \"value\" = V.\"value\"")
    (both should not).include("\"created_at\" = V.\"created_at\"") // insert-only field
    both should include(
      "WHEN NOT MATCHED THEN INSERT (\"id\", \"value\", \"created_at\")")
    bind shouldBe cols
    // insert-only: no WHEN MATCHED branch at all
    val (insOnly, _) = AnsiMergeUpsertDialect.upsertSql("t", cols, c,
      canInsert = true, canUpdate = false)
    (insOnly should not).include("WHEN MATCHED")
    insOnly should include("WHEN NOT MATCHED THEN INSERT")
    // update-only shares the ANSI plain-UPDATE path with the PG dialect
    val (updOnly, bindOrder) = AnsiMergeUpsertDialect.upsertSql("t", cols, c,
      canInsert = false, canUpdate = true)
    updOnly should startWith("UPDATE")
    bindOrder shouldBe Seq("value", "id")
  }
}
