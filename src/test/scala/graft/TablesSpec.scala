package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.sources.Tables

/** Fixture-schema guard: converts the next silent testdata regeneration
  * into a named failure here instead of opaque analysis errors across the
  * contract queries (round-10 postmortem: `events.ts` flipped from parquet
  * timestamp[ns] to timestamp[us] and six queries failed with
  * DATATYPE_MISMATCH). Each table at sf0.001 must load, be non-empty, and
  * land its key columns on the Spark types the query inventory assumes.
  */
class TablesSpec extends SparkSpec {

  private def schemaOf(t: String) = Tables.load(spark, sf, t).schema

  test("all fixture tables load and are non-empty at sf0.001") {
    Tables.all.foreach { t =>
      withClue(s"table $t: ") {
        Tables.load(spark, sf, t).limit(1).count() shouldBe 1L
      }
    }
  }

  test("key-column types match what the query inventory assumes") {
    val expect: Map[String, Map[String, DataType]] = Map(
      "region" -> Map("r_regionkey" -> IntegerType, "r_name" -> StringType),
      "nation" -> Map("n_nationkey" -> IntegerType, "n_regionkey" -> IntegerType),
      "customer" -> Map("c_custkey" -> LongType, "c_acctbal" -> DoubleType,
        "c_mktsegment" -> StringType),
      "supplier" -> Map("s_suppkey" -> LongType, "s_nationkey" -> IntegerType),
      "part" -> Map("p_partkey" -> LongType, "p_size" -> IntegerType,
        "p_retailprice" -> DoubleType),
      "orders" -> Map("o_orderkey" -> LongType, "o_custkey" -> LongType,
        "o_totalprice" -> DoubleType),
      "lineitem" -> Map("l_orderkey" -> LongType, "l_quantity" -> DoubleType,
        "l_extendedprice" -> DoubleType),
      "documents" -> Map("doc_id" -> LongType, "text" -> StringType,
        "lang" -> StringType, "source" -> StringType, "n_chars" -> LongType),
      "embeddings" -> Map("vec_id" -> LongType,
        "embedding" -> ArrayType(FloatType), "label" -> IntegerType),
      "events" -> Map("event_id" -> LongType, "user_id" -> LongType,
        "event_type" -> StringType, "value" -> DoubleType,
        "props" -> StringType))
    expect.foreach { case (t, cols) =>
      val s = schemaOf(t)
      cols.foreach { case (c, dt) =>
        withClue(s"$t.$c: ") { s(c).dataType shouldBe dt }
      }
    }
  }

  test("date-like columns are timestamp or date (both query-compatible)") {
    Seq("orders" -> "o_orderdate", "lineitem" -> "l_shipdate").foreach {
      case (t, c) =>
        withClue(s"$t.$c: ") {
          schemaOf(t)(c).dataType should (
            be(TimestampType) or be(TimestampNTZType) or be(DateType))
        }
    }
  }

  test("events.ts decodes uniformly to TimestampType from any vintage") {
    // the live fixture, whatever encoding this regeneration used
    val live = schemaOf("events")("ts").dataType
    withClue(s"raw events.ts type $live: ") {
      Set[DataType](LongType, TimestampNTZType, TimestampType) should
        contain(live)
    }
    Tables.withEventTimestamp(Tables.load(spark, sf, "events"))
      .schema("ts").dataType shouldBe TimestampType
  }

  test("withEventTimestamp: all three vintages yield the same instant") {
    import spark.implicits._
    val nanos = 1704067200123456000L // 2024-01-01T00:00:00.123456Z
    val fromLong = Tables.withEventTimestamp(Seq(nanos).toDF("ts"))
    val fromNtz = Tables.withEventTimestamp(
      Seq(nanos / 1000).toDF("us")
        .select(timestamp_micros(col("us")).cast(TimestampNTZType).as("ts")))
    val fromTs = Tables.withEventTimestamp(
      Seq(nanos / 1000).toDF("us").select(timestamp_micros(col("us")).as("ts")))
    val got = Seq(fromLong, fromNtz, fromTs).map { df =>
      df.schema("ts").dataType shouldBe TimestampType
      df.select(unix_micros(col("ts"))).as[Long].head()
    }
    got shouldBe Seq.fill(3)(nanos / 1000)
  }

  test("withEventTimestamp rejects undecodable event-time types") {
    import spark.implicits._
    an[IllegalArgumentException] should be thrownBy
      Tables.withEventTimestamp(Seq("oops").toDF("ts"))
  }

  test("loadAs + registerViewsAs round-trip csv/json/orc: every format " +
    "reproduces the parquet rows") {
    import org.apache.spark.sql.functions.col
    val nation = Tables.load(spark, sf, "nation")
      .select(col("n_nationkey"), col("n_name"))
    val expected = nation.orderBy("n_nationkey").collect()
      .map(r => (r.getInt(0), r.getString(1)))
    val dir = java.nio.file.Files.createTempDirectory("graft_fmt").toString
    nation.write.option("header", "true").csv(s"$dir/nation.csv")
    nation.write.json(s"$dir/nation.json")
    nation.write.orc(s"$dir/nation.orc")
    Seq(
      ("csv", Map("header" -> "true")),
      ("json", Map.empty[String, String]),
      ("orc", Map.empty[String, String])).foreach { case (fmt, opts) =>
      withClue(s"format $fmt: ") {
        // text formats surface untyped columns; the documented production
        // read pins types with explicit casts (orc/json are no-ops)
        val back = Tables.loadAs(spark, dir, "nation", fmt, opts)
          .select(col("n_nationkey").cast("int"), col("n_name").cast("string"))
        back.orderBy("n_nationkey").collect()
          .map(r => (r.getInt(0), r.getString(1))) shouldBe expected
        Tables.registerViewsAs(spark, dir, fmt, opts, tables = Seq("nation"))
        spark.table("nation").count() shouldBe expected.length.toLong
        spark.catalog.dropTempView("nation")
      }
    }
    org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(dir))
  }

  test("loadWithErrors quarantines malformed JSON lines as data and parses " +
    "the rest; ok never carries the corrupt column") {
    val dir = java.nio.file.Files.createTempDirectory("graft_badjson")
    val f = dir.resolve("rows.json")
    java.nio.file.Files.write(f, java.util.Arrays.asList(
      """{"id": 1, "name": "alpha"}""",
      """{"id": 2 "name": "missing-comma"}""", // malformed
      """{"id": 3, "name": "gamma"}""",
      """not json at all"""))
    val split = Tables.loadWithErrors(spark, f.toString, "json",
      StructType(Seq(StructField("id", LongType), StructField("name", StringType))))
    split.ok.columns.toSeq shouldBe Seq("id", "name")
    split.ok.orderBy("id").collect().map(r => (r.getLong(0), r.getString(1))) shouldBe
      Array((1L, "alpha"), (3L, "gamma"))
    split.errors.columns.toSeq shouldBe Seq("error", "raw", "id", "name")
    val errs = split.errors.collect()
    errs.length shouldBe 2
    errs.foreach(_.getString(0) shouldBe "malformed json record")
    errs.map(_.getString(1)).toSet shouldBe Set(
      """{"id": 2 "name": "missing-comma"}""", "not json at all")
    org.apache.commons.io.FileUtils.deleteDirectory(dir.toFile)
  }

  test("streamWithErrors quarantines malformed streamed JSON lines while " +
    "the ok stream keeps parsing newly arriving files") {
    val dir = java.nio.file.Files.createTempDirectory("graft_streamq")
    val schema = StructType(Seq(
      StructField("id", LongType), StructField("name", StringType)))
    java.nio.file.Files.write(dir.resolve("b1.json"), java.util.Arrays.asList(
      """{"id": 1, "name": "alpha"}""", "garbage"))
    val split = Tables.streamWithErrors(spark, dir.toString, "json", schema)
    split.ok.isStreaming shouldBe true
    val qOk = split.ok.writeStream.format("memory")
      .queryName("sq_ok").outputMode("append").start()
    val qErr = split.errors.writeStream.format("memory")
      .queryName("sq_err").outputMode("append").start()
    try {
      qOk.processAllAvailable(); qErr.processAllAvailable()
      spark.table("sq_ok").orderBy("id").collect()
        .map(r => (r.getLong(0), r.getString(1))) shouldBe Array((1L, "alpha"))
      spark.table("sq_err").collect().map(_.getString(1)) shouldBe Array("garbage")
      // a new file arrives: both branches pick it up on the next batch
      java.nio.file.Files.write(dir.resolve("b2.json"), java.util.Arrays.asList(
        """{"id": 2, "name": "beta"}""", """{"id": oops}"""))
      qOk.processAllAvailable(); qErr.processAllAvailable()
      spark.table("sq_ok").orderBy("id").collect()
        .map(_.getLong(0)) shouldBe Array(1L, 2L)
      spark.table("sq_err").count() shouldBe 2L
    } finally { qOk.stop(); qErr.stop() }
    org.apache.commons.io.FileUtils.deleteDirectory(dir.toFile)
  }

  test("loadWithErrors quarantines CSV rows that fail the schema, keeps " +
    "conforming rows, and rejects non-text formats") {
    val dir = java.nio.file.Files.createTempDirectory("graft_badcsv")
    val f = dir.resolve("rows.csv")
    java.nio.file.Files.write(f, java.util.Arrays.asList(
      "1,alpha", "oops,beta", "3,gamma"))
    val split = Tables.loadWithErrors(spark, f.toString, "csv",
      StructType(Seq(StructField("id", LongType), StructField("name", StringType))))
    split.ok.orderBy("id").collect().map(r => (r.getLong(0), r.getString(1))) shouldBe
      Array((1L, "alpha"), (3L, "gamma"))
    split.errors.collect().map(_.getString(1)) shouldBe Array("oops,beta")
    an[IllegalArgumentException] should be thrownBy
      Tables.loadWithErrors(spark, f.toString, "parquet", StructType(Nil))
    org.apache.commons.io.FileUtils.deleteDirectory(dir.toFile)
  }
}
