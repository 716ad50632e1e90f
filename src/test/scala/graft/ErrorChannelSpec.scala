package graft

import org.apache.spark.sql.functions._

import graft.core.ErrorChannel
import graft.sinks.JdbcDdl
import org.apache.spark.sql.types._

class ErrorChannelSpec extends SparkSpec {
  import spark.implicits._

  test("split routes invalid rows to the error channel with the row attached") {
    val df = Seq((1, "ok"), (2, ""), (3, "ok2")).toDF("id", "v")
    val s = ErrorChannel.split(df,
      org.apache.spark.sql.functions.length(col("v")) > 0, "empty value")
    s.ok.select("id").as[Int].collect().sorted shouldBe Array(1, 3)
    val err = s.errors.collect()
    err.map(_.getString(0)) shouldBe Array("empty value")
    err.map(_.getInt(1)) shouldBe Array(2)
  }

  test("split treats a null predicate as invalid (no silent row loss)") {
    val df = Seq(Some(1), None, Some(3)).toDF("n")
    val s = ErrorChannel.split(df, col("n") > 1, "bad")
    s.ok.count() + s.errors.count() shouldBe 3
  }

  test("guarded: failed try-casts land in the error channel") {
    val df = Seq("12", "x", "7").toDF("raw")
    val s = ErrorChannel.guarded(df, expr("try_cast(raw AS int)"), "n", "not a number")
    s.ok.select("n").as[Int].collect().sorted shouldBe Array(7, 12)
    s.errors.select("raw").as[String].collect() shouldBe Array("x")
  }

  test("JdbcDdl synthesizes Postgres DDL from a Spark schema") {
    val schema = StructType(Seq(
      StructField("id", IntegerType, nullable = false),
      StructField("value", StringType),
      StructField("amount", DecimalType(12, 2)),
      StructField("created_at", TimestampType)))
    JdbcDdl.createTableSql("example", schema, primaryKey = Seq("id")) shouldBe
      """CREATE TABLE IF NOT EXISTS "example" ("id" INTEGER NOT NULL, """ +
        """"value" TEXT, "amount" NUMERIC(12,2), "created_at" TIMESTAMP""" +
        """, PRIMARY KEY ("id"))"""
    JdbcDdl.dropTableSql("example") shouldBe """DROP TABLE IF EXISTS "example""""
    intercept[IllegalArgumentException] {
      JdbcDdl.sqlType(ArrayType(StringType))
    }
  }
}
