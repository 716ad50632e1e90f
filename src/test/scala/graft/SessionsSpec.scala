package graft

import java.sql.Timestamp

import org.apache.spark.sql.functions._

import graft.operators.{Joins, Sessions}

class SessionsSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)

  test("sessionize numbers gap-separated runs per key, 1-based; ties at " +
    "one timestamp share a session; NULL ts rows get NULL session_no " +
    "without perturbing real numbering") {
    val ev = Seq(
      (1L, ts("2024-01-01 10:00:00")),
      (1L, ts("2024-01-01 10:10:00")),  // 10 min gap -> same session
      (1L, ts("2024-01-01 11:30:00")),  // 80 min -> new session
      (1L, ts("2024-01-01 11:30:00")),  // tie -> same session
      (2L, ts("2024-01-01 09:00:00")),
      (2L, null.asInstanceOf[Timestamp])
    ).toDF("user_id", "t")
    val out = Sessions.sessionize(ev, Seq("user_id"), "t", gapSec = 1800L)
      .orderBy(col("user_id"), col("t"))
      .collect()
      .map(r => (r.getLong(0), if (r.isNullAt(2)) -1L else r.getLong(2)))
    out shouldBe Array(
      (1L, 1L), (1L, 1L), (1L, 2L), (1L, 2L),
      (2L, -1L),  // null ts sorts first under asc-nulls-first
      (2L, 1L))
  }

  test("sessionizeBucketed is row-identical to sessionize across bucket " +
    "widths — including sessions spanning many buckets, empty buckets " +
    "between events, multi-keys, ties and NULL ts") {
    val rnd = new scala.util.Random(1337L)
    val base = ts("2024-01-01 00:00:00").getTime
    (0 until 4).foreach { _ =>
      // clustered timestamps: runs of close events separated by long
      // gaps, so real sessions exist at every bucket width
      val rows = (0 until 120).map { i =>
        val key = rnd.nextInt(3).toLong
        val cluster = rnd.nextInt(6)
        val tsv =
          if (rnd.nextInt(40) == 0) null
          else new Timestamp(base + cluster * 7200000L +
            rnd.nextInt(600) * 1000L)
        (key, rnd.nextInt(2).toString, tsv, i.toLong)
      }
      val df = rows.toDF("user_id", "seg", "t", "row_id")
      val plain = Sessions.sessionize(df, Seq("user_id", "seg"), "t", 900L)
      for (widthSec <- Seq(60L, 1800L, 86400L)) {
        val bucketed = Sessions.sessionizeBucketed(df, Seq("user_id", "seg"),
          "t", 900L, Joins.timeBuckets(widthSec))
        bucketed.columns.toSeq shouldBe plain.columns.toSeq
        val ord = plain.columns.map(col).toIndexedSeq
        withClue(s"width=$widthSec: ") {
          bucketed.orderBy(ord: _*).collect().map(_.toSeq) shouldBe
            plain.orderBy(ord: _*).collect().map(_.toSeq)
        }
      }
    }
  }

  test("sessionizeBucketed: heavy timestamp ties (including at bucket " +
    "heads) and keys that do NOT lead the schema — output column order " +
    "and numbering must match the plain variant exactly") {
    val rnd = new scala.util.Random(77L)
    val base = ts("2024-01-01 00:00:00").getTime
    // tiny ts domain on bucket-width multiples: most rows tie, and tie
    // runs sit exactly at bucket boundaries — the regime where a
    // row-order-dependent boundary flag would mis-number a tie sibling
    val rows = (0 until 150).map { i =>
      (new Timestamp(base + rnd.nextInt(8) * 3600000L), i.toLong,
        rnd.nextInt(3).toLong)
    }
    val df = rows.toDF("t", "row_id", "user_id") // key trails the schema
    val plain = Sessions.sessionize(df, Seq("user_id"), "t", 1800L)
    for (widthSec <- Seq(3600L, 7200L)) {
      val bucketed = Sessions.sessionizeBucketed(df, Seq("user_id"), "t",
        1800L, Joins.timeBuckets(widthSec))
      bucketed.columns.toSeq shouldBe plain.columns.toSeq
      bucketed.columns.toSeq shouldBe Seq("t", "row_id", "user_id", "session_no")
      val ord = plain.columns.map(col).toIndexedSeq
      withClue(s"width=$widthSec: ") {
        bucketed.orderBy(ord: _*).collect().map(_.toSeq) shouldBe
          plain.orderBy(ord: _*).collect().map(_.toSeq)
      }
    }
  }

  test("sessionize and sessionizeBucketed reject inputs using the __s " +
    "internal-column prefix or an existing session_no instead of " +
    "clobbering them") {
    val df = Seq((1L, ts("2024-01-01 00:00:00"), "x"))
      .toDF("user_id", "t", "__sprev")
    an[IllegalArgumentException] should be thrownBy
      Sessions.sessionize(df, Seq("user_id"), "t", 60L)
    an[IllegalArgumentException] should be thrownBy
      Sessions.sessionizeBucketed(df, Seq("user_id"), "t", 60L,
        Joins.timeBuckets(3600L))
    val resess = Seq((1L, ts("2024-01-01 00:00:00"), 1L))
      .toDF("user_id", "t", "session_no")
    an[IllegalArgumentException] should be thrownBy
      Sessions.sessionize(resess, Seq("user_id"), "t", 60L)
    an[IllegalArgumentException] should be thrownBy
      Sessions.sessionizeBucketed(resess, Seq("user_id"), "t", 60L,
        Joins.timeBuckets(3600L))
  }

  test("NULL-key rows are sessionized as their own group by BOTH variants " +
    "(Window.partitionBy groups NULLs; a null-unsafe join would silently " +
    "drop them from the bucketed path)") {
    val ev = Seq(
      (Option(1L), ts("2024-01-01 10:00:00")),
      (Option.empty[Long], ts("2024-01-01 10:05:00")),
      (Option.empty[Long], ts("2024-01-01 10:10:00")),
      (Option.empty[Long], ts("2024-01-01 15:00:00"))  // far -> session 2
    ).toDF("user_id", "t")
    val plain = Sessions.sessionize(ev, Seq("user_id"), "t", 1800L)
    val bucketed = Sessions.sessionizeBucketed(ev, Seq("user_id"), "t",
      1800L, Joins.timeBuckets(3600L))
    bucketed.count() shouldBe 4  // nothing dropped
    val ord = plain.columns.map(col).toIndexedSeq
    bucketed.orderBy(ord: _*).collect().map(_.toSeq) shouldBe
      plain.orderBy(ord: _*).collect().map(_.toSeq)
    val nullSessions = plain.filter(col("user_id").isNull)
      .orderBy("t").select("session_no").as[Long].collect()
    nullSessions shouldBe Array(1L, 1L, 2L)
  }

  test("sessionizeBucketed: a session STRADDLING a bucket boundary keeps " +
    "one number (the cross-bucket last-ts resolves the first-row flag), " +
    "and the offset numbers later sessions correctly") {
    val ev = Seq(
      (1L, ts("2024-01-01 00:59:00")),  // bucket 0 (hourly)
      (1L, ts("2024-01-01 01:01:00")),  // bucket 1, 2 min gap -> SAME session
      (1L, ts("2024-01-01 05:00:00")),  // far -> session 2
      (1L, ts("2024-01-01 05:10:00"))   // same session 2
    ).toDF("user_id", "t")
    val out = Sessions.sessionizeBucketed(ev, Seq("user_id"), "t", 1800L,
        Joins.timeBuckets(3600L))
      .orderBy("t").select("session_no").as[Long].collect()
    out shouldBe Array(1L, 1L, 2L, 2L)
  }
}
