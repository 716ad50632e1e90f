package graft

import java.sql.Timestamp

import org.apache.spark.sql.functions.{col, expr, floor, lit}

import graft.operators.Joins

class JoinsSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)

  test("asOfJoin attaches the latest right row at-or-before each left row") {
    val quotes = Seq(
      (1L, ts("2024-01-01 10:00:00"), 100.0),
      (1L, ts("2024-01-01 11:00:00"), 110.0),
      (2L, ts("2024-01-01 10:30:00"), 200.0)
    ).toDF("key", "qts", "price")
    val trades = Seq(
      (1L, ts("2024-01-01 10:30:00"), "t1"),  // matches 10:00 quote
      (1L, ts("2024-01-01 11:00:00"), "t2"),  // equal ts -> matches 11:00 quote
      (2L, ts("2024-01-01 10:00:00"), "t3"),  // before any quote -> null
      (3L, ts("2024-01-01 12:00:00"), "t4")   // key with no quotes -> null
    ).toDF("key", "tts", "trade_id")
    val out = Joins.asOfJoin(trades, quotes, Seq("key"), "tts", "qts")
      .orderBy("trade_id").collect()
    out.map(r => (r.getString(2), if (r.isNullAt(4)) null else r.getDouble(4))) shouldBe
      Array(("t1", 100.0), ("t2", 110.0), ("t3", null), ("t4", null))
    // right ts travels with the payload
    out(0).getTimestamp(3) shouldBe ts("2024-01-01 10:00:00")
  }

  test("asOfJoin: null right timestamps can never match (dirty data is inert)") {
    val quotes = Seq((1L, null.asInstanceOf[Timestamp], 999.0),
      (1L, ts("2024-01-01 09:00:00"), 100.0)).toDF("key", "qts", "price")
    val trades = Seq((1L, ts("2024-01-01 08:00:00"), "before"),
      (1L, ts("2024-01-01 10:00:00"), "after")).toDF("key", "tts", "trade_id")
    val out = Joins.asOfJoin(trades, quotes, Seq("key"), "tts", "qts")
      .orderBy("tts").collect()
    assert(out(0).isNullAt(4)) // 08:00 precedes every real quote -> no match
    out(1).getDouble(4) shouldBe 100.0 // never the null-ts row's 999.0
  }

  test("asOfJoin output schema = left columns + right payload") {
    val l = Seq((1L, ts("2024-01-01 00:00:00"), "x")).toDF("k", "lts", "lv")
    val r = Seq((1L, ts("2023-12-31 00:00:00"), 9)).toDF("k", "rts", "rv")
    Joins.asOfJoin(l, r, Seq("k"), "lts", "rts").columns.toSeq shouldBe
      Seq("k", "lts", "lv", "rts", "rv")
  }

  test("asOfJoin forward direction attaches the earliest right row " +
    "at-or-after each left row") {
    val quotes = Seq(
      (1L, ts("2024-01-01 10:00:00"), 100.0),
      (1L, ts("2024-01-01 11:00:00"), 110.0)
    ).toDF("key", "qts", "price")
    val trades = Seq(
      (1L, ts("2024-01-01 09:30:00"), "t1"),  // next quote is 10:00
      (1L, ts("2024-01-01 10:00:00"), "t2"),  // equal ts matches inclusively
      (1L, ts("2024-01-01 10:30:00"), "t3"),  // next quote is 11:00
      (1L, ts("2024-01-01 11:30:00"), "t4")   // nothing after -> null
    ).toDF("key", "tts", "trade_id")
    val out = Joins.asOfJoin(trades, quotes, Seq("key"), "tts", "qts",
      direction = "forward").orderBy("trade_id").collect()
    out.map(r => (r.getString(2), if (r.isNullAt(4)) null else r.getDouble(4))) shouldBe
      Array(("t1", 100.0), ("t2", 100.0), ("t3", 110.0), ("t4", null))
  }

  test("asOfJoin tolerance nulls out matches beyond the bound, keeping " +
    "left-outer semantics, in both directions") {
    val quotes = Seq(
      (1L, ts("2024-01-01 10:00:00"), 100.0)
    ).toDF("key", "qts", "price")
    val trades = Seq(
      (1L, ts("2024-01-01 10:02:00"), "near"),   // 2 min after the quote
      (1L, ts("2024-01-01 10:30:00"), "far")     // 30 min after
    ).toDF("key", "tts", "trade_id")
    val back = Joins.asOfJoin(trades, quotes, Seq("key"), "tts", "qts",
      tolerance = Some(expr("INTERVAL '300' SECOND")))
      .orderBy("trade_id").collect()
    back.map(r => (r.getString(2), r.isNullAt(4))) shouldBe
      Array(("far", true), ("near", false))
    // forward: quotes after the trade, same 5-minute bound
    val fwdTrades = Seq(
      (1L, ts("2024-01-01 09:58:00"), "near"),   // 2 min before the quote
      (1L, ts("2024-01-01 09:00:00"), "far")     // 60 min before
    ).toDF("key", "tts", "trade_id")
    val fwd = Joins.asOfJoin(fwdTrades, quotes, Seq("key"), "tts", "qts",
      direction = "forward", tolerance = Some(expr("INTERVAL '300' SECOND")))
      .orderBy("trade_id").collect()
    fwd.map(r => (r.getString(2), r.isNullAt(4))) shouldBe
      Array(("far", true), ("near", false))
  }

  test("asOfJoin nearest direction picks the closer side, breaks " +
    "equidistant ties backward, and respects tolerance per side") {
    val quotes = Seq(
      (1L, ts("2024-01-01 10:00:00"), 100.0),
      (1L, ts("2024-01-01 11:00:00"), 110.0)
    ).toDF("key", "qts", "price")
    val trades = Seq(
      (1L, ts("2024-01-01 10:10:00"), "t1"),  // 10 min after 10:00, 50 before 11:00
      (1L, ts("2024-01-01 10:50:00"), "t2"),  // 10 min before 11:00
      (1L, ts("2024-01-01 10:30:00"), "t3"),  // equidistant -> backward 10:00
      (1L, ts("2024-01-01 09:00:00"), "t4")   // only a forward match exists
    ).toDF("key", "tts", "trade_id")
    val out = Joins.asOfJoin(trades, quotes, Seq("key"), "tts", "qts",
      direction = "nearest").orderBy("trade_id").collect()
    out.map(r => (r.getString(2), r.getDouble(4))) shouldBe
      Array(("t1", 100.0), ("t2", 110.0), ("t3", 100.0), ("t4", 100.0))
    // tolerance trims each side BEFORE choosing: at 15 min, t3 (30 min from
    // both quotes) and t4 (60 min out) null while t1/t2 keep their match
    val tol = Joins.asOfJoin(trades, quotes, Seq("key"), "tts", "qts",
      direction = "nearest", tolerance = Some(expr("INTERVAL '900' SECOND")))
      .orderBy("trade_id").collect()
    tol.map(r => (r.getString(2), if (r.isNullAt(4)) null else r.getDouble(4))) shouldBe
      Array(("t1", 100.0), ("t2", 110.0), ("t3", null), ("t4", null))
  }

  test("asOfJoin: a null LEFT timestamp yields no match in every direction " +
    "(forward's desc sort must not carry the earliest right payload into it)") {
    val quotes = Seq(
      (1L, ts("2024-01-01 10:00:00"), 100.0),
      (1L, ts("2024-01-01 11:00:00"), 110.0)
    ).toDF("key", "qts", "price")
    val trades = Seq(
      (1L, null.asInstanceOf[Timestamp], "null_ts"),
      (1L, ts("2024-01-01 10:30:00"), "real")
    ).toDF("key", "tts", "trade_id")
    for (dir <- Seq("backward", "forward", "nearest")) {
      val out = Joins.asOfJoin(trades, quotes, Seq("key"), "tts", "qts",
        direction = dir).orderBy("trade_id").collect()
      withClue(s"direction=$dir: ") {
        assert(out(0).getString(2) == "null_ts" && out(0).isNullAt(4),
          "null left ts must keep left-outer nulls")
        assert(!out(1).isNullAt(4), "real left ts must still match")
      }
    }
  }

  test("asOfJoin rejects an unknown direction") {
    val l = Seq((1L, ts("2024-01-01 00:00:00"), "x")).toDF("k", "lts", "lv")
    val r = Seq((1L, ts("2023-12-31 00:00:00"), 9)).toDF("k", "rts", "rv")
    an[IllegalArgumentException] should be thrownBy
      Joins.asOfJoin(l, r, Seq("k"), "lts", "rts", direction = "sideways")
  }

  test("saltedCountSum equals the plain group-by") {
    val li = sources.Tables.load(spark, sf, "lineitem")
    val salted = Joins.saltedCountSum(li, Seq("l_returnflag"), "l_quantity")
      .orderBy("l_returnflag").collect()
    val plain = li.groupBy("l_returnflag")
      .agg(org.apache.spark.sql.functions.count(
        org.apache.spark.sql.functions.lit(1)).as("n"),
        org.apache.spark.sql.functions.sum("l_quantity").as("s"))
      .orderBy("l_returnflag").collect()
    salted.map(r => (r.getString(0), r.getLong(1), r.getDouble(2))) shouldBe
      plain.map(r => (r.getString(0), r.getLong(1), r.getDouble(2)))
  }

  test("bandedIntervalJoin equals the naive non-equi range join, including " +
    "pairs straddling bin boundaries") {
    def t(s: String) = Timestamp.valueOf(s)
    val l = Seq(
      (1L, 7L, t("2024-01-01 00:00:30")),
      (2L, 7L, t("2024-01-01 00:09:59")), // interval straddles a 600s bin edge
      (3L, 8L, t("2024-01-01 00:00:00"))
    ).toDF("lid", "user_id", "ts")
    val r = Seq(
      (10L, 7L, t("2024-01-01 00:05:00")), // in range of lid 1
      (11L, 7L, t("2024-01-01 00:19:58")), // +599s from lid 2, next bin
      (12L, 7L, t("2024-01-01 00:20:00")), // +601s from lid 2 -> out
      (13L, 9L, t("2024-01-01 00:00:10"))  // other key -> out
    ).toDF("rid", "user_id", "ts")
    val banded = Joins.bandedIntervalJoin(l, r, "user_id", "ts", "ts",
        lowerSec = 0L, upperSec = 600L)
      .select(col("lid"), col("r_rid")).as[(Long, Long)].collect().toSet
    val naive = l.join(r.withColumnRenamed("ts", "rts")
        .withColumnRenamed("user_id", "ruid"),
        col("user_id") === col("ruid") &&
          col("rts") >= col("ts") && col("rts") <= col("ts") + expr("INTERVAL 600 SECOND"))
      .select(col("lid"), col("rid")).as[(Long, Long)].collect().toSet
    banded shouldBe naive
    banded shouldBe Set(1L -> 10L, 2L -> 11L)
  }

  test("bandedIntervalJoin handles pre-epoch timestamps (negative micros: " +
    "integer div on the pmod-floored value still bins by true floor)") {
    def t(s: String) = java.sql.Timestamp.valueOf(s)
    val l = Seq((1L, 7L, t("1969-12-31 23:59:00"))).toDF("lid", "user_id", "ts")
    val r = Seq(
      (10L, 7L, t("1969-12-31 23:59:30")), // +30s, straddles micros == 0
      (11L, 7L, t("1970-01-01 00:02:00"))  // +180s -> out of [0, 120]
    ).toDF("rid", "user_id", "ts")
    val got = Joins.bandedIntervalJoin(l, r, "user_id", "ts", "ts",
        lowerSec = 0L, upperSec = 120L)
      .select(col("lid"), col("r_rid")).collect()
      .map(row => (row.getLong(0), row.getLong(1))).toSet
    got shouldBe Set(1L -> 10L)
  }

  test("asOfJoinBucketed is row-identical to asOfJoin across directions, " +
    "tolerances and bucket widths — including right-ts ties (the bucket " +
    "extreme must replay the payload tie rule) and cross-bucket matches") {
    val rnd = new scala.util.Random(4242L)
    (0 until 4).foreach { _ =>
      // small domains FORCE collisions: ts ties within keys (tie rule),
      // sparse buckets (fix-up path), keys with no right rows (null
      // path), and occasional NULL keys (both plans must group them —
      // the carry is windows and group-bys throughout, never an
      // equi-join that would drop NULL keys)
      def key(n: Int): Option[Long] =
        if (rnd.nextInt(8) == 0) None else Some(rnd.nextInt(n).toLong)
      val l = (0 until 60).map(i =>
        (key(4), rnd.nextInt(40).toLong, s"l$i")).toDF("k", "lts", "lv")
      val r = (0 until 50).map(_ =>
        (key(5), rnd.nextInt(40).toLong, rnd.nextInt(4))).toDF("k", "rts", "rv")
      for (dir <- Seq("backward", "forward", "nearest");
           width <- Seq(1L, 7L, 1000L);
           tol <- Seq(Option.empty[org.apache.spark.sql.Column], Some(lit(5L)))) {
        val bucketOf = (c: org.apache.spark.sql.Column) =>
          floor(c / lit(width.toDouble)).cast("long")
        val base = Joins.asOfJoin(l, r, Seq("k"), "lts", "rts", "r_", dir, tol)
        val buck = Joins.asOfJoinBucketed(l, r, Seq("k"), "lts", "rts",
          bucketOf, "r_", dir, tol)
        buck.columns.toSeq shouldBe base.columns.toSeq
        val ord = base.columns.map(col).toIndexedSeq
        withClue(s"dir=$dir width=$width tol=${tol.isDefined}: ") {
          buck.orderBy(ord: _*).collect().map(_.toSeq) shouldBe
            base.orderBy(ord: _*).collect().map(_.toSeq)
        }
      }
    }
    // timestamp algebra: hourly buckets + INTERVAL tolerance, all directions
    val quotes = Seq(
      (1L, ts("2024-01-01 10:00:00"), 100.0),
      (1L, ts("2024-01-01 11:00:00"), 110.0),
      (2L, ts("2024-01-03 09:00:00"), 200.0)
    ).toDF("key", "qts", "price")
    val trades = Seq(
      (1L, ts("2024-01-01 10:10:00"), "t1"),
      (1L, ts("2024-01-02 23:59:00"), "t2"), // match is days of buckets back
      (2L, ts("2024-01-01 08:00:00"), "t3"),
      (3L, ts("2024-01-01 12:00:00"), "t4")
    ).toDF("key", "tts", "trade_id")
    for (dir <- Seq("backward", "forward", "nearest");
         tol <- Seq(Option.empty[org.apache.spark.sql.Column],
           Some(expr("INTERVAL '3600' SECOND")))) {
      val base = Joins.asOfJoin(trades, quotes, Seq("key"), "tts", "qts",
        "q_", dir, tol)
      val buck = Joins.asOfJoinBucketed(trades, quotes, Seq("key"), "tts",
        "qts", Joins.timeBuckets(3600L), "q_", dir, tol)
      val ord = base.columns.map(col).toIndexedSeq
      withClue(s"ts dir=$dir tol=${tol.isDefined}: ") {
        buck.orderBy(ord: _*).collect().map(_.toSeq) shouldBe
          base.orderBy(ord: _*).collect().map(_.toSeq)
      }
    }
  }

  test("saltedJoin equals the plain equi-join") {
    val li = sources.Tables.load(spark, sf, "lineitem").select("l_orderkey", "l_partkey")
    val p = sources.Tables.load(spark, sf, "part").select("p_partkey", "p_brand")
      .withColumnRenamed("p_partkey", "l_partkey")
    val salted = Joins.saltedJoin(li, p, "l_partkey", salts = 8)
    val plain = li.join(p, Seq("l_partkey"))
    salted.count() shouldBe plain.count()
    salted.exceptAll(plain).count() shouldBe 0
  }
}
