package graft

import java.sql.Timestamp

import org.apache.spark.sql.functions.{col, expr, lit}

import graft.operators.Joins

/** The physical as-of join ([[graft.plans.AsofJoinExec]]): row-identical
  * semantics to the window-form [[Joins.asOfJoin]], plus the plan
  * properties that are the POINT of the custom node — one exchange per
  * side placed by EnsureRequirements, filter pushdown and column pruning
  * through the custom logical node reaching the parquet scan. */
class AsofMergeSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)

  test("asOfJoinMerge is row-identical to asOfJoin across directions and " +
    "tolerances — including NULL keys (grouped), NULL left/right ts, and " +
    "right-ts ties (greatest-payload rule)") {
    val rnd = new scala.util.Random(97531L)
    (0 until 4).foreach { _ =>
      // small domains force ties, NULL keys, matchless keys; NULL ts on
      // both sides exercises the inert-dirty-data paths
      def key(n: Int): Option[Long] =
        if (rnd.nextInt(8) == 0) None else Some(rnd.nextInt(n).toLong)
      def maybeTs(range: Int): Option[Long] =
        if (rnd.nextInt(12) == 0) None else Some(rnd.nextInt(range).toLong)
      val l = (0 until 60).map(i =>
        (key(4), maybeTs(40), s"l$i")).toDF("k", "lts", "lv")
      val r = (0 until 50).map(_ =>
        (key(5), maybeTs(40), rnd.nextInt(4))).toDF("k", "rts", "rv")
      for (dir <- Seq("backward", "forward", "nearest");
           tol <- Seq(Option.empty[org.apache.spark.sql.Column], Some(lit(5L)))) {
        val base = Joins.asOfJoinWindow(l, r, Seq("k"), "lts", "rts", "r_", dir, tol)
        val merge = Joins.asOfJoinMerge(l, r, Seq("k"), "lts", "rts", "r_",
          dir, tol)
        merge.columns.toSeq shouldBe base.columns.toSeq
        val ord = base.columns.map(col).toIndexedSeq
        withClue(s"dir=$dir tol=${tol.isDefined}: ") {
          merge.orderBy(ord: _*).collect().map(_.toSeq) shouldBe
            base.orderBy(ord: _*).collect().map(_.toSeq)
        }
      }
    }
  }

  test("asOfJoinMerge timestamp algebra with INTERVAL tolerance matches " +
    "asOfJoin, all directions") {
    val quotes = Seq(
      (1L, ts("2024-01-01 10:00:00"), 100.0),
      (1L, ts("2024-01-01 11:00:00"), 110.0),
      (2L, ts("2024-01-03 09:00:00"), 200.0)
    ).toDF("key", "qts", "price")
    val trades = Seq(
      (1L, ts("2024-01-01 10:10:00"), "t1"),
      (1L, ts("2024-01-02 23:59:00"), "t2"),
      (2L, ts("2024-01-01 08:00:00"), "t3"),
      (3L, ts("2024-01-01 12:00:00"), "t4")
    ).toDF("key", "tts", "trade_id")
    for (dir <- Seq("backward", "forward", "nearest");
         tol <- Seq(Option.empty[org.apache.spark.sql.Column],
           Some(expr("INTERVAL '3600' SECOND")))) {
      val base = Joins.asOfJoinWindow(trades, quotes, Seq("key"), "tts", "qts",
        "q_", dir, tol)
      val merge = Joins.asOfJoinMerge(trades, quotes, Seq("key"), "tts",
        "qts", "q_", dir, tol)
      val ord = base.columns.map(col).toIndexedSeq
      withClue(s"ts dir=$dir tol=${tol.isDefined}: ") {
        merge.orderBy(ord: _*).collect().map(_.toSeq) shouldBe
          base.orderBy(ord: _*).collect().map(_.toSeq)
      }
    }
  }

  test("BIGINT ts above 2^53 merges exactly: row-identical to the window " +
    "plan where double arithmetic would collapse adjacent timestamps") {
    // ULP at 2^55 is 4: ts values 2^55+k for k in [0,16) collapse to the
    // same double in groups of 4, so the old double-ordinal merge would
    // see rts <= lts where the exact comparison says rts > lts (and
    // nearest distances would tie spuriously). The window plan computes
    // in native long column arithmetic — the merge must agree bit-exactly.
    val rnd = new scala.util.Random(86420L)
    val base = 1L << 55
    (0 until 3).foreach { _ =>
      def key(n: Int): Option[Long] =
        if (rnd.nextInt(8) == 0) None else Some(rnd.nextInt(n).toLong)
      def hugeTs(): Option[Long] =
        if (rnd.nextInt(12) == 0) None else Some(base + rnd.nextInt(16))
      val l = (0 until 50).map(i => (key(4), hugeTs(), s"l$i")).toDF("k", "lts", "lv")
      val r = (0 until 40).map(_ => (key(4), hugeTs(), rnd.nextInt(4))).toDF("k", "rts", "rv")
      for (dir <- Seq("backward", "forward", "nearest");
           tol <- Seq(Option.empty[org.apache.spark.sql.Column], Some(lit(3L)))) {
        val base0 = Joins.asOfJoinWindow(l, r, Seq("k"), "lts", "rts", "r_", dir, tol)
        val merge = Joins.asOfJoinMerge(l, r, Seq("k"), "lts", "rts", "r_", dir, tol)
        val ord = base0.columns.map(col).toIndexedSeq
        withClue(s"huge-ts dir=$dir tol=${tol.isDefined}: ") {
          merge.orderBy(ord: _*).collect().map(_.toSeq) shouldBe
            base0.orderBy(ord: _*).collect().map(_.toSeq)
        }
      }
    }
    // the collapse is REAL at this magnitude: distinct longs, equal doubles
    (base + 1).toDouble shouldBe base.toDouble
  }

  test("an integral tolerance above 2^53 is fenced: the merge plan refuses " +
    "it loudly and the front door routes to the window plan's exact " +
    "arithmetic instead of silently rounding") {
    val l = Seq((1L, (1L << 55) + 4L, "l0")).toDF("k", "lts", "lv")
    val r = Seq((1L, 1L << 55, 7)).toDF("k", "rts", "rv")
    val hugeTol = lit((1L << 60) - 1) // doubleValue rounds this to 2^60
    val e = intercept[IllegalArgumentException] {
      Joins.asOfJoinMerge(l, r, Seq("k"), "lts", "rts", "r_", "backward",
        Some(hugeTol))
    }
    e.getMessage should include("2^53")
    // the dispatcher degrades to the window plan (exact long compare)
    // rather than failing or rounding
    val out = Joins.asOfJoin(l, r, Seq("k"), "lts", "rts", "r_", "backward",
      Some(hugeTol))
    out.collect().map(_.getAs[Any]("r_rv")) shouldBe Array(7)
    // within-2^53 integral tolerances still take the merge plan
    val okTol = lit((1L << 53) - 1)
    Joins.asOfJoinMerge(l, r, Seq("k"), "lts", "rts", "r_", "backward",
      Some(okTol)).collect().map(_.getAs[Any]("r_rv")) shouldBe Array(7)
  }

  test("asOfJoinMerge multi-key join and self-join (fresh right-side " +
    "expr-ids keep a same-source join analyzable)") {
    val ev = Seq(
      (1L, "a", 10L, "click"),
      (1L, "a", 20L, "purchase"),
      (1L, "b", 15L, "click"),
      (1L, "b", 30L, "purchase")
    ).toDF("uid", "dev", "t", "kind")
    val purchases = ev.filter(col("kind") === "purchase").drop("kind")
    val clicks = ev.filter(col("kind") === "click").drop("kind")
    val out = Joins.asOfJoinMerge(purchases, clicks, Seq("uid", "dev"),
      "t", "t", rightPrefix = "c_")
      .orderBy("dev").collect()
    out.map(r => (r.getString(1), r.getLong(3))) shouldBe
      Array(("a", 10L), ("b", 15L))
  }

  test("asOfJoinMerge plans ONE exchange per side and a streaming merge " +
    "(the AsofJoinExec node), with sorts placed by EnsureRequirements") {
    val ev = sources.Tables.load(spark, sf, "events")
    val purchases = ev.filter(col("event_type") === "purchase")
      .select(col("event_id"), col("user_id"), col("ts"))
    val clicks = ev.filter(col("event_type") === "click")
      .select(col("event_id").as("click_id"), col("user_id"),
        col("ts").as("click_ts"))
    val joined = Joins.asOfJoinMerge(purchases, clicks, Seq("user_id"),
      "ts", "click_ts")
    joined.collect().length should be > 0
    // under AQE the string carries Final + Initial sections; assert on
    // the final one only
    val plan = joined.queryExecution.executedPlan.toString
      .split("== Initial Plan ==").head
    plan should include ("AsofJoin")
    "Exchange hashpartitioning".r.findAllIn(plan).size shouldBe 2
    // the union-and-carry plan would show a Union + Window; the merge
    // form must show neither
    plan should not include "Union"
    plan should not include "Window"
  }

  test("left-side filters push through the custom node into the parquet " +
    "scan (PushedFilters), and unused left columns are pruned (ReadSchema)") {
    val ev = sources.Tables.load(spark, sf, "events")
    val purchases = ev.filter(col("event_type") === "purchase")
    val clicks = ev.filter(col("event_type") === "click")
      .select(col("event_id").as("click_id"), col("user_id"),
        col("ts").as("click_ts"))
    val joined = Joins.asOfJoinMerge(purchases, clicks, Seq("user_id"),
      "ts", "click_ts")
      .filter(col("event_id") > 500L) // left-only predicate, added ABOVE
      .select("event_id", "user_id", "click_id") // prunes left payload cols
    joined.collect()
    val plan = joined.queryExecution.executedPlan.toString
    // the predicate reached a scan's pushed-filter list (the rendered
    // list is truncated, so match the filter's head)
    plan should include ("GreaterThan(event_id,5")
    // pruning: no scan in the plan still reads the wide 'props' column
    // events carries — the rule narrowed the left child, and the right
    // side was pre-projected by the wrapper
    plan should not include "props"
  }

  test("join elimination: a consumer that references no payload column " +
    "drops the join entirely (count() and left-only projections plan as " +
    "the bare left side); referencing payload keeps the join") {
    val ev = sources.Tables.load(spark, sf, "events")
    val purchases = ev.filter(col("event_type") === "purchase")
      .select(col("event_id"), col("user_id"), col("ts"))
    val clicks = ev.filter(col("event_type") === "click")
      .select(col("event_id").as("click_id"), col("user_id"),
        col("ts").as("click_ts"))
    val joined = Joins.asOfJoinMerge(purchases, clicks, Seq("user_id"),
      "ts", "click_ts")

    // count(): one output row per left row, so the optimized plan must
    // not contain the join (nor the right side's scan) at all
    val counted = joined.groupBy().count()
    val countPlan = counted.queryExecution.optimizedPlan.toString
    countPlan should not include "AsofJoin"
    counted.head().getLong(0) shouldBe purchases.count()

    // left-only projection: same elimination, values identical to the
    // bare left side
    val leftOnly = joined.select("event_id", "user_id")
    leftOnly.queryExecution.optimizedPlan.toString should not include "AsofJoin"
    leftOnly.collect().sortBy(_.getLong(0)) shouldBe
      purchases.select("event_id", "user_id").collect().sortBy(_.getLong(0))

    // payload referenced -> join survives (elimination must not overfire)
    val withPayload = joined.select("event_id", "click_id")
    withPayload.queryExecution.optimizedPlan.toString should include ("AsofJoin")
    val agg = joined.groupBy().agg(
      org.apache.spark.sql.functions.count(col("click_id")))
    agg.queryExecution.optimizedPlan.toString should include ("AsofJoin")
  }

  test("asOfJoinMerge stays correct when an input arrives pre-partitioned " +
    "on a key subset (EnsureRequirements must re-align, not trust it)") {
    val rnd = new scala.util.Random(1357L)
    val l = (0 until 80).map(i => (rnd.nextInt(3).toLong,
      rnd.nextInt(4).toLong, rnd.nextInt(50).toLong, s"l$i"))
      .toDF("k1", "k2", "lts", "lv")
      .repartition(3, col("k1")) // subset of the join keys
    val r = (0 until 60).map(_ => (rnd.nextInt(3).toLong,
      rnd.nextInt(4).toLong, rnd.nextInt(50).toLong, rnd.nextInt(5)))
      .toDF("k1", "k2", "rts", "rv")
      .repartition(5, col("k2"), col("k1")) // reordered keys, other count
    val base = Joins.asOfJoinWindow(l, r, Seq("k1", "k2"), "lts", "rts", "r_")
    val merge = Joins.asOfJoinMerge(l, r, Seq("k1", "k2"), "lts", "rts", "r_")
    val ord = base.columns.map(col).toIndexedSeq
    merge.orderBy(ord: _*).collect().map(_.toSeq) shouldBe
      base.orderBy(ord: _*).collect().map(_.toSeq)
  }

  test("asOfJoinMerge rejects computed tolerances and non-mergeable ts " +
    "types loudly") {
    val l = Seq((1L, 10L, "x")).toDF("k", "lts", "lv")
    val r = Seq((1L, 5L, 9)).toDF("k", "rts", "rv")
    an[IllegalArgumentException] should be thrownBy
      Joins.asOfJoinMerge(l, r, Seq("k"), "lts", "rts",
        tolerance = Some(col("lts")))
    an[IllegalArgumentException] should be thrownBy
      Joins.asOfJoinMerge(l, r, Seq("k"), "lts", "rts",
        tolerance = Some(expr("INTERVAL '1' SECOND"))) // interval vs numeric ts
    val ls = Seq(("a", "2024-01-01", "x")).toDF("k", "lts", "lv")
    an[IllegalArgumentException] should be thrownBy
      Joins.asOfJoinMerge(ls, r, Seq("k"), "lts", "rts") // string ts column
  }

  test("asOfJoin front door DISPATCHES to the merge plan when the ts " +
    "types qualify, and falls back to the window plan for string ts " +
    "columns and computed tolerances — never an error") {
    val l = Seq((1L, 10L, "x"), (1L, 30L, "y")).toDF("k", "lts", "lv")
    val r = Seq((1L, 5L, 9), (1L, 25L, 7)).toDF("k", "rts", "rv")
    def finalPlan(df: org.apache.spark.sql.DataFrame): String = {
      df.collect()
      df.queryExecution.executedPlan.toString.split("== Initial Plan ==").head
    }
    // numeric ts, literal tolerance: the custom merge node
    val merged = Joins.asOfJoin(l, r, Seq("k"), "lts", "rts", "r_",
      tolerance = Some(lit(100L)))
    finalPlan(merged) should include ("AsofJoin")
    // string ts: orderable but not mergeable — window fallback
    val ls = Seq((1L, "2024-01-02", "x")).toDF("k", "lts", "lv")
    val rs = Seq((1L, "2024-01-01", 9)).toDF("k", "rts", "rv")
    val viaString = Joins.asOfJoin(ls, rs, Seq("k"), "lts", "rts", "r_")
    val sPlan = finalPlan(viaString)
    sPlan should not include "AsofJoin"
    sPlan should include ("Window")
    viaString.collect().map(r => (r.getLong(0), r.getInt(4))) shouldBe
      Array((1L, 9))
    // computed (column-dependent) tolerance: window fallback, and the
    // per-row bound is honored
    val computed = Joins.asOfJoin(l, r, Seq("k"), "lts", "rts", "r_",
      tolerance = Some(col("lts")))
    finalPlan(computed) should not include "AsofJoin"
    computed.collect().length shouldBe 2
  }

  test("NaN double timestamps behave exactly like NULL in BOTH " +
    "implementations: a NaN left ts yields a null match, a NaN right ts " +
    "is never a candidate — and the two plans stay row-identical") {
    val nan = Double.NaN
    val l = Seq(
      (1L, 10.0, "a"), (1L, nan, "b"), (1L, 30.0, "c"),
      (2L, nan, "d"), (3L, 5.0, "e")
    ).toDF("k", "lts", "lv")
    val r = Seq(
      (1L, 8.0, "r1"), (1L, nan, "rN"), (1L, 25.0, "r2"),
      (2L, 1.0, "r3"), (3L, nan, "r4")
    ).toDF("k", "rts", "rv")
    for (dir <- Seq("backward", "forward", "nearest");
         tol <- Seq(Option.empty[org.apache.spark.sql.Column], Some(lit(100.0)))) {
      val base = Joins.asOfJoinWindow(l, r, Seq("k"), "lts", "rts", "r_", dir, tol)
      val merge = Joins.asOfJoinMerge(l, r, Seq("k"), "lts", "rts", "r_",
        dir, tol)
      val ord = base.columns.map(col).toIndexedSeq
      withClue(s"dir=$dir tol=${tol.isDefined}: ") {
        val rows = base.orderBy(ord: _*).collect()
        // compare rendered rows: NaN != NaN under Seq equality, but the
        // parity claim includes the NaN rows
        merge.orderBy(ord: _*).collect().map(_.toString).toSeq shouldBe
          rows.map(_.toString).toSeq
        // NaN left rows carry a null match; key-3 rows never match the
        // NaN-only right side
        rows.filter(x => java.lang.Double.isNaN(x.getDouble(1)))
          .foreach(x => withClue(s"row $x: ") { x.isNullAt(3) shouldBe true })
        rows.filter(_.getLong(0) == 3L)
          .foreach(x => withClue(s"row $x: ") { x.isNullAt(3) shouldBe true })
      }
    }
  }
}
