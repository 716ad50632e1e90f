package graft

import org.apache.spark.sql.functions._

import graft.operators.{Joins, Sessions, Skew}

/** Stats-gated plain-vs-bucketed dispatch for the per-key-window family:
  * the sampled dominant-key share picks the plan the `asof_skew` probe
  * measured fastest at each distribution (plain at ≤10% share, bucketed
  * at 40%), and both branches stay row-identical. */
class SkewSpec extends SparkSpec {
  import spark.implicits._

  // 50k events across 500 users; `hotTenths` of all rows re-pinned to
  // user 1 — the asof_skew probe's construction at spec scale
  private def corpus(hotTenths: Int) = {
    val base = (0 until 50000).map { i =>
      (i.toLong, (i % 500).toLong, (i * 37L) % 1000000L, i % 7)
    }.toDF("event_id", "user_id", "ts", "value")
    if (hotTenths == 0) base
    else base.withColumn("user_id",
      when(pmod(col("event_id"), lit(10)) < hotTenths, lit(1L))
        .otherwise(col("user_id")))
  }

  test("dominantKeyShare estimates the hot share within sampling noise " +
    "and pickWindowStrategy lands on the MEASURED-best plan at both " +
    "asof_skew probe points (plain at uniform/10%, bucketed at 40%)") {
    val uni = corpus(0)
    val hot10 = corpus(1)
    val hot40 = corpus(4)
    Skew.dominantKeyShare(uni, Seq("user_id")) should be < 0.05
    Skew.dominantKeyShare(hot10, Seq("user_id")) shouldBe 0.10 +- 0.04
    Skew.dominantKeyShare(hot40, Seq("user_id")) shouldBe 0.40 +- 0.05
    Skew.pickWindowStrategy(uni, Seq("user_id")) shouldBe "plain"
    Skew.pickWindowStrategy(hot10, Seq("user_id")) shouldBe "plain"
    Skew.pickWindowStrategy(hot40, Seq("user_id")) shouldBe "bucketed"
    // empty input: degenerate share, plain plan, no crash
    Skew.dominantKeyShare(uni.limit(0), Seq("user_id")) shouldBe 0.0
    Skew.pickWindowStrategy(uni.limit(0), Seq("user_id")) shouldBe "plain"
  }

  test("sessionizeAuto is row-identical to sessionize at BOTH probe " +
    "points — the gate is purely a plan choice") {
    for (tenths <- Seq(0, 4)) {
      val ev = corpus(tenths).select(col("user_id"),
        timestamp_micros(col("ts") * 1000000L).as("ts"))
      val auto = Skew.sessionizeAuto(ev, Seq("user_id"), "ts", 1800L,
        Joins.timeBuckets(3600L))
      val plain = Sessions.sessionize(ev, Seq("user_id"), "ts", 1800L)
      val ord = plain.columns.map(col).toIndexedSeq :+ col("session_no")
      withClue(s"hotTenths=$tenths: ") {
        auto.orderBy(ord: _*).collect().map(_.toSeq) shouldBe
          plain.orderBy(ord: _*).collect().map(_.toSeq)
      }
    }
  }

  test("asOfJoinAuto is row-identical to asOfJoin at BOTH probe points, " +
    "sampling the UNION of both sides' keys") {
    for (tenths <- Seq(0, 4)) {
      val ev = corpus(tenths).withColumn("ts",
        timestamp_micros(col("ts") * 1000000L))
      val l = ev.filter(col("value") < 3)
        .select(col("event_id"), col("user_id"), col("ts"))
      val r = ev.filter(col("value") >= 3)
        .select(col("user_id"), col("ts").as("rts"), col("value"))
      val auto = Skew.asOfJoinAuto(l, r, Seq("user_id"), "ts", "rts",
        Joins.timeBuckets(3600L), rightPrefix = "r_")
      val plain = Joins.asOfJoin(l, r, Seq("user_id"), "ts", "rts", "r_")
      auto.columns.toSeq shouldBe plain.columns.toSeq
      val ord = plain.columns.map(col).toIndexedSeq
      withClue(s"hotTenths=$tenths: ") {
        auto.orderBy(ord: _*).collect().map(_.toSeq) shouldBe
          plain.orderBy(ord: _*).collect().map(_.toSeq)
      }
    }
  }
}
