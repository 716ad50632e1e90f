package graft

import org.apache.spark.sql.functions._

import graft.operators.Selection

class SelectionSpec extends SparkSpec {
  import spark.implicits._

  // (id, stratum, score, tokens)
  private val docs = Seq(
    (1L, "en", 0.9, 400L),
    (2L, "en", 0.8, 500L),
    (3L, "en", 0.7, 200L),  // would overflow: 400+500+200 > 1000
    (4L, "en", 0.6, 50L),   // ...and everything after the cut stays out
    (5L, "fr", 0.9, 1000L), // exactly fills the budget
    (6L, "fr", 0.8, 1L)
  ).toDF("doc_id", "stratum", "score", "n_tokens")

  private def select(budget: Long, maxDocs: Int = 0) =
    Selection.tokenBudgetPerStratum(docs, "stratum", "n_tokens", budget,
      rankBy = Seq(col("score").desc, col("doc_id")), maxDocs = maxDocs)

  test("quantileBinsPerStratum: equal-count bins under the rank order, first " +
    "bins take the remainder, aggregates are exact per (stratum, bin)") {
    // en has 4 docs over 3 bins -> bin 1 gets 2 rows (9,8), bins 2,3 one each;
    // fr has 2 docs over 3 bins -> bins 1,2 get one row each, bin 3 empty
    val out = Selection.quantileBinsPerStratum(docs, "stratum", "score",
      "n_tokens", rankBy = Seq(col("score").desc, col("doc_id")), bins = 3)
      .orderBy("stratum", "bin")
      .collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getDouble(4), r.getDouble(5)))
    out shouldBe Array(
      ("en", 1L, 2L, 900L, 0.8, 0.9),
      ("en", 2L, 1L, 200L, 0.7, 0.7),
      ("en", 3L, 1L, 50L, 0.6, 0.6),
      ("fr", 1L, 1L, 1000L, 0.9, 0.9),
      ("fr", 2L, 1L, 1L, 0.8, 0.8))
  }

  test("quantileBinsPerStratum with bins = 1 degenerates to one whole-stratum " +
    "row; nonpositive bins is rejected") {
    val one = Selection.quantileBinsPerStratum(docs, "stratum", "score",
      "n_tokens", rankBy = Seq(col("score").desc, col("doc_id")), bins = 1)
      .orderBy("stratum").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    one shouldBe Array(("en", 1L, 4L, 1150L), ("fr", 1L, 2L, 1001L))
    an[IllegalArgumentException] should be thrownBy
      Selection.quantileBinsPerStratum(docs, "stratum", "score", "n_tokens",
        rankBy = Seq(col("score").desc), bins = 0)
  }

  test("quantileBinsApproxPerStratum preserves totals, orders bin score " +
    "ranges strictly, and tracks equal counts on distinct scores") {
    val df = (1 to 30).map(i => (i.toLong, "en", i / 100.0, 10L))
      .toDF("doc_id", "stratum", "score", "n_tokens")
    val out = Selection.quantileBinsApproxPerStratum(df, "stratum", "score",
      "n_tokens", bins = 3).orderBy("bin").collect()
      .map(r => (r.getLong(1), r.getLong(2), r.getDouble(4), r.getDouble(5)))
    out.map(_._1) shouldBe Array(1L, 2L, 3L)
    out.map(_._2).sum shouldBe 30L // every row lands in exactly one bin
    // sketch-error-independent invariant: min of a better bin strictly
    // above max of the adjacent worse bin
    out.sliding(2).foreach { case Array(better, worse) =>
      better._3 should be > worse._4
    }
    // near-equal counts on fully distinct scores
    out.foreach(_._2.toDouble shouldBe 10.0 +- 2.0)
  }

  test("quantileBinsApproxPerStratum never splits ties: an all-equal " +
    "stratum collapses into the single worst bin") {
    val df = (1 to 12).map(i => (i.toLong, "en", 0.5, 1L))
      .toDF("doc_id", "stratum", "score", "n_tokens")
    val out = Selection.quantileBinsApproxPerStratum(df, "stratum", "score",
      "n_tokens", bins = 4).collect()
    out.length shouldBe 1
    out.head.getLong(1) shouldBe 4L // score == every threshold -> worst bin
    out.head.getLong(2) shouldBe 12L
  }

  test("quantileBinsApproxPerStratum sends NULL-score rows to a NULL bin " +
    "(not silently the worst bin), preserving totals; same in bins = 1") {
    val df = ((1 to 9).map(i => (i.toLong, "en", Some(i / 10.0), 10L)) :+
      (10L, "en", None: Option[Double], 7L))
      .toDF("doc_id", "stratum", "score", "n_tokens")
    val out = Selection.quantileBinsApproxPerStratum(df, "stratum", "score",
      "n_tokens", bins = 3).collect()
      .map(r => (if (r.isNullAt(1)) null else r.getLong(1), r.getLong(2), r.getLong(3)))
    val nullBin = out.filter(_._1 == null)
    nullBin.length shouldBe 1
    nullBin.head._2 shouldBe 1L // the one NULL-score row, nowhere else
    nullBin.head._3 shouldBe 7L
    out.map(_._2).sum shouldBe 10L // totals still preserved
    out.filter(_._1 != null).map(_._2).sum shouldBe 9L
    val one = Selection.quantileBinsApproxPerStratum(df, "stratum", "score",
      "n_tokens", bins = 1).collect()
      .map(r => (if (r.isNullAt(1)) null else r.getLong(1), r.getLong(2)))
    one.toSet shouldBe Set((1L, 9L), (null, 1L))
  }

  test("keeps best docs per stratum while the running token total fits; " +
    "the overflowing doc and everything ranked after it are cut") {
    val kept = select(1000L).select("doc_id", "cum_tokens")
      .as[(Long, Long)].collect().toMap
    kept shouldBe Map(1L -> 400L, 2L -> 900L, 5L -> 1000L)
  }

  test("budget boundary is inclusive and per-stratum independent") {
    // en: 400+500+200 = 1100 fits a 1100 budget exactly; fr unaffected
    val kept = select(1100L).select("doc_id").as[Long].collect().sorted
    kept shouldBe Array(1L, 2L, 3L, 5L, 6L)
  }

  test("maxDocs pre-cut bounds each stratum before the running sum and " +
    "plans a WindowGroupLimit") {
    val cut = select(1000L, maxDocs = 2)
    cut.select("doc_id").as[Long].collect().sorted shouldBe Array(1L, 2L, 5L)
    cut.queryExecution.executedPlan.toString should include("WindowGroupLimit")
  }

  test("topFractionPerStratum keeps the best fraction per stratum under " +
    "percent_rank; fraction 0 keeps exactly the best row of each stratum") {
    // en pr: doc1=0, doc2=1/3, doc3=2/3, doc4=1; fr pr: doc5=0, doc6=1
    def frac(f: Double) = Selection
      .topFractionPerStratum(docs, "stratum", f,
        rankBy = Seq(col("score").desc, col("doc_id")))
      .select("doc_id").as[Long].collect().sorted
    frac(0.34) shouldBe Array(1L, 2L, 5L)
    frac(0.0) shouldBe Array(1L, 5L)
    frac(1.0) shouldBe Array(1L, 2L, 3L, 4L, 5L, 6L)
  }

  test("topFractionApproxPerStratum (the no-sort scale path) keeps every " +
    "exact-top row and overshoots by at most the quantile ties") {
    val approx = Selection
      .topFractionApproxPerStratum(docs, "stratum", "score", 0.5)
      .select("doc_id").as[Long].collect().sorted
    // exact top half: en {1,2} of 4, fr {5} of 2 (quantile boundary may
    // also admit the threshold row itself — ties at the cut are kept)
    approx.toSet should contain allOf (1L, 2L, 5L)
    approx.length should be <= 5
    // every kept row scores >= some kept threshold; the worst row of a
    // stratum can only appear if the whole stratum is kept
    approx should not contain 4L
  }

  test("PROPERTY: approx top-fraction is a superset of the exact top " +
    "fraction and never admits a row below the kept threshold — including " +
    "tied scores, single-element strata, and all-equal strata") {
    import org.scalacheck.Gen
    import org.scalacheck.rng.Seed
    // adversarial score pool: heavy ties (few distinct values), plus
    // all-equal and single-row strata arise naturally from the generator
    val rowsGen: Gen[List[(Long, String, Double)]] = for {
      n <- Gen.choose(1, 40)
      rows <- Gen.listOfN(n, for {
        stratum <- Gen.oneOf("en", "fr", "de")
        score <- Gen.oneOf(0.0, 0.25, 0.25, 0.5, 1.0) // deliberate tie mass
      } yield (stratum, score))
    } yield rows.zipWithIndex.map { case ((s, sc), i) => (i.toLong, s, sc) }
    val fracGen = Gen.oneOf(0.0, 0.1, 0.5, 0.9, 1.0)
    for (i <- 0 until 12) {
      val rows = rowsGen(Gen.Parameters.default, Seed(7L + i)).get
      val fraction = fracGen(Gen.Parameters.default, Seed(100L + i)).get
      val df = rows.toDF("doc_id", "stratum", "score")
      // exact variant ranks by score desc (doc_id tie-break) — the approx
      // variant thresholds on score alone, so exact-kept MODULO ties must
      // survive; with accuracy high enough the quantile is exact here
      val exact = Selection.topFractionPerStratum(df, "stratum", fraction,
          rankBy = Seq(col("score").desc, col("doc_id")))
        .select("doc_id", "stratum", "score")
        .as[(Long, String, Double)].collect()
      val approx = Selection.topFractionApproxPerStratum(
          df, "stratum", "score", fraction)
        .select("doc_id", "stratum", "score")
        .as[(Long, String, Double)].collect()
      val approxIds = approx.map(_._1).toSet
      // (1) superset of exact: every exactly-kept row is approx-kept
      //     (ties at the cut are kept, never dropped)
      withClue(s"seed $i fraction $fraction exact-not-in-approx: ") {
        exact.filterNot(r => approxIds(r._1)) shouldBe empty
      }
      // (2) per-stratum threshold soundness: kept rows all score >= the
      //     stratum's minimum kept score, and every row tying a kept
      //     score is kept (no nondeterministic tie split)
      approx.groupBy(_._2).foreach { case (stratum, kept) =>
        val thr = kept.map(_._3).min
        val all = rows.filter(_._2 == stratum)
        withClue(s"seed $i stratum $stratum ties at $thr: ") {
          all.filter(_._3 >= thr).map(_._1).toSet shouldBe
            kept.map(_._1).toSet
        }
      }
      // (3) every nonempty stratum keeps at least one row
      approx.map(_._2).toSet shouldBe rows.map(_._2).toSet
    }
  }

  test("zero-token docs are excluded either way, so setting maxDocs never " +
    "changes which docs are selected") {
    // doc 7 ranks ABOVE the en cut, docs 8/9 rank past any maxDocs pre-cut;
    // before the up-front filter, maxDocs=3 dropped 8/9 while the pure
    // running sum kept them for free (they add no tokens) — two configs,
    // two different answers on the same corpus.
    val withEmpties = docs.union(Seq(
      (7L, "en", 0.95, 0L),
      (8L, "en", 0.05, 0L),
      (9L, "fr", 0.01, 0L)
    ).toDF("doc_id", "stratum", "score", "n_tokens"))
    def sel(maxDocs: Int) = Selection
      .tokenBudgetPerStratum(withEmpties, "stratum", "n_tokens", 1000L,
        rankBy = Seq(col("score").desc, col("doc_id")), maxDocs = maxDocs)
      .select("doc_id").as[Long].collect().sorted
    sel(0) shouldBe Array(1L, 2L, 5L)
    sel(3) shouldBe sel(0)
  }

  test("sampleExactPerStratum keeps exactly n per stratum (all rows when " +
    "the stratum is smaller), deterministically, via a WindowGroupLimit") {
    val df = ((0L until 50L).map(i => (i, "big")) ++
      (100L until 103L).map(i => (i, "small"))).toDF("id", "g")
    val q = Selection.sampleExactPerStratum(df, "g", "id", n = 10)
    val got = q.select("g", "id").as[(String, Long)].collect()
    got.count(_._1 == "big") shouldBe 10
    got.count(_._1 == "small") shouldBe 3
    // reproducible row-for-row
    Selection.sampleExactPerStratum(df, "g", "id", n = 10)
      .select("g", "id").as[(String, Long)].collect()
      .sorted shouldBe got.sorted
    // rank<=n pre-cuts per task before the exchange
    q.queryExecution.executedPlan.toString should include("WindowGroupLimit")
  }

  test("sampleStrataJoin == sampleStrata for the same recipe (identical " +
    "survivors via the same md5 coin), handles unlisted strata through " +
    "defaultRate, and rejects out-of-range rates engine-side") {
    val docs = spark.read.parquet(s"$sf/documents.parquet")
      .select("doc_id", "lang")
    val recipe = Map("en" -> 0.9, "fr" -> 0.25, "es" -> 1.0, "zh" -> 0.0)
    val ratesDf = recipe.toSeq.toDF("lang", "rate")
    val viaCase = Selection.sampleStrata(docs, "lang", "doc_id",
      recipe, defaultRate = 0.5).select("doc_id").as[Long].collect().sorted
    val viaJoin = Selection.sampleStrataJoin(docs, "lang", "doc_id",
      ratesDf, defaultRate = 0.5).select("doc_id").as[Long].collect().sorted
    viaJoin shouldBe viaCase
    viaJoin.length should be > 0
    // an out-of-range rate in the DATA fails at evaluation, not silently
    val bad = Seq(("en", 1.5)).toDF("lang", "rate")
    intercept[Exception] {
      Selection.sampleStrataJoin(docs, "lang", "doc_id", bad).count()
    }.getMessage should include("out of [0,1]")
  }

  test("sampleStrataJoin rejects a data-derived rate map with duplicate " +
    "stratum rows (the join would silently duplicate survivors) and with " +
    "NULL rates (a null coin comparison would silently drop the stratum)") {
    val docs = spark.read.parquet(s"$sf/documents.parquet")
      .select("doc_id", "lang")
    val dup = Seq(("en", 0.5), ("en", 0.9), ("fr", 0.25)).toDF("lang", "rate")
    intercept[Exception] {
      Selection.sampleStrataJoin(docs, "lang", "doc_id", dup).count()
    }.getMessage should include("duplicate rate rows")
    val withNull = Seq(("en", Option(0.5)), ("fr", Option.empty[Double]))
      .toDF("lang", "rate")
    intercept[Exception] {
      Selection.sampleStrataJoin(docs, "lang", "doc_id", withNull).count()
    }.getMessage should include("NULL rate")
  }

  test("sampleStrata rejects a rate map beyond the recipe-strata bound " +
    "(the CASE chain is recipe-sized by contract, not by hope) and the " +
    "error points at the join-based alternative") {
    val bound = Selection.MaxRecipeStrata
    bound should be >= 200 // a per-language recipe (~200 languages) fits
    val df = Seq((1L, "en")).toDF("doc_id", "stratum")
    val oversized = (0 to bound).map(i => s"s$i" -> 0.5).toMap
    val err = intercept[IllegalArgumentException] {
      Selection.sampleStrata(df, "stratum", "doc_id", oversized)
    }
    err.getMessage should include(bound.toString)
    err.getMessage should include("sampleStrataJoin")
    // the boundary itself is fine
    val atBound = (1 until bound).map(i => s"s$i" -> 1.0).toMap
    Selection.sampleStrata(df, "stratum", "doc_id", atBound + ("en" -> 1.0))
      .count() shouldBe 1L
  }
}
