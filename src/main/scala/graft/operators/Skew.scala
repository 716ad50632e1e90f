package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Stats-gated plain-vs-bucketed dispatch for the per-key-window family
  * (as-of carry, sessionization, gap-fill).
  *
  * The bucketed escape hatches ([[Joins.asOfJoinBucketed]],
  * [[Sessions.sessionizeBucketed]]) beat the plain forms ONLY when one
  * key holds a dominant share of the corpus — measured (SCALEPROBE.json
  * `asof_skew`, 5M events): at a 40%-share key they win ~1.4×; at a
  * 10%-share key (and on uniform data) the plain single-window forms win
  * clearly, because the bucketed plans pay a distinct pass plus two
  * extra (small) joins. Callers rarely know their key distribution in
  * advance, so the `*Auto` front doors here measure it: ONE column-pruned
  * pass estimates the dominant key's share via a Misra-Gries
  * heavy-hitter summary ([[dominantKeyShare]] — map-side partial
  * aggregation, only ≤`sketchK`-entry buffers cross the exchange; a
  * one-key-column scan against the full-row shuffle+sort it gates,
  * measured in SCALEPROBE `skew_autostrategy`), and the share gates the
  * plan at [[HotKeyShareThreshold]].
  * The decision and its inputs are logged, the same discipline as
  * `Dedup.autoStrategy`; both branches are row-identical
  * (property-pinned), so the gate is purely a plan choice. */
object Skew {

  private lazy val log =
    org.slf4j.LoggerFactory.getLogger("graft.operators.Skew")

  /** Share of rows on the hottest key above which the bucketed plan is
    * dispatched. From the `asof_skew` measurements: plain wins at a 10%
    * share, bucketed wins at 40% — the gate sits between, biased high
    * because the bucketed forms' overhead is certain while their win
    * needs genuine dominance (and the sketch's ≤1.6% undercount cannot
    * flip a decision that matters). The measured win also presumes the
    * hot key's single-task window is the job's wall — the large-corpus
    * regime the escape hatches exist for; at small volumes plain wins
    * regardless and a misfire costs the bucketed overhead, not
    * correctness. */
  val HotKeyShareThreshold: Double = 0.25

  /** Estimated share of rows held by the MOST FREQUENT key, in ONE
    * column-pruned pass: a Misra-Gries heavy-hitter summary over the
    * (string-encoded) key plus a row count in the SAME aggregation —
    * map-side partial aggregation reduces every task to a ≤`sketchK`-
    * entry buffer, so only buffers cross the exchange and no per-key
    * vocabulary ever shuffles (the `heavy_hitters` machinery reused as
    * a planner statistic). The MG counter is a lower bound with
    * undercount ≤ n/(sketchK+1) — ≤1.6% at the default 64, irrelevant
    * against a 0.25 gate separating measured 0.10-loses from
    * 0.40-wins. NULL keys group together (sentinel-encoded), exactly as
    * `Window.partitionBy` partitions them; the composite string
    * encoding is for COUNTING only, so its theoretical separator
    * collisions can at worst nudge a share estimate, never results. */
  private[graft] def dominantKeyShare(df: DataFrame, keys: Seq[String],
                                      sketchK: Int = 64): Double = {
    require(keys.nonEmpty, "at least one key column")
    require(sketchK >= 8, "sketchK must be >= 8")
    val keyStr = concat_ws("\u0001",
      keys.map(c => coalesce(col(c).cast("string"), lit("\u0000null"))): _*)
    val row = df
      .select(array(keyStr).as("__k1"))
      .agg(graft.functions.MisraGriesAgg(col("__k1"), sketchK).as("__mg"),
        count(lit(1)).as("__n"))
      .head()
    val n = row.getLong(1)
    val mg = row.getSeq[org.apache.spark.sql.Row](0)
    if (n == 0L || mg.isEmpty) 0.0
    // summary is sorted (count desc, item): head is the dominant key
    else mg.head.getLong(1).toDouble / n
  }

  /** The gate itself, factored for spec pinning: `"bucketed"` iff the
    * sampled dominant-key share reaches `threshold`. */
  private[graft] def pickWindowStrategy(df: DataFrame, keys: Seq[String],
      sketchK: Int = 64,
      threshold: Double = HotKeyShareThreshold): String = {
    val share = dominantKeyShare(df, keys, sketchK)
    val chosen = if (share >= threshold) "bucketed" else "plain"
    log.info(s"per-key-window strategy=auto: sampled dominant-key share " +
      f"$share%.3f vs threshold $threshold%.2f -> $chosen")
    chosen
  }

  /** [[Joins.asOfJoin]] with the plain-vs-bucketed plan picked by the
    * sampled key share of BOTH inputs together (the carry's window runs
    * over their union, so that is the distribution that straggles).
    * Requires the bucketed form's preconditions only when it is chosen;
    * `bucketOf` must be monotone ([[Joins.timeBuckets]]). */
  def asOfJoinAuto(left: DataFrame, right: DataFrame, keys: Seq[String],
                   leftTs: String, rightTs: String,
                   bucketOf: Column => Column,
                   rightPrefix: String = "",
                   direction: String = "backward",
                   tolerance: Option[Column] = None,
                   sketchK: Int = 64,
                   threshold: Double = HotKeyShareThreshold): DataFrame = {
    val keyRows = left.select(keys.map(col): _*)
      .unionByName(right.select(keys.map(col): _*))
    pickWindowStrategy(keyRows, keys, sketchK, threshold) match {
      case "bucketed" =>
        Joins.asOfJoinBucketed(left, right, keys, leftTs, rightTs,
          bucketOf, rightPrefix, direction, tolerance)
      case _ =>
        Joins.asOfJoin(left, right, keys, leftTs, rightTs, rightPrefix,
          direction, tolerance)
    }
  }

  /** [[Sessions.sessionize]] with the plan picked by the sampled key
    * share. */
  def sessionizeAuto(df: DataFrame, keys: Seq[String], tsCol: String,
                     gapSec: Long, bucketOf: Column => Column,
                     sketchK: Int = 64,
                     threshold: Double = HotKeyShareThreshold): DataFrame =
    pickWindowStrategy(df, keys, sketchK, threshold) match {
      case "bucketed" =>
        Sessions.sessionizeBucketed(df, keys, tsCol, gapSec, bucketOf)
      case _ => Sessions.sessionize(df, keys, tsCol, gapSec)
    }
}
