package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Gap-based sessionization as an operator (the `sessionize` contract's
  * lag + running-sum composition, extracted), plus the hot-key time-bucket
  * variant — the [[Joins.asOfJoinBucketed]] treatment applied to the
  * other heavy per-key-window shape `asof_skew` measures: at a 40%-share
  * key the plain window is a ~4× straggler even at local widths, and a
  * salt can never fix it because session numbering is a running sum over
  * the within-key event order.
  */
object Sessions {

  /** Append `session_no` (1-based, per key): a new session starts at the
    * first event and at every event whose gap from its predecessor
    * exceeds `gapSec`. One exchange + one window sort on `keys` — the
    * hot key is one task ([[Joins.asOfJoin]]'s documented SKEW bound;
    * use [[sessionizeBucketed]] when one key dominates). Events with a
    * NULL timestamp get a NULL `session_no` and do not perturb the
    * numbering of real events (both variants share this rule, so they
    * stay row-identical on dirty data). Ties at one timestamp share a
    * session regardless of their arbitrary within-tie order, so the
    * output is deterministic. */
  def sessionize(df: DataFrame, keys: Seq[String], tsCol: String,
                 gapSec: Long): DataFrame = {
    require(gapSec >= 0, s"gapSec must be >= 0, got $gapSec")
    requireNoInternalCollisions(df)
    val live = df.filter(col(tsCol).isNotNull)
    val w = Window.partitionBy(keys.map(col): _*).orderBy(col(tsCol))
    val run = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val out = live
      .withColumn("__sprev", lag(col(tsCol), 1).over(w))
      .withColumn("__snew", (col("__sprev").isNull ||
        (unix_micros(col(tsCol)) - unix_micros(col("__sprev"))) >
          lit(gapSec * 1000000L)).cast("long"))
      .withColumn("session_no", sum(col("__snew")).over(run))
      .drop("__sprev", "__snew")
    withNullTsRows(df, out, tsCol)
  }

  /** [[sessionize]] with the per-key window split across TIME buckets —
    * row-identical output (property-pinned in `SessionsSpec`), different
    * plan: the heavy sort+window runs per (key, bucket), so a
    * dominant-share key parallelizes across its buckets; the cross-bucket
    * state (previous bucket's last timestamp, cumulative session count)
    * travels through a relation with ONE row per non-empty (key, bucket),
    * thousands of times smaller than the corpus — the classic two-phase
    * prefix-sum shape, computed over the key's DISTINCT timestamps (ties
    * share a session by definition, so numbering is a function of the
    * distinct-ts sequence; working on it makes every window sort total
    * and the result independent of how any exchange orders tied rows).
    * `bucketOf` must be MONOTONE in the timestamp ([[Joins.timeBuckets]]).
    * Costs a distinct pass and two small joins over the plain form —
    * reach for it when one key dominates, not by default (the
    * [[Joins.asOfJoinBucketed]] guidance). MEASURED (SCALEPROBE.json
    * `asof_skew`, 5M events, hourly buckets, near-unique fixture
    * timestamps — the distinct pass's worst case): at a 40%-share key
    * 1.4× faster than the plain window (hot ratio 4.3× → 3.0×), at ~4×
    * overhead on uniform data; at a 10% key the plain window wins
    * clearly. The gap widens with cluster width (the straggler scales
    * with executors; the distinct pass stays fully parallel) and with
    * real timestamp collision rates. */
  def sessionizeBucketed(df: DataFrame, keys: Seq[String], tsCol: String,
                         gapSec: Long,
                         bucketOf: Column => Column): DataFrame = {
    require(gapSec >= 0, s"gapSec must be >= 0, got $gapSec")
    requireNoInternalCollisions(df)
    val gapUs = gapSec * 1000000L
    // Session numbering is a function of the key's DISTINCT timestamps
    // alone (a tie run shares one session: only the gap from the previous
    // DISTINCT ts can start one), so the whole computation runs on the
    // distinct-ts relation and rows join their timestamp's number back at
    // the end. This is what makes the two-phase plan ORDER-INDEPENDENT:
    // every window below orders by a ts that is UNIQUE within its
    // partition, so no exchange between the passes can reorder ties out
    // from under a running sum (the hazard of numbering per-row when a
    // flag rides on one arbitrary member of a tie run).
    val live = df.filter(col(tsCol).isNotNull)
      .withColumn("__sbk", bucketOf(col(tsCol)))
    val dist = live.select((keys :+ "__sbk").map(col) :+ col(tsCol): _*)
      .distinct()
    val wb = Window.partitionBy((keys :+ "__sbk").map(col): _*)
      .orderBy(col(tsCol))
    // pass 1: within-bucket boundary flags over distinct ts; each
    // bucket's FIRST distinct ts stays unresolved (null) — its
    // predecessor lives in an earlier bucket
    val flags = dist
      .withColumn("__sprev", lag(col(tsCol), 1).over(wb))
      .withColumn("__sflag", when(col("__sprev").isNotNull,
        ((unix_micros(col(tsCol)) - unix_micros(col("__sprev"))) > gapUs)
          .cast("long")))
      .drop("__sprev")
    // bucket relation: one row per non-empty (key, bucket) — first/last
    // distinct ts and the resolved-in-bucket session-start count
    val wk = Window.partitionBy(keys.map(col): _*).orderBy(col("__sbk"))
    val stats = flags.groupBy((keys :+ "__sbk").map(col): _*)
      .agg(min(col(tsCol)).as("__sfirst"), max(col(tsCol)).as("__slast"),
        sum(coalesce(col("__sflag"), lit(0L))).as("__sinner"))
      // cross-bucket state, all over the tiny relation: the previous
      // non-empty bucket's last ts resolves this bucket's first flag;
      // the running sum of per-bucket session starts numbers the offset
      .withColumn("__splast", lag(col("__slast"), 1).over(wk))
      .withColumn("__sfflag", when(col("__splast").isNull, lit(1L))
        .otherwise(((unix_micros(col("__sfirst")) -
          unix_micros(col("__splast"))) > gapUs).cast("long")))
      .withColumn("__soff", coalesce(sum(col("__sinner") + col("__sfflag"))
        .over(wk.rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
      .select((keys :+ "__sbk").map(col) :+ col("__splast") :+
        col("__soff"): _*)
    // pass 2: resolve first flags, add the bucket offset to the
    // within-bucket running sum — still over distinct ts (unique within
    // the partition, so the sort is total and the sum deterministic).
    // Joins on the key columns are NULL-SAFE (<=>): Window.partitionBy
    // groups NULL keys like any other value, so the plain variant
    // numbers them — a null-unsafe join here would silently DROP every
    // NULL-key row instead.
    def renamed(d: DataFrame, p: String): DataFrame =
      d.select(d.columns.map(c => col(c).as(p + c)).toIndexedSeq: _*)
    def nullSafeOn(p: String, cols: Seq[String]) =
      cols.map(c => col(c) <=> col(p + c)).reduce(_ && _)
    val runb = wb.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val st = renamed(stats, "__sj_")
    val numbered = flags
      .join(st, nullSafeOn("__sj_", keys) && col("__sbk") <=> col("__sj___sbk"))
      .withColumn("__sres", coalesce(col("__sflag"),
        when(col("__sj___splast").isNull, lit(1L))
          .otherwise(((unix_micros(col(tsCol)) -
            unix_micros(col("__sj___splast"))) > gapUs).cast("long"))))
      .withColumn("session_no",
        col("__sj___soff") + sum(col("__sres")).over(runb))
      .select((keys :+ "__sbk").map(col) :+ col(tsCol) :+
        col("session_no"): _*)
    // rows fetch their timestamp's number; output keeps the INPUT column
    // order (a using-join would lead with the join keys)
    val nb = renamed(numbered, "__sn_")
    val out = live
      .join(nb, nullSafeOn("__sn_", keys) &&
        col("__sbk") <=> col("__sn___sbk") &&
        col(tsCol) === col("__sn_" + tsCol))
      .select(df.columns.map(col) :+ col("__sn_session_no").as("session_no"): _*)
    withNullTsRows(df, out, tsCol)
  }

  /** Both variants stage internals in `__s`-prefixed columns and emit
    * `session_no`; an input already using either would be silently
    * clobbered (plain) or fail on an ambiguous reference (bucketed), so
    * both are rejected up front. */
  private def requireNoInternalCollisions(df: DataFrame): Unit = {
    require(!df.columns.exists(_.startsWith("__s")),
      "columns starting with __s collide with sessionization internals")
    require(!df.columns.contains("session_no"),
      "input already has a session_no column; rename it first")
  }

  /** NULL-timestamp rows re-enter with a NULL `session_no` — excluded
    * from the numbering entirely, so dirty rows cannot shift real
    * sessions (and both variants agree on them trivially). */
  private def withNullTsRows(df: DataFrame, out: DataFrame,
                             tsCol: String): DataFrame = {
    val nulls = df.filter(col(tsCol).isNull)
      .withColumn("session_no", lit(null).cast("long"))
    out.unionByName(nulls)
  }
}
