package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Gap-based sessionization as an operator (the `sessionize` contract's
  * lag + running-sum composition, extracted), plus the hot-key time-bucket
  * variant — the [[Joins.asOfJoinBucketed]] treatment applied to the
  * other heavy per-key-window shape `asof_skew` measures: at a 40%-share
  * key the plain window is a 4.8× straggler even at local widths, and a
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
    val live = df.filter(col(tsCol).isNotNull)
    val w = Window.partitionBy(keys.map(col): _*).orderBy(col(tsCol))
    val run = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val out = live
      .withColumn("__prev", lag(col(tsCol), 1).over(w))
      .withColumn("__new", (col("__prev").isNull ||
        (unix_micros(col(tsCol)) - unix_micros(col("__prev"))) >
          lit(gapSec * 1000000L)).cast("long"))
      .withColumn("session_no", sum(col("__new")).over(run))
      .drop("__prev", "__new")
    withNullTsRows(df, out, tsCol)
  }

  /** [[sessionize]] with the per-key window split across TIME buckets —
    * row-identical output (property-pinned in `SessionsSpec`), different
    * plan: the per-row sort+window runs per (key, bucket), so a
    * dominant-share key parallelizes across its buckets; the cross-bucket
    * state (previous bucket's last timestamp, cumulative session count)
    * travels through a relation with ONE row per non-empty (key, bucket),
    * thousands of times smaller than the corpus — the classic two-phase
    * prefix-sum shape. `bucketOf` must be MONOTONE in the timestamp
    * ([[Joins.timeBuckets]]); monotonicity also guarantees equal
    * timestamps share a bucket, so the tie rule is inherited unchanged.
    * Costs one bucket-aggregate pass and a small join over the plain
    * form — reach for it when one key dominates, not by default (the
    * [[Joins.asOfJoinBucketed]] guidance). MEASURED (SCALEPROBE.json
    * `asof_skew`, 5M events, hourly buckets): at a 40%-share key 2.0×
    * faster than the plain window (hot ratio 4.1× → 2.0×), at ~2.3×
    * overhead on uniform data; at a 10% key the plain window still
    * wins. */
  def sessionizeBucketed(df: DataFrame, keys: Seq[String], tsCol: String,
                         gapSec: Long,
                         bucketOf: Column => Column): DataFrame = {
    require(gapSec >= 0, s"gapSec must be >= 0, got $gapSec")
    require(!df.columns.exists(_.startsWith("__s")),
      "columns starting with __s collide with sessionization internals")
    val gapUs = gapSec * 1000000L
    val live = df.filter(col(tsCol).isNotNull)
      .withColumn("__sbk", bucketOf(col(tsCol)))
    val wb = Window.partitionBy((keys :+ "__sbk").map(col): _*)
      .orderBy(col(tsCol))
    // pass 1: within-bucket flags; each bucket's FIRST row stays
    // unresolved (null) — its predecessor lives in an earlier bucket
    val rows1 = live
      .withColumn("__sprev", lag(col(tsCol), 1).over(wb))
      .withColumn("__sflag", when(col("__sprev").isNotNull,
        ((unix_micros(col(tsCol)) - unix_micros(col("__sprev"))) > gapUs)
          .cast("long")))
      .drop("__sprev")
    // bucket relation: one row per non-empty (key, bucket) — first/last
    // event ts and the resolved-in-bucket new-session count
    val wk = Window.partitionBy(keys.map(col): _*).orderBy(col("__sbk"))
    val stats = rows1.groupBy((keys :+ "__sbk").map(col): _*)
      .agg(min(col(tsCol)).as("__sfirst"), max(col(tsCol)).as("__slast"),
        sum(coalesce(col("__sflag"), lit(0L))).as("__sinner"))
      // cross-bucket state, all over the tiny relation: the previous
      // non-empty bucket's last ts resolves this bucket's first-row flag;
      // the running sum of per-bucket session starts numbers the offset
      .withColumn("__splast", lag(col("__slast"), 1).over(wk))
      .withColumn("__sfflag", when(col("__splast").isNull, lit(1L))
        .otherwise(((unix_micros(col("__sfirst")) -
          unix_micros(col("__splast"))) > gapUs).cast("long")))
      .withColumn("__soff", coalesce(sum(col("__sinner") + col("__sfflag"))
        .over(wk.rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
      .select((keys :+ "__sbk").map(col) :+ col("__splast") :+
        col("__soff"): _*)
    // pass 2: resolve first-row flags, add the bucket offset to the
    // within-bucket running sum — same (key, bucket) partitioning as
    // pass 1, so the expensive exchanges stay bucket-split
    val runb = wb.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val out = rows1.join(stats, keys :+ "__sbk")
      .withColumn("__sres", coalesce(col("__sflag"),
        when(col("__splast").isNull, lit(1L))
          .otherwise(((unix_micros(col(tsCol)) -
            unix_micros(col("__splast"))) > gapUs).cast("long"))))
      .withColumn("session_no",
        col("__soff") + sum(col("__sres")).over(runb))
      .drop("__sbk", "__sflag", "__splast", "__soff", "__sres")
    withNullTsRows(df, out, tsCol)
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
