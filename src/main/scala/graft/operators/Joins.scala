package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Join shapes beyond Spark's built-ins: as-of (time-travel) joins and a
  * skew-defeating salted equi-join. Both are pure DataFrame compositions —
  * no custom physical operators — chosen for their scale behavior.
  */
object Joins {

  /** As-of join: for every left row, attach the single right row with the
    * greatest `rightTs` ≤ the left row's `leftTs` (`direction =
    * "backward"`, the default — the market-data/event-attribution
    * semantic), the smallest `rightTs` ≥ `leftTs` (`direction =
    * "forward"`, next-event attribution), or whichever of the two is
    * closer in time (`direction = "nearest"`; equidistant ties take the
    * backward match), matching on `keys`.
    *
    * Implementation is the scalable union-and-carry pattern, NOT a per-row
    * range probe: tag both inputs, union them, and run ONE window pass
    * partitioned by key and ordered by (ts, side) — descending ts for the
    * forward direction — where right rows sort before left rows at equal
    * timestamps (so `ts_right == ts_left` matches inclusively either
    * way). `last(_, ignoreNulls)` over an unbounded-preceding frame
    * carries the nearest right payload into each left row. Cost: a
    * single shuffle+sort on the key — the same price as one sort-merge
    * join — with no range-explosion, no skew amplification beyond the key
    * distribution itself. `nearest` computes both carries over ONE
    * exchange (two sorts of the same partitioning) and picks the closer
    * match scan-side.
    *
    * `tolerance` (optional) bounds the match distance: a carried match
    * whose |leftTs − rightTs| exceeds it is nulled out (the row keeps
    * left-outer semantics rather than disappearing). It is compared
    * against the ts DIFFERENCE in the ts columns' own algebra — pass
    * `expr("INTERVAL '300' SECOND")` for timestamp columns, a numeric
    * literal for numeric ts columns. Evaluated post-window, so it costs
    * one scan-side projection, never a second exchange.
    *
    * Right columns (except keys/ts) are appended with `rightPrefix`; left
    * rows with no matching right row get nulls (left-outer semantics).
    * Ties (several right rows at one ts) resolve to the greatest payload
    * struct when the payload type is orderable, else arbitrarily.
    *
    * SKEW: the exchange is on `keys` alone, so a hot key is one straggler
    * partition doing that key's share of the sort+carry. Measured
    * (SCALEPROBE.json `asof_skew`, 5M events, a planted key holding 10%
    * of ALL rows): wall 1.36x the uniform-key corpus for this join —
    * 1.48x for the sessionize window, 1.27x for the gap-fill composition,
    * the whole per-key-window family sharing the bound. Degradation is
    * PROPORTIONAL to the hot share (one task's work), never quadratic, so
    * a salted two-phase carry (second exchange for every caller) is not
    * implemented; if one key ever dominates the corpus outright, split
    * that key upstream (e.g. sub-key by time bucket) rather than salting
    * the carry — a salt would break the within-key total order this
    * operator's semantics rest on. */
  def asOfJoin(left: DataFrame, right: DataFrame, keys: Seq[String],
               leftTs: String, rightTs: String,
               rightPrefix: String = "",
               direction: String = "backward",
               tolerance: Option[Column] = None): DataFrame = {
    require(Set("backward", "forward", "nearest").contains(direction),
      s"direction must be 'backward', 'forward' or 'nearest', got '$direction'")
    val payloadCols =
      right.columns.filterNot(c => keys.contains(c)).toSeq
    val leftCols = left.columns.toSeq
    require(!leftCols.exists(c => payloadCols.map(rightPrefix + _).contains(c)),
      "right payload columns collide with left columns; set rightPrefix")

    // the carried struct holds the matched ts (for the tolerance bound)
    // alongside the payload; must be a NULL of struct type, not a struct
    // of nulls — last(ignoreNulls) skips only genuinely-null payloads
    val nullPayload = lit(null).cast(org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField(
        "__mts", right.schema(rightTs).dataType),
      org.apache.spark.sql.types.StructField(
        "__p", org.apache.spark.sql.types.StructType(
          payloadCols.map(c => org.apache.spark.sql.types.StructField(
            c, right.schema(c).dataType)))))))
    val l = left
      .withColumn("__ts", col(leftTs))
      .withColumn("__side", lit(1))
      .withColumn("__payload", nullPayload)
    val r = right
      // a null rightTs can never satisfy the as-of predicate; unfiltered
      // it would sort to the partition head (asc nulls-first) and its
      // payload would be carried into early left rows
      .filter(col(rightTs).isNotNull)
      .withColumn("__ts", col(rightTs))
      .withColumn("__side", lit(0))
      .withColumn("__payload", struct(
        col(rightTs).as("__mts"), struct(payloadCols.map(col): _*).as("__p")))
      .select((keys.map(col) :+ col("__ts") :+ col("__side") :+ col("__payload")) ++
        leftCols.filterNot(c => keys.contains(c)).map(c =>
          lit(null).cast(left.schema(c).dataType).as(c)): _*)

    val unioned = l.select((keys.map(col) :+ col("__ts") :+ col("__side") :+
      col("__payload")) ++ leftCols.filterNot(keys.contains).map(col): _*)
      .unionByName(r)

    // __payload as final sort key: right rows sharing a timestamp resolve
    // deterministically (struct ordering = field order) instead of by
    // partition-internal row order — only when the payload type is
    // orderable (a map-typed payload column would fail analysis; those
    // joins fall back to arbitrary tie-resolution)
    val payloadOrderable = payloadCols.forall(c =>
      org.apache.spark.sql.catalyst.expressions.RowOrdering.isOrderable(
        right.schema(c).dataType))
    def sortKeys(desc: Boolean) = {
      val tsKey = if (desc) col("__ts").desc else col("__ts").asc
      if (payloadOrderable) Seq(tsKey, col("__side").asc, col("__payload").asc)
      else Seq(tsKey, col("__side").asc)
    }
    def carryWindow(desc: Boolean) = Window.partitionBy(keys.map(col): _*)
      .orderBy(sortKeys(desc): _*)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    def trim(m: Column, dist: Column): Column = tolerance match {
      case None => m
      case Some(tol) => when(m.isNotNull && dist <= tol, m)
    }
    val distB = (m: Column) => col("__ts") - m.getField("__mts")
    val distF = (m: Column) => m.getField("__mts") - col("__ts")
    val limited = direction match {
      case "nearest" =>
        // both carries over ONE exchange (same partitioning, two sorts);
        // each side is tolerance-trimmed first, then the closer wins and
        // equidistant ties take the backward match
        unioned
          .withColumn("__mb", last(col("__payload"), ignoreNulls = true)
            .over(carryWindow(desc = false)))
          .withColumn("__mf", last(col("__payload"), ignoreNulls = true)
            .over(carryWindow(desc = true)))
          .withColumn("__mb", trim(col("__mb"), distB(col("__mb"))))
          .withColumn("__mf", trim(col("__mf"), distF(col("__mf"))))
          .withColumn("__match",
            when(col("__mb").isNull, col("__mf"))
              .when(col("__mf").isNull, col("__mb"))
              .when(distB(col("__mb")) <= distF(col("__mf")), col("__mb"))
              .otherwise(col("__mf")))
          .filter(col("__side") === 1)
      case d =>
        val desc = d == "forward"
        val carried = unioned
          .withColumn("__match", last(col("__payload"), ignoreNulls = true)
            .over(carryWindow(desc)))
          .filter(col("__side") === 1)
        val dist =
          if (d == "backward") distB(col("__match")) else distF(col("__match"))
        carried.withColumn("__match", trim(col("__match"), dist))
    }

    // A NULL left timestamp can never satisfy any as-of predicate, but the
    // forward carry's descending sort places NULLs last, where last(_,
    // ignoreNulls) would hand the row the earliest right payload (nearest
    // inherits this through its forward leg). Null the match explicitly —
    // one scan-side projection, uniform across directions.
    val guarded = limited.withColumn("__match",
      when(col("__ts").isNotNull, col("__match")))
    val out = leftCols.map(col) ++ payloadCols.map(c =>
      col(s"__match.__p.`$c`").as(rightPrefix + c))
    guarded.select(out: _*)
  }

  /** Banded (binned) batch interval join: every (left, right) pair of the
    * same `key` with rightTs in [leftTs + lowerSec, leftTs + upperSec].
    *
    * Spark has no native range join — a non-equi condition on its own
    * plans a per-key cross product (BroadcastNestedLoopJoin or worse),
    * which explodes quadratically on hot keys at scale. The banded form
    * makes it a plain equi-join: right rows are assigned ONE time bin
    * (floor(ts/bin)); each left row probes only the bins its interval
    * overlaps (interval/bin + 2 bins, exploded), and the exact interval
    * predicate filters within the matched bins. The exchange is on
    * (key, bin) — shuffle volume is rows × probes, never a per-key
    * cartesian; `binSec` defaults to the interval width, bounding probes
    * at 3 per left row. Microsecond-exact (comparisons in unix micros).
    * Right columns are prefixed `rightPrefix`; inner-join semantics. */
  def bandedIntervalJoin(left: DataFrame, right: DataFrame, key: String,
                         leftTs: String, rightTs: String,
                         lowerSec: Long, upperSec: Long, binSec: Long = 0L,
                         rightPrefix: String = "r_"): DataFrame = {
    require(upperSec >= lowerSec, "upperSec must be >= lowerSec")
    val bin = (if (binSec > 0) binSec else math.max(upperSec - lowerSec, 1L)) * 1000000L
    val loUs = lowerSec * 1000000L
    val hiUs = upperSec * 1000000L
    val r = prefixed(right, rightPrefix)
      .withColumn("__rus", unix_micros(col(s"$rightPrefix$rightTs")))
      .withColumn("__bin", binIdExpr("__rus", bin))
    val l = left
      .withColumn("__lus", unix_micros(col(leftTs)))
      .withColumn("__lo", col("__lus") + loUs)
      .withColumn("__hi", col("__lus") + hiUs)
      .withColumn("__bin", explode(sequence(
        binIdExpr("__lo", bin), binIdExpr("__hi", bin))))
      .drop("__lo", "__hi")
    l.join(r, l("__bin") === r("__bin") &&
        col(key) === col(s"$rightPrefix$key") &&
        col("__rus") >= col("__lus") + loUs &&
        col("__rus") <= col("__lus") + hiUs)
      .drop("__bin", "__lus", "__rus")
  }

  /** Salted aggregation: two-phase group-by for skewed keys. Phase 1 groups
    * on (key, random-salt-of-`salts`) computing partial aggregates — the hot
    * key's rows spread over `salts` reducers; phase 2 combines the partials
    * on the key alone. Only associative aggregates compose this way; the
    * helper exposes count and sum, the common skew victims. */
  def saltedCountSum(df: DataFrame, keys: Seq[String], sumCol: String,
                     salts: Int = 16): DataFrame = {
    val salted = df.withColumn("__salt", rowSalt(df, salts))
    salted
      .groupBy((keys.map(col) :+ col("__salt")): _*)
      .agg(count(lit(1)).as("__pc"), sum(col(sumCol)).as("__ps"))
      .groupBy(keys.map(col): _*)
      .agg(sum(col("__pc")).as("n"), sum(col("__ps")).as(s"sum_$sumCol"))
  }

  /** Salted equi-join for a skewed LEFT side against a small-ish right
    * side: left rows get a random salt in [0, salts); the right side is
    * replicated `salts` times with each salt value; the join key becomes
    * (key, salt), spreading one hot key over `salts` tasks. Right side
    * grows `salts`-fold — use when right is the dimension side and AQE's
    * skew handling isn't available (e.g. a non-shuffle-join plan). */
  def saltedJoin(left: DataFrame, right: DataFrame, key: String,
                 salts: Int = 16): DataFrame = {
    val l = left.withColumn("__salt", rowSalt(left, salts))
    val r = right
      .withColumn("__salt", explode(sequence(lit(0L), lit(salts - 1L))))
    l.join(r, Seq(key, "__salt")).drop("__salt")
  }

  /** Every column prefixed, in ONE projection (chained renames would stack
    * N Project nodes). Shared by the batch and streaming interval joins. */
  private[graft] def prefixed(df: DataFrame, p: String): DataFrame =
    df.select(df.columns.map(c => col(c).as(s"$p$c")).toIndexedSeq: _*)

  /** floor(col / bin) in pure LONG arithmetic: (x − pmod(x, bin)) is an
    * exact multiple of bin, so integer `div` equals the floor quotient for
    * any sign and magnitude. A double-based floor(x / bin) silently
    * mis-bins once |x| exceeds 2^53 — exactly the corrupt far-range
    * timestamps dirty data contains. */
  private def binIdExpr(colName: String, bin: Long): Column =
    expr(s"($colName - pmod($colName, ${bin}L)) div ${bin}L")

  /** Deterministic per-row salt: hash of the whole row. A nondeterministic
    * salt (rand / monotonically_increasing_id) upstream of a shuffle
    * corrupts results on stage retry — re-executed map tasks would assign
    * rows to different reducers than completed reduce tasks already
    * consumed. The cost of determinism: byte-identical duplicate rows of a
    * hot key share a salt; distinct rows (the normal case) still spread. */
  private def rowSalt(df: DataFrame, salts: Int) =
    pmod(xxhash64(df.columns.map(col).toIndexedSeq: _*), lit(salts.toLong))
}
