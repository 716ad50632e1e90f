package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Join shapes beyond Spark's built-ins: as-of (time-travel) joins and a
  * skew-defeating salted equi-join. [[asOfJoin]] / [[asOfJoinBucketed]] /
  * [[saltedJoin]] are pure DataFrame compositions chosen for their scale
  * behavior; [[asOfJoinMerge]] is the same as-of contract planned as a
  * WHOLE-OPERATOR custom physical node (`graft.plans.AsofJoinExec`) —
  * the two implementations are property-pinned row-identical, so the
  * choice is purely a plan-shape decision.
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
    * PLAN DISPATCH: this is a front door over two row-identical
    * implementations (property-pinned in `AsofMergeSpec`). When the ts
    * columns are timestamp/date/numeric and the tolerance (if any) is a
    * foldable literal, the join plans as the custom co-partitioned
    * streaming merge ([[asOfJoinMerge]] → `graft.plans.AsofJoinExec`) —
    * one exchange per side in its own schema, measured 1.16–1.26× over
    * the window plan at every probed key distribution (SCALEPROBE
    * `asof_merge_scale`). Everything else (other orderable ts types,
    * computed tolerances, `__rk_`-prefixed right columns) falls back to
    * the union-and-carry window plan ([[asOfJoinWindow]]). Semantics,
    * output columns, NULL/NaN and tie rules are identical either way. */
  def asOfJoin(left: DataFrame, right: DataFrame, keys: Seq[String],
               leftTs: String, rightTs: String,
               rightPrefix: String = "",
               direction: String = "backward",
               tolerance: Option[Column] = None): DataFrame = {
    import graft.plans.AsofJoinExec
    val mergeable =
      AsofJoinExec.supportsTsType(left.schema(leftTs).dataType) &&
        AsofJoinExec.supportsTsType(right.schema(rightTs).dataType) &&
        !right.columns.exists(_.startsWith("__rk_")) &&
        resolveMergeTolerance(left, leftTs, tolerance).isRight
    if (mergeable)
      asOfJoinMerge(left, right, keys, leftTs, rightTs, rightPrefix,
        direction, tolerance)
    else
      asOfJoinWindow(left, right, keys, leftTs, rightTs, rightPrefix,
        direction, tolerance)
  }

  /** The union-and-carry as-of plan — [[asOfJoin]]'s fallback for ts
    * types and tolerances the merge node can't take, and the
    * independent implementation the merge is property-pinned against.
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
    * (SCALEPROBE.json `asof_skew`, 5M events, planted keys holding 10%
    * and 40% of ALL rows): at 10% wall is 1.5–1.7x the uniform corpus
    * across this join / sessionize / gap-fill; at 40% it reaches 3.2x
    * (join) to 4.6x (gap-fill) even at local widths — and on a
    * 1000-executor cluster a 40%-share key pins ~40% of the corpus on
    * one task. Degradation is PROPORTIONAL to the hot share (one task's
    * work), never quadratic. A salted carry is deliberately NOT offered —
    * a salt breaks the within-key total order these semantics rest on;
    * the order-preserving escape hatch is [[asOfJoinBucketed]], which
    * splits the hot key's carry across TIME buckets (measured at the 40%
    * key: ~1.4x faster than this operator and skew-flat, at a ~2x
    * overhead on uniform data — reach for it when one key dominates, not
    * by default). */
  def asOfJoinWindow(left: DataFrame, right: DataFrame, keys: Seq[String],
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
      // a null (or NaN — float/double ts) rightTs can never satisfy the
      // as-of predicate; unfiltered it would sort to the partition head
      // (asc nulls-first) / tail (NaN greatest) and its payload would be
      // carried into left rows
      .filter(tsUsable(col(rightTs), right.schema(rightTs).dataType))
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

    // A NULL (or NaN) left timestamp can never satisfy any as-of
    // predicate, but the forward carry's descending sort places NULLs
    // last (and NaN sorts greatest), where last(_, ignoreNulls) would
    // hand the row a wrong right payload (nearest inherits this through
    // its forward leg). Null the match explicitly — one scan-side
    // projection, uniform across directions.
    val guarded = limited.withColumn("__match",
      when(tsUsable(col("__ts"), left.schema(leftTs).dataType),
        col("__match")))
    val out = leftCols.map(col) ++ payloadCols.map(c =>
      col(s"__match.__p.`$c`").as(rightPrefix + c))
    guarded.select(out: _*)
  }

  /** [[asOfJoin]] with a HOT-KEY time-bucket split — the operator form of
    * the scaladoc's "sub-key by time bucket" advice, for the regime where
    * ONE key holds a dominant share of the corpus and the plain carry's
    * single per-key task becomes the job's wall (measured:
    * SCALEPROBE.json `asof_skew` at a 40% hot key). Semantics are
    * IDENTICAL to [[asOfJoin]] (row-for-row, including tie and tolerance
    * rules — property-pinned in `JoinsSpec`); only the plan changes:
    *
    *  1. Both sides get a bucket id (`floor(ts / bucketWidth)` via
    *     [[timeBuckets]], or any caller-supplied MONOTONE bucketing), and
    *     the carry runs per (key, bucket) — the hot key's sort+carry
    *     splits across its buckets instead of one task.
    *  2. Rows whose match lives in another bucket (no in-bucket
    *     candidate; by monotonicity the in-bucket match is otherwise
    *     always the global one) are resolved by a second as-of join ON
    *     THE BUCKET INDEX against the per-(key, bucket) extreme payload —
    *     a relation with one row per non-empty (key, bucket), thousands
    *     of times smaller than the corpus, so its per-key window is
    *     negligible even for the hot key.
    *
    * Costs over [[asOfJoin]]: a second (tiny) exchange for the fix-up and
    * the bucket-aggregate pass — pay it when a key dominates, not by
    * default. Requires orderable right payload columns (the bucket-level
    * extreme must replay the tie rule) and a timestamp or numeric ts
    * column. A salt can never replace this: only a TIME-ALIGNED split
    * preserves the within-key order the carry's semantics rest on. */
  def asOfJoinBucketed(left: DataFrame, right: DataFrame, keys: Seq[String],
                       leftTs: String, rightTs: String,
                       bucketOf: Column => Column,
                       rightPrefix: String = "",
                       direction: String = "backward",
                       tolerance: Option[Column] = None): DataFrame = {
    require(Set("backward", "forward", "nearest").contains(direction),
      s"direction must be 'backward', 'forward' or 'nearest', got '$direction'")
    val leftCols = left.columns.toSeq
    val payloadCols = right.columns.filterNot(keys.contains).toSeq
    require(payloadCols.forall(c =>
      org.apache.spark.sql.catalyst.expressions.RowOrdering.isOrderable(
        right.schema(c).dataType)),
      "asOfJoinBucketed needs orderable right payload columns (the " +
        "bucket-level extreme replays the carry's tie rule); use asOfJoin")
    require(!(leftCols ++ right.columns).exists(_.startsWith("__g")),
      "columns starting with __g collide with bucketing internals")
    def trimmed(df: DataFrame, prefix: String, backward: Boolean)
        : (Column, Column => Column) = {
      val mts = col(prefix + rightTs)
      val dist = if (backward) col(leftTs) - mts else mts - col(leftTs)
      val valid = tolerance match {
        case None => mts.isNotNull
        case Some(tol) => mts.isNotNull && dist <= tol
      }
      (valid, (c: Column) => when(valid, c))
    }
    direction match {
      case "backward" | "forward" =>
        val fwd = direction == "forward"
        val out = bucketedCarry(left, right, keys, leftTs, rightTs,
          bucketOf, rightPrefix, fwd)
        val (_, trim) = trimmed(out, rightPrefix, backward = !fwd)
        out.select(leftCols.map(col) ++ payloadCols.map(c =>
          trim(col(s"`$rightPrefix$c`")).as(rightPrefix + c)): _*)
      case _ =>
        // nearest: full backward pass, then a forward pass CHAINED on its
        // output (the backward columns ride along as left columns), then
        // the closer side wins scan-side — equidistant ties backward,
        // exactly asOfJoin's rule
        val b = bucketedCarry(left, right, keys, leftTs, rightTs,
          bucketOf, "__gb_", forward = false)
        val f = bucketedCarry(b, right, keys, leftTs, rightTs,
          bucketOf, "__gf_", forward = true)
        val (bOk, _) = trimmed(f, "__gb_", backward = true)
        val (fOk, _) = trimmed(f, "__gf_", backward = false)
        val distB = col(leftTs) - col("__gb_" + rightTs)
        val distF = col("__gf_" + rightTs) - col(leftTs)
        val takeB = bOk && (!fOk || distB <= distF)
        f.select(leftCols.map(col) ++ payloadCols.map(c =>
          when(takeB, col(s"`__gb_$c`"))
            .when(fOk, col(s"`__gf_$c`")).as(rightPrefix + c)): _*)
    }
  }

  /** [[asOfJoin]] planned as a WHOLE-OPERATOR physical node instead of a
    * DataFrame composition: a custom logical plan ([[graft.plans.AsofJoin]])
    * planned by an injected strategy into a co-partitioned streaming
    * merge ([[graft.plans.AsofJoinExec]]) — the `SparkSessionExtensions`
    * rung of the extension ladder, for the semantics the built-in
    * operators can't express as ONE operator. Semantics are row-identical
    * to [[asOfJoin]] (directions, tie rule, tolerance, NULL handling —
    * property-pinned in `AsofMergeSpec`); the differences are the plan:
    *
    *  - each side shuffles ONCE on the keys in its own schema (the
    *    union-and-carry pays one exchange of the union at the PADDED
    *    width: every right row carries null-cast copies of the left
    *    columns and vice versa);
    *  - `nearest` runs in the same single pass (the window form sorts
    *    the union twice);
    *  - left-side filters and unused left columns migrate below the
    *    join via [[graft.plans.AsofJoinOptimizations]], reaching
    *    `PushedFilters`/`ReadSchema` in the scan.
    *
    * Measured (SCALEPROBE.json `asof_merge_scale`, 5M events, match
    * counts required equal before timing): 1.23×/1.26× the window plan
    * at uniform keys (backward/nearest), 1.16–1.19× at planted 10%/40%
    * hot keys — the win is the narrower exchanges; the merge itself is
    * not the wall at local widths.
    *
    * `tolerance` must be a FOLDABLE expression here (a literal interval
    * for timestamp/date ts columns, a numeric literal for numeric ts) —
    * it is evaluated at plan time into the merge's arithmetic. Skew
    * behavior equals [[asOfJoin]] (a hot key is one partition's merge);
    * [[asOfJoinBucketed]] stays the hot-key escape hatch. */
  def asOfJoinMerge(left: DataFrame, right: DataFrame, keys: Seq[String],
                    leftTs: String, rightTs: String,
                    rightPrefix: String = "",
                    direction: String = "backward",
                    tolerance: Option[Column] = None): DataFrame = {
    import graft.plans.{AsofJoin, AsofJoinExec, AsofPlanner}
    import org.apache.spark.sql.graftbridge.Bridge
    import org.apache.spark.sql.types._
    require(Set("backward", "forward", "nearest").contains(direction),
      s"direction must be 'backward', 'forward' or 'nearest', got '$direction'")
    val payloadCols = right.columns.filterNot(keys.contains).toSeq
    val leftCols = left.columns.toSeq
    require(!leftCols.exists(c => payloadCols.map(rightPrefix + _).contains(c)),
      "right payload columns collide with left columns; set rightPrefix")
    require(!right.columns.exists(_.startsWith("__rk_")),
      "right columns starting with __rk_ collide with merge-join internals")
    val lTsType = left.schema(leftTs).dataType
    val rTsType = right.schema(rightTs).dataType
    require(AsofJoinExec.supportsTsType(lTsType) &&
        AsofJoinExec.supportsTsType(rTsType),
      s"asOfJoinMerge needs timestamp/date/numeric ts columns, got " +
        s"$lTsType / $rTsType (use asOfJoin for other orderable types)")

    val tol: Option[Double] =
      resolveMergeTolerance(left, leftTs, tolerance) match {
        case Right(t) => t
        case Left(reason) => throw new IllegalArgumentException(reason)
      }

    val spark = left.sparkSession
    AsofPlanner.ensure(spark)
    // fresh aliases on the right side: disjoint expr-ids from the left
    // even for self-joins, and the payload already carries its final
    // (prefixed) output names
    val r2 = right.select(
      keys.map(k => col(k).as(s"__rk_$k")) ++
        payloadCols.map(c => col(c).as(rightPrefix + c)): _*)
    val lPlan = left.queryExecution.analyzed
    val rPlan = r2.queryExecution.analyzed
    def attrOf(out: Seq[org.apache.spark.sql.catalyst.expressions.Attribute],
               name: String) = {
      val hits = out.filter(_.name == name)
      require(hits.size == 1,
        s"column '$name' must resolve to exactly one attribute, found ${hits.size}")
      hits.head
    }
    val node = AsofJoin(lPlan, rPlan,
      keys.map(attrOf(lPlan.output, _)),
      keys.map(k => attrOf(rPlan.output, s"__rk_$k")),
      attrOf(lPlan.output, leftTs),
      attrOf(rPlan.output, rightPrefix + rightTs),
      payloadCols.map(c => attrOf(rPlan.output, rightPrefix + c)),
      direction, tol)
    Bridge.ofRows(spark, node)
  }

  /** Convenience monotone bucketing for [[asOfJoinBucketed]] over
    * timestamp columns: floor(unix_micros(ts) / width) computed in pure
    * LONG arithmetic via the [[binIdExpr]] identity — a double-based
    * `floor(us / w)` silently mis-bins once |micros| exceeds 2^53,
    * exactly the corrupt far-range timestamps dirty data contains. */
  def timeBuckets(widthSec: Long): Column => Column = {
    require(widthSec > 0, "bucket width must be positive")
    c => {
      val us = unix_micros(c)
      val w = lit(widthSec * 1000000L)
      call_function("div", us - pmod(us, w), w)
    }
  }

  /** One direction of the bucketed carry: per-(key, bucket) [[asOfJoin]]
    * plus the cross-bucket fix-up. Output: left columns ++ prefixed
    * payload columns, tolerance NOT yet applied. */
  private def bucketedCarry(left: DataFrame, right: DataFrame,
                            keys: Seq[String], leftTs: String,
                            rightTs: String, bucketOf: Column => Column,
                            prefix: String, forward: Boolean): DataFrame = {
    val leftCols = left.columns.toSeq
    val payloadCols = right.columns.filterNot(keys.contains).toSeq
    val lb = left.withColumn("__gbkt", bucketOf(col(leftTs)))
    val rb = right.withColumn("__gbkt", bucketOf(col(rightTs)))
    val dir = if (forward) "forward" else "backward"
    val inBucket = asOfJoin(lb, rb, keys :+ "__gbkt", leftTs, rightTs,
      prefix, dir, None)
    val matchTs = col(s"`$prefix$rightTs`")
    val matched = inBucket.filter(matchTs.isNotNull)
      .select(leftCols.map(col) ++
        payloadCols.map(c => col(s"`$prefix$c`")): _*)
    // per-(key, bucket) extreme payload under the carry's EXACT tie rule:
    // backward takes the greatest (ts, payload); forward the smallest ts
    // but the GREATEST payload at that ts (the window's payload-asc sort
    // puts the greatest last in both directions), hence the negated-ts
    // order proxy instead of a min()
    val tsType = right.schema(rightTs).dataType
    val tsOrd: Column = tsType match {
      case _: org.apache.spark.sql.types.TimestampType |
           _: org.apache.spark.sql.types.TimestampNTZType =>
        unix_micros(col(rightTs))
      case _: org.apache.spark.sql.types.NumericType => col(rightTs)
      case other => throw new IllegalArgumentException(
        s"asOfJoinBucketed needs a timestamp or numeric ts column, got $other")
    }
    val ordProxy = if (forward) -tsOrd else tsOrd
    val rAgg = rb.filter(tsUsable(col(rightTs), right.schema(rightTs).dataType))
      .groupBy((keys :+ "__gbkt").map(col): _*)
      .agg(max(struct(ordProxy.as("__go"), col(rightTs).as("__gmts"),
        struct(payloadCols.map(col): _*).as("__gp"))).as("__gl"))
      .withColumn("__gshift",
        if (forward) col("__gbkt") - 1 else col("__gbkt") + 1)
      .drop("__gbkt")
    // fix-up: only the rows with no in-bucket candidate re-enter a
    // per-key window, joined as-of ON THE BUCKET INDEX against the tiny
    // bucket-extreme relation (shifted so "another bucket" is strict)
    val unmatched = inBucket.filter(matchTs.isNull)
      .select((leftCols :+ "__gbkt").map(col): _*)
    val fixed = asOfJoin(unmatched, rAgg, keys, "__gbkt", "__gshift",
      "__gx_", dir, None)
    val fixedOut = fixed.select(leftCols.map(col) ++
      payloadCols.map(c => col(s"`__gx___gl`.__gp.`$c`").as(prefix + c)): _*)
    matched.unionByName(fixedOut)
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

  /** Resolve an as-of tolerance Column into the merge plan's double ts
    * algebra (MICROSECONDS for timestamp ts columns, days for dates, the
    * column's own units for numerics). `Right(t)` = usable by the merge;
    * `Left(reason)` = not plan-time-evaluable for it (computed
    * expression, NULL, months interval, interval/numeric-ts mismatch) —
    * the [[asOfJoin]] dispatcher then falls back to the window plan,
    * while [[asOfJoinMerge]] fails loudly with the reason. */
  private def resolveMergeTolerance(left: DataFrame, leftTs: String,
      tolerance: Option[Column]): Either[String, Option[Double]] = {
    import org.apache.spark.sql.graftbridge.Bridge
    import org.apache.spark.sql.types._
    val lTsType = left.schema(leftTs).dataType
    tolerance match {
      case None => Right(None)
      case Some(c) =>
        // resolve the Column through a one-row projection: Spark 4's
        // Column->Expression conversion can hand back an unresolved tree
        // (e.g. a parsed INTERVAL literal), and foldability is only
        // meaningful post-analysis
        val resolved: Either[String,
            org.apache.spark.sql.catalyst.expressions.Expression] =
          try {
            left.sparkSession.range(1).select(c.as("__tol"))
              .queryExecution.analyzed match {
              case p: org.apache.spark.sql.catalyst.plans.logical.Project =>
                Right(p.projectList.head match {
                  case a: org.apache.spark.sql.catalyst.expressions.Alias =>
                    a.child
                  case o => o
                })
              case _ => Right(Bridge.expression(c))
            }
          } catch {
            case _: org.apache.spark.sql.AnalysisException =>
              Left("merge-plan tolerance must be a standalone foldable " +
                "expression (it is evaluated at plan time); use " +
                "asOfJoinWindow for a column-dependent tolerance")
          }
        resolved.flatMap { e =>
          if (!e.foldable)
            Left("merge-plan tolerance must be a foldable expression (it " +
              "is evaluated at plan time); use asOfJoinWindow for a " +
              "computed tolerance")
          else {
            // the merge node carries its tolerance as a Double; an
            // integral tolerance above 2^53 does not round-trip that
            // representation exactly, so the merge could admit/reject a
            // pair the window plan's native long arithmetic decides the
            // other way — route such tolerances to the window plan
            // (Left), never silently round them
            def exactTol(l: Long): Either[String, Option[Double]] =
              if (math.abs(l) <= (1L << 53)) Right(Some(l.toDouble))
              else Left("tolerance magnitude exceeds 2^53 and cannot be " +
                "represented exactly in the merge plan's double " +
                "tolerance; use asOfJoinWindow (native long arithmetic) " +
                "for tolerances this large")
            val micros: Either[String, Option[Double]] =
              (e.eval(), e.dataType) match {
                case (null, _) => Left("tolerance evaluated to NULL")
                case (us: java.lang.Long, _: DayTimeIntervalType) =>
                  exactTol(us)
                case (ci: org.apache.spark.unsafe.types.CalendarInterval,
                      CalendarIntervalType) =>
                  if (ci.months != 0)
                    Left("tolerance interval must not contain months " +
                      "(not a fixed duration)")
                  else {
                    // exact long arithmetic: a plain `days*86400000000L +
                    // micros` can WRAP for extreme day counts (>~1.07e8
                    // days) and a wrapped value landing inside ±2^53 would
                    // pass exactTol as a silently wrong tolerance — map the
                    // overflow to the same window-plan routing oversized
                    // exact values already take
                    val totalUs: Either[String, Long] =
                      try Right(Math.addExact(
                        Math.multiplyExact(ci.days.toLong, 86400000000L),
                        ci.microseconds))
                      catch {
                        case _: ArithmeticException =>
                          Left("tolerance interval overflows long " +
                            "microseconds; use asOfJoinWindow (native " +
                            "long arithmetic) for tolerances this large")
                      }
                    totalUs.flatMap(exactTol)
                  }
                case _ => Right(None)
              }
            micros.flatMap { m =>
              (m, lTsType) match {
                case (Some(us), TimestampType | TimestampNTZType) =>
                  Right(Some(us))
                case (Some(us), DateType) =>
                  Right(Some(us / 86400000000L.toDouble)) // days
                case (Some(_), other) => Left(
                  s"interval tolerance needs a timestamp/date ts column, " +
                    s"got $other")
                case (None, _) => (e.eval(), e.dataType) match {
                  case (n: Number, _: NumericType) =>
                    if (!lTsType.isInstanceOf[NumericType])
                      Left(s"numeric tolerance needs a numeric ts " +
                        s"column, got $lTsType")
                    else n match {
                      // integral tolerances get the same 2^53 exactness
                      // fence as intervals; float/double tolerances ARE
                      // doubles (exact by definition)
                      case l: java.lang.Long => exactTol(l.longValue())
                      case i: java.lang.Integer => exactTol(i.longValue())
                      case s: java.lang.Short => exactTol(s.longValue())
                      case b: java.lang.Byte => exactTol(b.longValue())
                      case _ => Right(Some(n.doubleValue()))
                    }
                  case (d: org.apache.spark.sql.types.Decimal, _) =>
                    // a decimal that does not round-trip the double is
                    // routed to the window plan, like oversize integrals
                    if (BigDecimal(d.toDouble).compare(d.toBigDecimal) == 0)
                      Right(Some(d.toDouble))
                    else Left("decimal tolerance is not exactly " +
                      "representable as a double; use asOfJoinWindow")
                  case (v, t) => Left(
                    s"unsupported tolerance $v of type $t (interval or numeric)")
                }
              }
            }
          }
        }
    }
  }

  /** A ts value that can participate in an as-of predicate: non-NULL,
    * and non-NaN when the column is float/double (NaN compares greatest
    * in Spark's ordering, which would corrupt the carry — both as-of
    * implementations treat it exactly like NULL). */
  private def tsUsable(c: Column,
                       dt: org.apache.spark.sql.types.DataType): Column =
    dt match {
      case org.apache.spark.sql.types.DoubleType |
           org.apache.spark.sql.types.FloatType => c.isNotNull && !isnan(c)
      case _ => c.isNotNull
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
