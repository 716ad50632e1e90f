package graft.streaming

import org.apache.spark.sql.DataFrame

/** Stateful streaming building blocks beyond windowed aggregation.
  *
  * The reference engine is an unbounded arrival-order push stream whose
  * only state is the write buffer (SURVEY.md §2.3 "Streaming"); these are
  * the Structured-Streaming-native equivalents a large pipeline needs.
  */
object StreamOps {

  /** Streaming exact dedup: drop rows whose `keys` were already seen
    * within the watermark window, with state bounded by the watermark
    * (older keys are evicted — late duplicates beyond `delay` pass
    * through, the standard trade-off). Deduplicates on the KEYS alone:
    * redelivered events with jittered timestamps — the normal
    * at-least-once case — are still dropped. */
  def dedupeStream(df: DataFrame, keys: Seq[String], tsCol: String,
                   delay: String): DataFrame =
    df.withWatermark(tsCol, delay)
      .dropDuplicatesWithinWatermark(keys.head, keys.tail: _*)

  /** Custom keyed streaming state via `mapGroupsWithState` — the extension
    * point for semantics the built-in stateful operators can't express
    * (session_window, dropDuplicates and windowed aggs cover the common
    * cases; this is the escape hatch the north-star plan reserves for
    * custom state). Maintains a running (count, sum) per key across
    * micro-batches. Input: (key, value) pairs; output one row per key per
    * batch with the accumulated totals. */
  def runningTotals(pairs: org.apache.spark.sql.Dataset[(Long, Double)])
      : org.apache.spark.sql.Dataset[(Long, Long, Double)] = {
    import org.apache.spark.sql.streaming.GroupState
    import pairs.sparkSession.implicits._
    pairs
      .groupByKey(_._1)
      .mapGroupsWithState[(Long, Double), (Long, Long, Double)] {
        (key: Long, rows: Iterator[(Long, Double)],
         state: GroupState[(Long, Double)]) =>
          val (n0, s0) = state.getOption.getOrElse((0L, 0.0))
          var n = n0
          var s = s0
          rows.foreach { case (_, v) => n += 1; s += v }
          state.update((n, s))
          (key, n, s)
      }
  }

  /** Watermarked stream-stream interval join: match each left event to
    * right events of the same `key` whose timestamp lies in
    * [left.ts − before, left.ts + after]. Both sides carry watermarks so
    * the join state is BOUNDED — buffered rows are evicted once the
    * watermark passes their interval, which is the property that keeps an
    * unbounded two-stream join runnable forever (an unconstrained
    * stream-stream join accumulates state without limit). Column names are
    * prefixed `l_`/`r_` to keep the joined schema unambiguous. */
  def intervalJoin(leftStream: DataFrame, rightStream: DataFrame, key: String,
                   tsCol: String, delay: String,
                   before: String, after: String): DataFrame = {
    import org.apache.spark.sql.functions._
    import graft.operators.Joins.prefixed
    val l = prefixed(leftStream, "l_").withWatermark(s"l_$tsCol", delay)
    val r = prefixed(rightStream, "r_").withWatermark(s"r_$tsCol", delay)
    l.join(r,
      col(s"l_$key") === col(s"r_$key") &&
        col(s"r_$tsCol") >= col(s"l_$tsCol") - expr(s"INTERVAL $before") &&
        col(s"r_$tsCol") <= col(s"l_$tsCol") + expr(s"INTERVAL $after"))
  }

  /** Micro-batch upsert sink: apply each epoch as a merge into a snapshot
    * maintained by `applyBatch` — the reference's buffer-flush-per-epoch
    * contract (`writers.py:70-72,88-95`) expressed as `foreachBatch`.
    * Returns the StreamingQuery; caller stops it. */
  def upsertSink(stream: DataFrame)(
      applyBatch: (DataFrame, Long) => Unit): org.apache.spark.sql.streaming.StreamingQuery =
    stream.writeStream.foreachBatch { (b: DataFrame, id: Long) =>
      applyBatch(b, id)
    }.start()
}
