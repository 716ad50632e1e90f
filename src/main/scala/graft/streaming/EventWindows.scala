package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Event-time windowing over the `events` stream table.
  *
  * The reference engine is an unbounded arrival-order push stream with no
  * event time (SURVEY.md §2.3 "Streaming"); the north-star extension adds
  * real event-time semantics. Each helper works on both a batch DataFrame
  * and a `readStream` DataFrame — in streaming use, pair with
  * `withWatermark` (see [[withLateDataBound]]) so state is bounded.
  */
object EventWindows {

  /** Tumbling window aggregate: count + sum(value) per (window, event_type).
    * In streaming mode this is an incremental stateful aggregation; in batch
    * mode a plain hash aggregate. */
  def tumbling(events: DataFrame, tsCol: String, every: String,
               keyCols: Seq[String] = Seq("event_type"),
               valueCol: String = "value"): DataFrame =
    events
      .groupBy(window(col(tsCol), every) +: keyCols.map(col): _*)
      .agg(count(lit(1)).as("n"), sum(col(valueCol)).as("total_value"))

  /** Sliding window aggregate. */
  def sliding(events: DataFrame, tsCol: String, length: String,
              slide: String, keyCols: Seq[String] = Seq("event_type"),
              valueCol: String = "value"): DataFrame =
    events
      .groupBy(window(col(tsCol), length, slide) +: keyCols.map(col): _*)
      .agg(count(lit(1)).as("n"), sum(col(valueCol)).as("total_value"))

  /** Session windows per user: gap-based (`session_window` is Spark-native;
    * its state store handles the merge at scale). */
  def sessions(events: DataFrame, tsCol: String, gap: String,
               keyCols: Seq[String] = Seq("user_id"),
               valueCol: String = "value"): DataFrame =
    events
      .groupBy(session_window(col(tsCol), gap) +: keyCols.map(col): _*)
      .agg(count(lit(1)).as("n_events"), sum(col(valueCol)).as("total_value"))

  /** Attach a watermark for streaming use: late rows beyond `delay` are
    * dropped and state older than the watermark is evicted. No-op semantics
    * on batch frames (Spark ignores watermarks in batch mode). */
  def withLateDataBound(events: DataFrame, tsCol: String, delay: String): DataFrame =
    events.withWatermark(tsCol, delay)
}
