package graft.operators

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** Bounded top-k accumulator for (score, id) pairs, ordered by
  * (score desc, id asc) — the same total order as the window-rank
  * formulation, so results are identical; only the plan changes.
  *
  * As an `Aggregator` it participates in map-side partial aggregation:
  * each partition reduces its rows to ≤ k candidates before the exchange,
  * so the shuffle carries k·partitions rows per query instead of the whole
  * scored corpus — the difference between a top-k over 100 TB and a
  * sort of it.
  */
class TopKAggregator(k: Int)
    extends Aggregator[(Long, Double, Long), List[(Double, Long)], Seq[(Double, Long)]] {

  require(k >= 1, s"top-k needs k >= 1, got $k")
  // NaN scores have no place in (score desc, id asc) — better() would not
  // be a total order and results would depend on arrival order. Callers
  // (rankTopK) filter NaN/null scores before aggregating.

  /** (score desc, id asc): a is better than b. */
  private def better(a: (Double, Long), b: (Double, Long)): Boolean =
    a._1 > b._1 || (a._1 == b._1 && a._2 < b._2)

  /** Buffer kept sorted best-first, length ≤ k. */
  override def zero: List[(Double, Long)] = Nil

  /** Input rows are (groupKey, score, id); the key is carried by groupByKey. */
  override def reduce(buf: List[(Double, Long)], row: (Long, Double, Long)): List[(Double, Long)] =
    insert(buf, (row._2, row._3))

  override def merge(a: List[(Double, Long)], b: List[(Double, Long)]): List[(Double, Long)] =
    b.foldLeft(a)(insert)

  private def insert(buf: List[(Double, Long)], row: (Double, Long)): List[(Double, Long)] = {
    if (buf.length >= k && better(buf.last, row)) buf
    else {
      val (front, back) = buf.span(better(_, row))
      (front ::: row :: back).take(k)
    }
  }

  override def finish(buf: List[(Double, Long)]): Seq[(Double, Long)] = buf

  override def bufferEncoder: Encoder[List[(Double, Long)]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[List[(Double, Long)]]()
  override def outputEncoder: Encoder[Seq[(Double, Long)]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[(Double, Long)]]()
}
