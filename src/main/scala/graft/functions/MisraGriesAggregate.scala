package graft.functions

import java.nio.ByteBuffer
import java.nio.charset.StandardCharsets

import scala.collection.mutable

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Misra-Gries frequent-items summary over a token-array column — the
  * bounded-memory heavy-hitter sketch (Misra & Gries 1982), merged across
  * partitions per the mergeable-summaries construction (Agarwal et al.,
  * PODS 2012): at most `k` (item, counter) pairs ever exist per buffer; a
  * miss on a full buffer decrements every counter (dropping zeros), and a
  * merge sums both sides then subtracts the (k+1)-largest count from all.
  *
  * GUARANTEE (the reason this is usable as a candidate generator): every
  * decrement step — update or merge — reduces at least k+1 counters-worth
  * of mass at once, so total undercount per item is at most n/(k+1) over a
  * stream of n tokens; any item with true count > n/(k+1) therefore
  * SURVIVES in the final summary, and its retained counter is a lower
  * bound of its true count. The SURVIVOR SET beyond that floor is
  * merge-order-dependent (Spark task completion order varies run to run) —
  * which is why the `heavy_hitters` contract query treats the sketch as a
  * CANDIDATE SET and recounts candidates exactly in a second restricted
  * pass: the verified output is deterministic and engine-independent even
  * though the sketch internals are not.
  *
  * Why a custom [[TypedImperativeAggregate]]: Spark runs it with map-side
  * partial aggregation — each task reduces its rows to one ≤k-entry buffer
  * and only buffers cross the exchange. The declarative alternative
  * (explode + groupBy + count) shuffles the ENTIRE vocabulary; at corpus
  * scale this is the difference between exchanging kilobytes per task and
  * exchanging every distinct token. Null arrays and null elements are
  * skipped, like every sketch in this package.
  *
  * Returns array<struct<item string, count bigint>> sorted by (count desc,
  * item) — counts are the summary's lower-bound counters, NOT exact. */
case class MisraGriesAgg(
    child: Expression, k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[mutable.HashMap[String, Long]] {

  require(k >= 1, "misra-gries summary size k must be >= 1")

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("item", StringType, nullable = false),
    StructField("count", LongType, nullable = false))))
  override def prettyName: String = "misra_gries"

  override def createAggregationBuffer(): mutable.HashMap[String, Long] =
    mutable.HashMap.empty

  private def offer(buf: mutable.HashMap[String, Long], item: String): Unit = {
    buf.get(item) match {
      case Some(c) => buf.update(item, c + 1)
      case None if buf.size < k => buf.update(item, 1L)
      case None =>
        // decrement-all: k+1 counters-worth of mass (the k retained + this
        // arrival) removed at once — the step the n/(k+1) bound counts.
        // Keys snapshotted: values mutate during the walk.
        buf.keys.toArray.foreach { key =>
          val c = buf(key) - 1
          if (c == 0L) buf.remove(key) else buf.update(key, c)
        }
    }
  }

  override def update(buf: mutable.HashMap[String, Long],
                      input: InternalRow): mutable.HashMap[String, Long] = {
    val tokens = child.eval(input)
    if (tokens != null) {
      val arr = tokens.asInstanceOf[ArrayData]
      val n = arr.numElements()
      var i = 0
      while (i < n) {
        val s = arr.getUTF8String(i)
        if (s != null) offer(buf, s.toString)
        i += 1
      }
    }
    buf
  }

  override def merge(a: mutable.HashMap[String, Long],
                     b: mutable.HashMap[String, Long]): mutable.HashMap[String, Long] = {
    b.foreach { case (item, c) => a.update(item, a.getOrElse(item, 0L) + c) }
    if (a.size > k) {
      // subtract the (k+1)-largest count from every counter: at most k
      // survive, and the subtracted mass spans ≥ k+1 counters — the same
      // per-token undercount accounting as the update-path decrement
      val counts = a.values.toArray
      java.util.Arrays.sort(counts)
      val cut = counts(counts.length - (k + 1))
      a.keys.toArray.foreach { key =>
        val c = a(key) - cut
        if (c <= 0L) a.remove(key) else a.update(key, c)
      }
    }
    a
  }

  override def eval(buf: mutable.HashMap[String, Long]): Any = {
    val sorted = buf.toArray.sortBy { case (s, c) => (-c, s) }
    new GenericArrayData(sorted.map { case (s, c) =>
      InternalRow(UTF8String.fromString(s), c)
    }.toArray[Any])
  }

  override def serialize(buf: mutable.HashMap[String, Long]): Array[Byte] = {
    val entries = buf.toArray
    val payloads = entries.map { case (s, _) =>
      s.getBytes(StandardCharsets.UTF_8)
    }
    val bb = ByteBuffer.allocate(
      4 + payloads.map(p => 4 + p.length + 8).sum)
    bb.putInt(entries.length)
    entries.indices.foreach { i =>
      bb.putInt(payloads(i).length)
      bb.put(payloads(i))
      bb.putLong(entries(i)._2)
    }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): mutable.HashMap[String, Long] = {
    val bb = ByteBuffer.wrap(bytes)
    val n = bb.getInt()
    val buf = mutable.HashMap.empty[String, Long]
    (0 until n).foreach { _ =>
      val len = bb.getInt()
      val p = new Array[Byte](len)
      bb.get(p)
      buf.update(new String(p, StandardCharsets.UTF_8), bb.getLong())
    }
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): MisraGriesAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): MisraGriesAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): MisraGriesAgg =
    copy(child = newChildren.head)
}

object MisraGriesAgg {
  /** Column face: `df.agg(MisraGriesAgg(tokensCol, 2000).as("summary"))`. */
  def apply(tokens: Column, k: Int): Column =
    Bridge.column(MisraGriesAgg(Bridge.expression(tokens), k)
      .toAggregateExpression(isDistinct = false))
}
