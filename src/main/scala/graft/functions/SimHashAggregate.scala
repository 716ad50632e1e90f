package graft.functions

import java.nio.ByteBuffer

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, XXH64}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.sql.types.{DataType, LongType}

/** GROUP-level 64-bit SimHash: the sketch of every member row's tokens
  * combined — per bit, the sign of the summed ±1 votes across ALL tokens
  * of ALL rows in the group. Used to fingerprint a whole slice of a corpus
  * (a domain, a source, a language) so slices can be compared for
  * wholesale duplication without comparing their documents pairwise.
  *
  * Why a custom [[TypedImperativeAggregate]]: vote counters are
  * associative and commutative, so Spark runs this with map-side partial
  * aggregation — each task reduces its rows to one 64-counter buffer
  * (256 bytes) and only buffers cross the exchange. The declarative
  * alternative (explode 64 (bit, vote) rows per document and sum) shuffles
  * 64 rows per document; at corpus scale that is the difference between
  * exchanging kilobytes per task and exchanging the tokenized corpus.
  * Value-equivalent to [[SimHashExpr]] over the concatenation of the
  * group's token arrays (vote addition commutes — order never matters);
  * null token elements are skipped, like every sketch in this package.
  */
case class SimHashAgg(
    child: Expression,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[Array[Int]] {

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = false
  override def dataType: DataType = LongType
  override def prettyName: String = "simhash64_agg"

  override def createAggregationBuffer(): Array[Int] = new Array[Int](64)

  override def update(votes: Array[Int], input: InternalRow): Array[Int] = {
    val tokens = child.eval(input)
    if (tokens != null) {
      val arr = tokens.asInstanceOf[ArrayData]
      val n = arr.numElements()
      var t = 0
      while (t < n) {
        val s = arr.getUTF8String(t)
        if (s != null) {
          val h = XXH64.hashUTF8String(s, 42L)
          var i = 0
          while (i < 64) {
            if (((h >>> i) & 1L) == 1L) votes(i) += 1 else votes(i) -= 1
            i += 1
          }
        }
        t += 1
      }
    }
    votes
  }

  override def merge(a: Array[Int], b: Array[Int]): Array[Int] = {
    var i = 0
    while (i < 64) { a(i) += b(i); i += 1 }
    a
  }

  override def eval(votes: Array[Int]): Any = {
    var sketch = 0L
    var i = 0
    while (i < 64) {
      if (votes(i) > 0) sketch |= (1L << i)
      i += 1
    }
    sketch
  }

  override def serialize(votes: Array[Int]): Array[Byte] = {
    val bb = ByteBuffer.allocate(64 * 4)
    votes.foreach(bb.putInt)
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): Array[Int] = {
    val bb = ByteBuffer.wrap(bytes)
    Array.fill(64)(bb.getInt())
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): SimHashAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): SimHashAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): SimHashAgg =
    copy(child = newChildren.head)
}

object SimHashAgg {
  /** Column face: `df.groupBy(g).agg(SimHashAgg(tokensCol).as("sketch"))`. */
  def apply(tokens: Column): Column =
    Bridge.column(SimHashAgg(Bridge.expression(tokens))
      .toAggregateExpression(isDistinct = false))
}
