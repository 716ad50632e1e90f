package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.{BpeEncodeExpr, TextFunctions => T}

/** Corpus-trained byte-pair encoding — model-true token counts for the
  * selection/packing operators that would otherwise budget in whitespace
  * tokens. Public algorithm (Sennrich, Haddow & Birch 2016): training
  * greedily merges the most frequent adjacent symbol pair of a
  * word-frequency dictionary; encoding replays the merge list by rank.
  *
  * Split of labor (the [[CorpusStats.charLmModel]]/`charLmApply`
  * train-offline / score-on-ingest pattern):
  *  - [[train]] runs ONE corpus scan — a map-side-combined word count cut
  *    to the `topWords` head (`TakeOrderedAndProject`: O(topWords) per
  *    task, no global sort) — and iterates the merge loop driver-side
  *    over that bounded dictionary. Classic BPE training operates on the
  *    word-frequency table, not the corpus, so the driver's working set
  *    is `topWords` entries regardless of corpus size; the cut is the
  *    standard practice (rare words contribute counts ≤ their frequency
  *    to any pair and cannot move early merges).
  *  - [[encode]]/[[tokenCount]] embed the frozen merge table in a native
  *    scan-side expression ([[graft.functions.BpeEncodeExpr]]) — no UDF,
  *    no shuffle, no model join; the table ships with the plan.
  *
  * DETERMINISM: the word count, the `topWords` cut (count desc, word asc)
  * and the merge tie-break (count desc, then (left, right) lexicographic)
  * are all totally ordered, so training is reproducible across runs,
  * partitionings and engines; `BpeSpec` pins the classic
  * low/lower/newest/widest hand-derivable merge sequence. INVARIANT:
  * selected pair counts are non-increasing in rank — a merge can only
  * create pairs whose count is bounded by its own — which `BpeSpec`
  * asserts on fixture-trained tables. */
object Bpe {

  /** One trained merge: fuse (`left`, `right`) at priority `rank`
    * (0 = first); `count` is the pair's weighted frequency at the moment
    * it was selected. */
  final case class Merge(rank: Int, left: String, right: String, count: Long)

  /** Train `numMerges` merge ranks on the corpus. `text` is the
    * pre-tokenization input expression — pass `lower(trim(col))` for the
    * usual case-folded vocabulary; words are whitespace-split exactly as
    * [[graft.functions.TextFunctions.tokens]]. The dictionary is capped
    * at the `topWords` most frequent words (count desc, word asc — the
    * deterministic cut an oracle can replay). Training stops early when
    * no adjacent pair remains (tiny corpora). */
  def train(df: DataFrame, text: Column, numMerges: Int,
            topWords: Int = 65536): Seq[Merge] = {
    require(numMerges >= 1, "numMerges must be >= 1")
    require(topWords >= 1, "topWords must be >= 1")
    val dictRows = df.select(explode(T.tokens(text)).as("w"))
      .filter(col("w") =!= "")
      .groupBy("w").agg(count(lit(1)).as("c"))
      .orderBy(col("c").desc, col("w"))
      .limit(topWords)
      .collect()
    // mutable dictionary: (symbol sequence, word frequency)
    var dict: Array[(Array[String], Long)] = dictRows.map { r =>
      (r.getString(0).map(String.valueOf(_)).toArray, r.getLong(1))
    }
    val merges = scala.collection.mutable.ArrayBuffer.empty[Merge]
    var rank = 0
    var exhausted = false
    while (rank < numMerges && !exhausted) {
      val pairCounts = scala.collection.mutable.Map.empty[(String, String), Long]
      dict.foreach { case (syms, c) =>
        var i = 0
        while (i < syms.length - 1) {
          val k = (syms(i), syms(i + 1))
          pairCounts(k) = pairCounts.getOrElse(k, 0L) + c
          i += 1
        }
      }
      if (pairCounts.isEmpty) exhausted = true
      else {
        val ((l, r), c) = pairCounts.minBy { case ((l, r), c) => (-c, l, r) }
        merges += Merge(rank, l, r, c)
        dict = dict.map { case (syms, wc) =>
          if (!hasPair(syms, l, r)) (syms, wc)
          else {
            val next = new scala.collection.mutable.ArrayBuffer[String](syms.length)
            var j = 0
            while (j < syms.length) {
              if (j < syms.length - 1 && syms(j) == l && syms(j + 1) == r) {
                next += l + r; j += 2
              } else { next += syms(j); j += 1 }
            }
            (next.toArray, wc)
          }
        }
        rank += 1
      }
    }
    merges.toSeq
  }

  private def hasPair(syms: Array[String], l: String, r: String): Boolean = {
    var i = 0
    while (i < syms.length - 1) {
      if (syms(i) == l && syms(i + 1) == r) return true
      i += 1
    }
    false
  }

  /** Persist a trained merge table as a tiny (rank, left, right, count)
    * parquet relation — the tokenizer artifact a pipeline trains once and
    * every later job loads; numMerges rows, trivially small. */
  def save(spark: org.apache.spark.sql.SparkSession, merges: Seq[Merge],
           path: String): Unit = {
    import spark.implicits._
    merges.toDF("rank", "left", "right", "count")
      .coalesce(1).write.mode("overwrite").parquet(path)
  }

  /** Load a merge table persisted by [[save]], rank-ordered — feed
    * `.map(m => (m.left, m.right))` to [[encode]]. */
  def load(spark: org.apache.spark.sql.SparkSession, path: String): Seq[Merge] =
    spark.read.parquet(path).orderBy("rank").collect()
      .map(r => Merge(r.getInt(0), r.getString(1), r.getString(2), r.getLong(3)))
      .toSeq

  /** BPE token sequence of `text` under a frozen merge table
    * (`array<string>`, words concatenated in order). */
  def encode(text: Column, merges: Seq[(String, String)]): Column =
    BpeEncodeExpr(text, merges)

  /** BPE token count — the model-true replacement for whitespace
    * [[graft.functions.TextFunctions.tokenCount]] in token budgets,
    * packing and decile reports. */
  def tokenCount(text: Column, merges: Seq[(String, String)]): Column =
    size(encode(text, merges)).cast("long")
}
