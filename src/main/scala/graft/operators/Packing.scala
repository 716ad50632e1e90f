package graft.operators

import org.apache.spark.sql.{DataFrame, Encoders, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{IntegerType, LongType, StructField, StructType}

import graft.functions.{TextFunctions => T}

/** Sequence packing for LLM pretraining batch prep: assign each document to
  * a fixed-token-capacity training sequence (bin) so downstream tokenization
  * can concatenate bin members into context windows with minimal padding.
  *
  * The packing discipline is NEXT-FIT in a deterministic order: walk each
  * shard's documents in id order keeping one open bin; a document that
  * would overflow the open bin closes it and opens the next. Next-fit is
  * the only classic bin-packing discipline that needs O(1) state per
  * walker, which is what makes it distributable — first-fit/best-fit need
  * the whole bin list live and would serialize the corpus through one
  * task. The waste bound is the textbook one (next-fit uses < 2× optimal
  * bins); for training data that trade is standard practice since bins are
  * shuffled into batches anyway.
  *
  * Scale shape: one exchange (repartition by shard) + a partition-local
  * sort + a single linear scan per shard. Parallelism = number of shards;
  * pick shards ≈ a few × cluster cores and the scan is embarrassingly
  * parallel with O(1) memory per task — no global sort, no driver state,
  * no cross-shard coordination at any corpus size. The assignment is fully
  * deterministic given (shard column, id order, capacity) — independent of
  * cluster layout, partition count, or input row order — so it is
  * reproducible AND oracle-checkable (a recursive CTE replays the same
  * walk in ANSI SQL).
  *
  * Reference anchor: the reference buffers rows and flushes a batch when
  * the buffer reaches `buffer_size` (`/root/reference/bonobo_sqlalchemy/
  * writers.py:88-95`) — the same next-fit discipline over a row-count
  * capacity; here the capacity is a token budget and the walk is sharded.
  */
object Packing {

  /** Assign every row a `(shardCol, seq)` bin id: `seq` is the 0-based
    * index of the row's bin within its shard under next-fit in ascending
    * `idCol` order. A document larger than `capacity` gets a bin of its
    * own (emitted, not dropped — dropping is a filtering decision that
    * belongs to the caller). Empty documents (0 tokens) never overflow an
    * open bin that is within capacity and ride along in it; the one
    * exception is an open bin already OVER capacity from an oversize
    * document (fill > capacity makes fill + 0 > capacity), where the
    * zero-token doc rolls the bin and lands alone in a fresh one — the
    * same rule the oracle replays.
    *
    * Output: (idCol — original type, shardCol int, seq long). `idCol` must
    * be orderable and unique per row (it is the walk order); `tokenCol` is
    * cast to long. */
  def packSequences(df: DataFrame, idCol: String, tokenCol: String,
                    capacity: Long, shardCol: String): DataFrame = {
    require(capacity > 0, "capacity must be positive")
    val idField = df.schema(idCol)
    val outSchema = StructType(Seq(
      StructField(idCol, idField.dataType, idField.nullable),
      StructField(shardCol, IntegerType, nullable = false),
      StructField("seq", LongType, nullable = false)))
    // null tokens count 0 (they cannot overflow a bin); a null shard is a
    // caller bug and fails fast in the scan rather than silently grouping
    val slim = df.select(col(shardCol).cast("int"), col(idCol),
      coalesce(col(tokenCol).cast("long"), lit(0L)))
    // One walker per shard: the repartition guarantees a shard never spans
    // tasks, the sort fixes the walk order, and the scan carries only
    // (current shard, open-bin fill, bin index) — O(1) task state.
    slim.repartition(col(shardCol))
      .sortWithinPartitions(col(shardCol), col(idCol))
      .mapPartitions { rows =>
        var shard = Int.MinValue
        var first = true
        var seq = 0L
        var fill = 0L
        rows.map { r =>
          val sh = r.getInt(0)
          val n = r.getLong(2)
          if (first || sh != shard) { shard = sh; first = false; seq = 0L; fill = 0L }
          else if (fill > 0 && fill + n > capacity) { seq += 1; fill = 0L }
          fill += n
          Row(r.get(1), sh, seq)
        }
      }(Encoders.row(outSchema))
  }

  /** Sliding-window document chunking: split each document's whitespace
    * tokens into windows of `chunkTokens` tokens advancing by
    * `chunkTokens − overlap` — the long-document preprocessing step ahead
    * of [[packSequences]] (chunk to ≤ context size, then pack chunks).
    * Chunk starts are `range(0, max(n − overlap, 1), step)`, so the final
    * window always contributes ≥ 1 new token (no fully-redundant trailing
    * chunk) and a document shorter than one window yields exactly one
    * chunk. Zero-token documents yield none. Chunk text re-joins tokens
    * with single spaces (whitespace runs are normalized — the tokenizer
    * already erased their shape).
    *
    * Purely scan-side: tokens, starts and slices are one generated
    * projection per row — no shuffle, no state, corpus-linear. Output:
    * (idCol, chunk 0-based long, chunk_text, n_tokens). Deterministic and
    * engine-independent (the oracle replays the same slicing in SQL). */
  def chunkDocuments(df: DataFrame, textCol: String, idCol: String,
                     chunkTokens: Int, overlap: Int = 0): DataFrame = {
    require(chunkTokens > 0, "chunkTokens must be positive")
    require(overlap >= 0 && overlap < chunkTokens,
      "overlap must be in [0, chunkTokens)")
    val step = chunkTokens - overlap
    df.select(col(idCol), T.tokens(col(textCol)).as("__toks"),
        T.tokenCount(col(textCol)).cast("int").as("__n"))
      .filter(col("__n") > 0)
      .select(col(idCol), col("__toks"), col("__n"),
        posexplode(sequence(lit(0),
          greatest(col("__n") - overlap, lit(1)) - 1, lit(step)))
          .as(Seq("chunk", "__start")))
      .select(col(idCol), col("chunk").cast("long").as("chunk"),
        array_join(slice(col("__toks"), col("__start") + 1, lit(chunkTokens)), " ")
          .as("chunk_text"),
        least(lit(chunkTokens), col("__n") - col("__start")).cast("long")
          .as("n_tokens"))
  }
}
