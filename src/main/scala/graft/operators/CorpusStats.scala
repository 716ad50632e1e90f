package graft.operators

import org.apache.spark.sql.{DataFrame, Column}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.{HashFunctions => H, TextFunctions => T}

/** Corpus-level vocabulary and term-weight statistics — the profiling side
  * of training-data curation: what the corpus is made of (dominant n-grams,
  * boilerplate candidates for `maxDf` stop lists) and what each document is
  * about (tf-idf keywords for topic mixing / dedup explanations).
  *
  * Everything is exact integer or round-6 arithmetic over the same
  * tokenizer/shingler as the dedup operators ([[graft.functions
  * .TextFunctions.tokens]], [[graft.functions.HashFunctions
  * .wordShingles]]), so results are engine-independent and DuckDB
  * oracle-checkable, and a stop list produced here plugs directly into
  * [[Dedup.ngramJaccardPairs]]'s `maxDf` semantics.
  */
object CorpusStats {

  /** Top-`k` word `shingleSize`-grams by DOCUMENT frequency (shingle sets
    * are distinct per document, so `count` counts documents, not
    * occurrences). The corpus-profiling primitive: its head is exactly the
    * boilerplate the pair joins' `maxDf` guard drops, so this query IS the
    * stop-shingle candidate report.
    *
    * Scale shape: one scan-side shingle explode, one map-side-combined
    * aggregation on the gram key, then `TakeOrderedAndProject` for the
    * top-k (each task keeps k rows; no global sort, no single-task
    * stratum) — O(k) driver result at any corpus size. */
  def vocabTopK(df: DataFrame, textCol: String, idCol: String,
                shingleSize: Int = 3, k: Int = 100): DataFrame =
    df.select(col(idCol),
        explode(H.wordShingles(T.tokens(trim(lower(col(textCol)))), shingleSize))
          .as("gram"))
      .groupBy("gram").agg(count(lit(1)).as("df"))
      .orderBy(col("df").desc, col("gram"))
      .limit(k)

  /** Per-document top-`k` tf-idf keywords: term frequency × ln(N/df),
    * rounded to 6 decimals BEFORE ranking (ties then break on the term
    * string) so the cut is engine-independent — ln differs from DuckDB's
    * by at most an ulp, which round-6 absorbs except within 2⁻⁵² of a
    * rounding boundary. Empty terms (blank documents tokenize to [""])
    * are excluded.
    *
    * Scale shape: tf is one composite-key (doc, term) aggregation; df is
    * a second aggregation over the tf relation (already one row per
    * doc×term — cheaper than re-scanning text); N is a one-row broadcast;
    * the per-document top-k plans a WindowGroupLimit, so each task keeps
    * k rows per document ahead of the final exchange. */
  def tfidfTopK(df: DataFrame, textCol: String, idCol: String,
                k: Int = 5): DataFrame = {
    // token explode is cheap scan-side work; the gated repartition measured
    // slower here (tfidf_topk 1.36x) — aggregation exchanges dominate
    val terms = df.select(col(idCol),
        explode(T.tokens(trim(lower(col(textCol))))).as("term"))
      .filter(col("term") =!= "")
    val tf = terms.groupBy(col(idCol), col("term"))
      .agg(count(lit(1)).as("tf"))
    val dfreq = tf.groupBy("term").agg(count(lit(1)).as("df"))
    val nDocs = df.select(count_distinct(col(idCol)).as("__n"))
    val w = Window.partitionBy(idCol)
      .orderBy(col("tfidf").desc, col("term"))
    tf.join(dfreq, Seq("term"))
      .crossJoin(broadcast(nDocs))
      .withColumn("tfidf",
        round(col("tf") * log(col("__n").cast("double") / col("df")), 6))
      .withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= k)
      .select(col(idCol), col("term"), col("tf"), col("df"),
        col("tfidf"), col("rank"))
  }

  /** Corpus-self-trained character-n-gram LM quality scoring — the
    * language-model quality filter of a training-data pipeline reduced to
    * an exact-integer contract: the "model" is the corpus's `topV` most
    * frequent character `n`-grams with their occurrence counts (ties cut
    * deterministically by count desc, gram asc), and each document scores
    *  - `n_grams`   — its total n-gram occurrences,
    *  - `freq_sum`  — the sum of the model counts of its n-grams (0 for
    *                  out-of-model grams): high = conventional text, low =
    *                  gibberish/encoding noise relative to the corpus,
    *  - `oov`       — how many of its n-gram occurrences fall outside the
    *                  model (the rarity mass itself).
    * A float perplexity would rank identically (it is a monotone transform
    * of these counts under an additive-smoothed unigram-over-n-grams LM)
    * but would be hash-fragile across engines; the integer triple is the
    * engine-independent form, and callers derive e.g.
    * `freq_sum / n_grams` as the quality signal. Documents shorter than
    * `n` characters score (0, 0, 0).
    *
    * Scale shape: two corpus scans (model pass, score pass) — the
    * exploded gram relation is n_chars rows per doc, too wide to be worth
    * persisting at 100 TB, so it is re-derived rather than cached. The
    * model aggregation is map-side combined on the gram key and cut to
    * `topV` via TakeOrderedAndProject (O(topV) per task, no global sort);
    * scoring is a broadcast hash join of the topV-row model into the
    * exploded scan, re-aggregated per document (docs are not split across
    * partitions, so partial aggregation collapses to ~one row per doc
    * before the exchange). */
  def charLmScore(df: DataFrame, textCol: String, idCol: String,
                  n: Int = 3, topV: Int = 5000): DataFrame =
    // The model is ≤ topV rows by construction, so for any sane topV the
    // score pass takes the ZERO-SHUFFLE scan path: collect the model once
    // (bounded — the same discipline as the BPE merge table) and score
    // every document in one compiled projection, instead of exploding
    // n_chars gram rows per document through a broadcast join, a
    // per-document re-aggregation exchange and a join-back (optimization
    // guide §2.3/§2.4: the explode+join pipeline shuffled two corpus-sized
    // relations the projection form never materializes — measured 4.2 s →
    // ~1.9 s on `chargram_lm` at sf0.1, identical rows). An absurdly
    // large topV keeps the join path — the model is then not
    // driver-resident by construction.
    if (topV <= 1000000) {
      // one gated repartition shared by the model's gram explode and the
      // scan-side score pass (charLmApplyScan itself stays exchange-free —
      // its zero-shuffle/stream-native contract is the point)
      val dfp = graft.core.ScanParallelism.ensure(df)
      charLmApplyScan(
        charLmModel(dfp, textCol, n, topV).collect()
          .map(r => (r.getString(0), r.getLong(1))).toSeq,
        dfp, textCol, idCol, n)
    } else
      charLmApply(charLmModel(df, textCol, n, topV), df, textCol, idCol, n)

  /** The trained half of [[charLmScore]]: the corpus's `topV` most
    * frequent character `n`-grams with occurrence counts (`gram`, `__c`),
    * tie-cut deterministically by count desc then gram. Persist this once
    * (it is topV rows — trivially small) and apply it to later batches or
    * to a STREAM with [[charLmApply]]: the production regime is
    * train-offline / score-on-ingest, not per-batch refitting. */
  def charLmModel(df: DataFrame, textCol: String, n: Int = 3,
                  topV: Int = 5000): DataFrame = {
    require(n >= 1, "n-gram size must be >= 1")
    df.select(explode(charGrams(col(textCol), n)).as("gram"))
      .groupBy("gram").agg(count(lit(1)).as("__c"))
      .orderBy(col("__c").desc, col("gram"))
      .limit(topV)
  }

  /** Score `df` against a FROZEN [[charLmModel]] — `df` may be a batch
    * relation or a streaming one (the model join is a stream-static
    * broadcast join; the per-doc aggregation is then a streaming agg the
    * caller windows/outputs as usual). Zero-gram docs (shorter than `n`)
    * score (0, 0, 0) via the left join back to the input ids — on a
    * stream that join is stream-stream on the id and the caller usually
    * skips it by scoring only docs with text, so the batch path does it
    * here and the streaming path tolerates dropped empty docs. */
  def charLmApply(model: DataFrame, df: DataFrame, textCol: String,
                  idCol: String, n: Int = 3): DataFrame = {
    require(n >= 1, "n-gram size must be >= 1")
    val occ = df.select(col(idCol), explode(charGrams(col(textCol), n)).as("gram"))
    val scored = occ.join(broadcast(model), Seq("gram"), "left")
      .groupBy(idCol)
      .agg(count(lit(1)).as("n_grams"),
        sum(coalesce(col("__c"), lit(0L))).as("freq_sum"),
        sum(when(col("__c").isNull, 1L).otherwise(0L)).as("oov"))
    if (df.isStreaming) scored
    else
      df.select(col(idCol)).join(scored, Seq(idCol), "left")
        .select(col(idCol),
          coalesce(col("n_grams"), lit(0L)).as("n_grams"),
          coalesce(col("freq_sum"), lit(0L)).as("freq_sum"),
          coalesce(col("oov"), lit(0L)).as("oov"))
  }

  /** The ZERO-SHUFFLE apply path of [[charLmApply]] for a frozen,
    * driver-resident model (`(gram, count)` pairs, ≤ topV entries when it
    * came from [[charLmModel]]): the whole score is one native scan-side
    * expression ([[graft.functions.CharLmScoreExpr]] — the same code-point
    * windows as the exploded path, hash-map lookups in a single compiled
    * pass per document), so the plan has no explode, no model join, no
    * re-aggregation exchange and no join-back, and the SAME call works
    * unchanged on a STREAMING DataFrame (stateless projection). Output
    * shape and values match [[charLmApply]] row for row on unique-id
    * inputs (`CorpusStatsSpec` pins parity; duplicate ids differ by
    * construction — the join path SUMS duplicates into one score and
    * replays it per row, the scan path scores each row's own text). */
  def charLmApplyScan(model: Seq[(String, Long)], df: DataFrame,
                      textCol: String, idCol: String, n: Int = 3): DataFrame = {
    require(n >= 1, "n-gram size must be >= 1")
    val out = graft.functions.CharLmScoreExpr(
      trim(lower(col(textCol))), model, n)
    df.select(col(idCol), out.as("__s"))
      .select(col(idCol),
        coalesce(col("__s.n_grams"), lit(0L)).as("n_grams"),
        coalesce(col("__s.freq_sum"), lit(0L)).as("freq_sum"),
        coalesce(col("__s.oov"), lit(0L)).as("oov"))
  }

  /** Sliding char `n`-grams WITH multiplicity (unlike the deduplicating
    * shingle expressions); texts shorter than `n` yield an empty array.
    * Native [[graft.functions.CharGramsExpr]] — one compiled loop per
    * document instead of an interpreted substring lambda per position
    * (the HOF form measured ~2× slower on the chargram_lm bench). */
  private def charGrams(c: Column, n: Int): Column =
    graft.functions.CharGramsExpr(trim(lower(c)), n)

  /** Cross-group duplication matrix: for every pair of `groupCol` values
    * (sources, crawls, snapshots), the number of distinct word
    * `shingleSize`-grams they share — the curation report that says which
    * sources re-publish each other's text and should be deduped against
    * each other first. Exact integer counts over the dedup operators' own
    * shingler, so the report's numbers mean the same thing as the pair
    * joins' overlap arithmetic (and are DuckDB oracle-checkable).
    *
    * Scale shape: one scan-side shingle explode → distinct (group, gram)
    * — the relation is corpus-shingle-bounded but the JOIN fan-out is not
    * corpus-bounded, it is GROUP-bounded: a gram appearing in g groups
    * contributes C(g,2) rows and g ≤ |distinct groups|, so with a
    * recipe-sized `groupCol` (sources, not documents) the self-join can
    * never go corpus-quadratic the way a document-level pair join can.
    * That bound is an assumption about `groupCol`'s cardinality, not a
    * property of the plan — a high-cardinality group column (e.g. domain)
    * combined with ubiquitous boilerplate grams re-creates the quadratic
    * blow-up. `maxGroups > 0` makes the bound real: grams present in more
    * than `maxGroups` groups are dropped before the join (the [[Dedup
    * .ngramJaccardPairs]] `maxDf` guard, one counting aggregation over the
    * already-cached relation) — such grams are boilerplate by definition
    * and dominate the fan-out while carrying no pairwise signal. Both join
    * sides read the cached relation; output is C(|groups|, 2) rows at
    * most. */
  def groupOverlap(df: DataFrame, textCol: String, groupCol: String,
                   shingleSize: Int = 8, maxGroups: Int = 0): DataFrame = {
    // persist the distinct (group, gram) relation: both join sides read it,
    // and without the cache each side re-shingles the corpus (two full
    // scans + two distinct exchanges — the plan showed no ReusedExchange
    // because AQE may broadcast one side, breaking subplan identity)
    val all = df.select(col(groupCol).as("__grp"),
        explode(H.wordShingles(T.tokens(trim(lower(col(textCol)))), shingleSize))
          .as("__g"))
      .distinct()
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    // stop-gram guard: a gram in > maxGroups groups would fan out C(g,2)
    // join rows; the rare-gram filter reads the cached relation once more
    val grams =
      if (maxGroups <= 0) all
      else {
        val rare = all.groupBy("__g").agg(count(lit(1)).as("__ng"))
          .filter(col("__ng") <= maxGroups).select("__g")
        all.join(rare, Seq("__g"))
      }
    val a = grams.select(col("__grp").as("group_a"), col("__g"))
    val b = grams.select(col("__grp").as("group_b"), col("__g"))
    val out = a.join(b, Seq("__g"))
      .filter(col("group_a") < col("group_b"))
      .groupBy("group_a", "group_b")
      .agg(count(lit(1)).as("n_shared"))
    // cache lifecycle note: `rare` and both join sides all read `all`, and
    // the release below fires after the FIRST consuming action — correct
    // for the intended use (one action consumes this whole plan), but a
    // caller that materializes an intermediate (e.g. collects `rare`
    // separately before running the join) would recompute `all` uncached
    // on the second action. Consume the returned DataFrame in one action.
    graft.core.CacheAutoRelease.afterFirstUse(all)
    out
  }
}
