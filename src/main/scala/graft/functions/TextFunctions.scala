package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Text-analysis primitives for large-scale training-data pipelines.
  *
  * The reference delegates all scalar computation to user SQL / user Python
  * nodes (SURVEY.md §2.3 "Scalar functions"); here the north-star extension
  * supplies them natively. Everything is built from
  * `org.apache.spark.sql.functions` (codegen'd or JVM-native higher-order
  * functions) — no Scala UDFs, so plans stay whole-stage-codegen friendly
  * and column pruning / filter pushdown are preserved.
  */
object TextFunctions {

  /** Whitespace tokenization. `split` on `\s+` after trimming, so leading /
    * trailing blanks don't produce empty tokens. */
  def tokens(text: Column): Column =
    split(trim(text), "\\s+")

  /** Token count (whitespace tokenizer). Empty/blank text counts 0. */
  def tokenCount(text: Column): Column =
    when(length(trim(text)) === 0, lit(0)).otherwise(size(tokens(text)))

  /** The md5-coin threshold for probability `rate`, as a string comparable
    * against the first 8 hex digits of a key's md5: `md5hex8(key) <
    * coinThreshold(rate)` holds for a `rate` fraction of keys (1/2^32
    * granularity). rate ≥ 1.0 must be TOTAL — clamping to "ffffffff" and
    * comparing strictly would still lose md5-prefix-ffffffff keys, so a
    * total rate returns "g", which every hex digest sorts below. The ONE
    * home of this arithmetic: [[stableSplit]], `Selection.sampleStrata`
    * and the DuckDB oracles all evaluate exactly this formula. */
  private[graft] def coinThreshold(rate: Double): String =
    if (rate >= 1.0) "g" else f"${(rate * 4294967296.0).toLong}%08x"

  /** Deterministic, content-stable train/holdout assignment: md5 of the
    * key compared against an 8-hex-digit threshold ([[coinThreshold]]).
    * Stable across runs, engines and cluster layouts (md5 is
    * standardized — unlike xxhash64, this split is reproducible outside
    * Spark), unbiased w.r.t. key order, and requires no global count or
    * shuffle — the property a 100 TB eval holdout needs. `trainFrac`
    * resolves at 1/2^32 granularity. */
  def stableSplit(key: Column, trainFrac: Double,
                  trainLabel: String = "train",
                  holdoutLabel: String = "holdout"): Column = {
    require(trainFrac >= 0.0 && trainFrac <= 1.0, "trainFrac must be in [0,1]")
    when(substring(md5(key.cast("string")), 1, 8) < lit(coinThreshold(trainFrac)),
      trainLabel).otherwise(holdoutLabel)
  }

  /** BPE-ish subword count: number of matches of a GPT-2-style pre-tokenizer
    * regex (word pieces, numbers, punctuation runs). A cheap proxy for a real
    * tokenizer's token count on ASCII-ish text. */
  def bpeishTokenCount(text: Column): Column =
    coalesce(
      regexp_count(text, lit("[A-Za-z]+|[0-9]+|[^A-Za-z0-9\\s]+")), lit(0))

  /** Number of non-overlapping occurrences of `needle` in `text`, computed
    * by length differencing — portable across engines (same formula works in
    * ANSI SQL, used by the DuckDB oracles). */
  def occurrences(text: Column, needle: String): Column =
    ((length(text) - length(replace(text, lit(needle), lit("")))) /
      needle.length).cast("int")

  /** Per-language marker words for the n-gram/stopword language-ID
    * heuristic. Tiny on purpose: broadcast-able trivially, deterministic. */
  val langMarkers: Map[String, Seq[String]] = Map(
    "en" -> Seq("the", "and", "of", "to", "is"),
    "es" -> Seq("el", "la", "de", "que", "es"),
    "fr" -> Seq("le", "la", "les", "et", "est"),
    "de" -> Seq("der", "die", "und", "ist", "das"),
    "zh" -> Seq("的", "是", "了", "在", "我")
  )

  /** Fixed language order shared by [[langScores]] / [[langId]] — also the
    * deterministic tie-break order (first max wins). */
  val langOrder: Seq[String] = Seq("en", "es", "fr", "de", "zh")

  /** All languages' marker-token counts in ONE compiled pass over the token
    * array ([[MarkerCountsExpr]]): `array<int>` ordered by [[langOrder]]. */
  def langScores(text: Column): Column =
    MarkerCountsExpr(tokens(lower(text)), langOrder.map(langMarkers))

  /** Count of tokens that are markers for `lang` (one element of
    * [[langScores]]). */
  def langScore(text: Column, lang: String): Column =
    element_at(langScores(text), langOrder.indexOf(lang) + 1)

  /** HOF spec for [[langScore]]: an interpreted `filter` with an OR-chain
    * lambda — value-equivalent, kept as the cross-checked specification for
    * the native one-pass [[MarkerCountsExpr]]. */
  def langScoreHof(text: Column, lang: String): Column = {
    val markers = langMarkers(lang)
    size(filter(tokens(lower(text)), t => markers.map(m => t === lit(m)).reduce(_ || _)))
  }

  /** Language-ID: argmax of marker-token counts, `und` when all zero.
    * Ties break by [[langOrder]] (`array_position` finds the FIRST max —
    * deterministic). */
  def langId(text: Column): Column = {
    val sc = langScores(text)
    val best = array_max(sc)
    when(best.isNull || best <= 0, lit("und"))
      .otherwise(element_at(
        typedLit(langOrder), array_position(sc, best).cast("int")))
  }

  /** Ratio of punctuation characters to total characters (0 for empty). */
  def punctRatio(text: Column): Column =
    when(length(text) === 0, lit(0.0))
      .otherwise(
        (length(text) - length(regexp_replace(text, "[\\p{Punct}]", ""))).cast("double") /
          length(text).cast("double"))

  /** Ratio of English stopwords among tokens (0 for empty). */
  def stopwordRatio(text: Column): Column = {
    val cnt = langScore(text, "en")
    when(tokenCount(text) === 0, lit(0.0))
      .otherwise(cnt.cast("double") / tokenCount(text).cast("double"))
  }

  /** Composite quality score in [0,1]: length sweet-spot, low punctuation,
    * presence of stopwords. Deterministic; weights are arbitrary but fixed. */
  def qualityScore(text: Column): Column = {
    val lenScore = least(length(text).cast("double") / lit(500.0), lit(1.0))
    val punct = lit(1.0) - least(punctRatio(text) * 5.0, lit(1.0))
    val stop = least(stopwordRatio(text) * 4.0, lit(1.0))
    round(lenScore * 0.4 + punct * 0.3 + stop * 0.3, 6)
  }

  /** Fraction of tokens that are repeats of an earlier token:
    * `1 − |distinct tokens| / |tokens|` (0 for empty text) — the
    * within-document repetition signal of Gopher-style quality rules
    * (boilerplate, keyword stuffing, degenerate generations score high).
    * Exact integer ratio → engine-independent and oracle-checkable. */
  def tokenRepetition(text: Column): Column = {
    val toks = tokens(lower(text))
    when(tokenCount(text) === 0, lit(0.0))
      .otherwise(round(lit(1.0) -
        size(array_distinct(toks)).cast("double") /
          size(toks).cast("double"), 6))
  }

  /** Fraction of word bigrams that are repeats:
    * `1 − |distinct bigrams| / (|tokens| − 1)` (0 when fewer than 2
    * tokens). Catches looped phrases that token-level repetition misses.
    * Distinct bigrams come from the native [[WordShingleExpr]] (already
    * de-duplicated; for exactly 2 tokens its whole-text fallback IS the
    * one bigram, so the formula stays exact there). */
  def bigramRepetition(text: Column): Column = {
    val toks = tokens(lower(text))
    val n = tokenCount(text)
    when(n < 2, lit(0.0))
      .otherwise(round(lit(1.0) -
        size(HashFunctions.wordShingles(toks, 2)).cast("double") /
          (n - 1).cast("double"), 6))
  }

  /** Document fingerprint: md5 hex of the normalized text (lowercased,
    * whitespace collapsed). md5 is bit-identical across engines, so exact
    * dedup on the fingerprint is oracle-checkable. */
  def fingerprint(text: Column): Column =
    md5(regexp_replace(lower(trim(text)), "\\s+", " "))

  /** 64-bit rolling polynomial hash (base 31, natural Long overflow) over
    * the normalized text — the classic Rabin-Karp document fingerprint,
    * via the native [[PolyHashExpr]] (one compiled pass over the UTF-8
    * bytes). */
  def rollingFingerprint(text: Column): Column =
    PolyHashExpr(regexp_replace(lower(trim(text)), "\\s+", " "))

  /** PII patterns for detection/redaction, in REDACTION ORDER: email first
    * (its local part can contain digits a later pattern would chew on),
    * then IPv4 (dotted digits would otherwise feed the phone pattern),
    * then SSN (more specific than phone), then phone. Regexes use only
    * constructs with identical semantics in Java regex and RE2 (no
    * lookaround, no backreferences), so detection counts and redacted text
    * are engine-independent — DuckDB-oracle-checkable. Placeholders contain
    * no digits, so earlier replacements can never create later matches. */
  val piiPatterns: Seq[(String, String, String)] = Seq(
    ("email", "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}", "[EMAIL]"),
    ("ipv4", "\\b\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\b", "[IP]"),
    ("ssn", "\\b\\d{3}-\\d{2}-\\d{4}\\b", "[SSN]"),
    ("phone", "\\(?\\d{3}\\)?[-. ]\\d{3}[-. ]\\d{4}", "[PHONE]")
  )

  /** Number of matches of one PII pattern (by [[piiPatterns]] name). Counts
    * are computed on the ORIGINAL text — all four patterns see the same
    * input even though redaction is sequential. */
  def piiCount(text: Column, kind: String): Column = {
    val re = piiPatterns.collectFirst { case (`kind`, r, _) => r }
      .getOrElse(throw new IllegalArgumentException(s"unknown PII kind: $kind"))
    coalesce(regexp_count(text, lit(re)), lit(0)).cast("long")
  }

  /** Redact all [[piiPatterns]] with their placeholders, applied in
    * pattern order. The SSN count on redacted output can differ from
    * [[piiCount]] on raw text only where patterns overlap (e.g. an IPv4
    * inside a longer digit run) — redaction resolves overlaps by order,
    * detection counts each pattern independently. */
  def redactPii(text: Column): Column =
    piiPatterns.foldLeft(text) { case (c, (_, re, ph)) =>
      regexp_replace(c, re, ph)
    }

  /** All http(s) URLs in the text (regexp_extract_all; empty array for
    * none). A URL runs to the next whitespace — trailing punctuation is
    * kept, the standard crawl-extraction trade-off. */
  def extractUrls(text: Column): Column =
    regexp_extract_all(text, lit("https?://\\S+"), lit(0))

  /** Registrable-host part of a URL: the text between `://` and the first
    * `/`, `:`, `?` or `#` (NULL for a non-URL). The grouping key for
    * per-domain crawl statistics and domain-level dedup. */
  def urlDomain(url: Column): Column = {
    val d = regexp_extract(url, "https?://([^/\\s:?#]+)", 1)
    when(d === "", lit(null)).otherwise(d)
  }
}
