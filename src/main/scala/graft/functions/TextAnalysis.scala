package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Column-level text-analysis functions for large-scale corpus pipelines.
  *
  * Everything here is built from Spark's native (non-UDF) expressions —
  * string ops and higher-order array functions — so the whole surface
  * stays in Catalyst, is null-safe, and runs without object
  * serialization in the hot path. Each function has an exact DuckDB
  * translation (used by the oracle suite): integer/sequential-fold
  * arithmetic only, so results are engine-portable bit-for-bit.
  */
object TextAnalysis {

  /** Whitespace tokenization (runs of whitespace collapse). */
  def tokens(text: Column): Column = split(trim(text), "\\s+")

  def tokenCount(text: Column): Column = size(tokens(text))

  def distinctTokenCount(text: Column): Column = size(array_distinct(tokens(text)))

  /** Sum of token lengths (exact integer; divide by tokenCount for the
    * mean without float-order hazards).
    */
  def tokenLenSum(text: Column): Column =
    aggregate(tokens(text), lit(0L), (acc, t) => acc + length(t).cast("long"))

  /** Number of tokens that appear in `stopwords` (duplicates counted). */
  def stopwordCount(text: Column, stopwords: Seq[String]): Column =
    size(filter(tokens(text), t => t.isin(stopwords: _*))).cast("long")

  /** Polynomial rolling hash of the full text: fold (acc*31 + code) % p
    * over Unicode code points. Backed by the codegen'd native
    * [[RollingHash]] expression; value-identical to the interpreted
    * fold aggregate(transform(split(s,''), ascii), 0, (a,c)->(a*31+c)%p)
    * and to DuckDB's list_reduce equivalent.
    */
  def rollingHash(text: Column, p: Long = 1000000007L): Column = {
    import org.apache.spark.sql.graftbridge.Bridge
    Bridge.column(RollingHash(Bridge.expression(text), p))
  }

  /** Rolling hash of an arbitrary string column (used for shingles). */
  def stringHash(c: Column, p: Long = 1000000007L): Column = rollingHash(c, p)

  /** Heuristic language guess from stopword hits (deterministic CASE
    * cascade; ties resolve in en > de > es precedence order).
    * Counts all three stopword lists in ONE fold over the token array
    * with a PRIMITIVE long accumulator — the three counts pack into
    * disjoint 20-bit fields (en | de<<20 | es<<40), so the hot loop is
    * pure long arithmetic. The earlier struct-typed accumulator kept
    * the fold in one pass but boxed a new InternalRow per token
    * (struct-valued lambdas don't stay primitive), which made t04 the
    * slowest line of the whole bench (6.2 s at sf0.1). Each field
    * SATURATES at 2^20 - 1: a hit increments its field only while the
    * field is below the cap, so a pathological document with >= 2^20
    * hits in one list clamps that count instead of overflowing into
    * the neighboring field (the comparison cascade is unaffected — any
    * clamped field is already the maximum).
    */
  def langGuess(text: Column): Column = {
    val enW = Seq("the", "a", "of", "and", "to", "in")
    val deW = Seq("der", "die", "das", "und", "ist")
    val esW = Seq("el", "la", "de", "que", "y")
    val mask = lit((1L << 20) - 1L)
    def hit(acc: Column, t: Column, ws: Seq[String], shift: Int) =
      when(t.isin(ws: _*) &&
          shiftright(acc, shift).bitwiseAND(mask) < mask, lit(1L << shift))
        .otherwise(0L)
    val packed = aggregate(tokens(text), lit(0L),
      (acc, t) => acc + hit(acc, t, enW, 0) + hit(acc, t, deW, 20) + hit(acc, t, esW, 40))
    val en = packed.bitwiseAND(mask)
    val de = shiftright(packed, 20).bitwiseAND(mask)
    val es = shiftright(packed, 40).bitwiseAND(mask)
    // null text pins to "en" (the all-counts-equal tie default) — the
    // aggregate over a null token array yields null counts, which would
    // otherwise fall through every comparison to the "es" branch.
    when(text.isNull, "en")
      .when(en >= de && en >= es, "en").when(de >= es, "de").otherwise("es")
  }

  /** Occurrence count of the most frequent token (0 for empty/blank
    * text). O(n·distinct) per document — a per-row scan over arrays
    * that are at most a few hundred elements, never a shuffle.
    */
  def maxTokenFreq(text: Column): Column = modeCount(tokens(text))

  /** Space-joined k-grams of the whitespace tokens (k >= 2).
    * Built from aligned slices + a zip_with fold so a doc with fewer
    * than k tokens yields an empty array instead of a slice error.
    */
  def tokenNgrams(text: Column, k: Int): Column = {
    require(k >= 2, s"tokenNgrams needs k >= 2, got $k")
    val toks = tokens(text)
    val m = greatest(size(toks) - (k - 1), lit(0))
    (2 to k).foldLeft(slice(toks, lit(1), m)) { (acc, j) =>
      zip_with(acc, slice(toks, lit(j), m), (a, b) => concat_ws(" ", a, b))
    }
  }

  /** Occurrence count of the most frequent element of an array column
    * (0 when empty). Same O(n·distinct) per-row shape as
    * [[maxTokenFreq]].
    */
  def modeCount(arr: Column): Column =
    coalesce(
      array_max(transform(array_distinct(arr),
        d => size(filter(arr, x => x === d)).cast("long"))),
      lit(0L))

  /** Gopher-style conjunctive keep verdict (t14's rule set, shared by
    * the batch filter and the streaming router so the two can never
    * drift): word count >= 40, mean word length in [3, 10], lexical
    * diversity >= 0.5, >= 2 stopword hits, most-frequent-token
    * fraction <= 0.12. Thresholds apply to RAW integer-derived ratios
    * — no rounding in the decision path. Null text is an explicit
    * REJECT (false, not null): every conjunct null-propagates, and a
    * null verdict would route a third group in the streaming router
    * while the oracle's CASE WHEN yields 0.
    */
  def qualityKeep(text: Column, stopwords: Seq[String]): Column = {
    val n = tokenCount(text).cast("long")
    val nd = n.cast("double")
    val mwl = tokenLenSum(text).cast("double") / nd
    val div = distinctTokenCount(text).cast("double") / nd
    val mf = maxTokenFreq(text).cast("double") / nd
    coalesce(
      (n >= 40) && (mwl >= 3.0 && mwl <= 10.0) && (div >= 0.5) &&
        (stopwordCount(text, stopwords) >= 2) && (mf <= 0.12),
      lit(false))
  }

  /** Composite quality score in [0,1]: lexical diversity + length +
    * stopword presence. Pure per-row double arithmetic from exact
    * integers (engine-portable).
    */
  def qualityScore(text: Column, stopwords: Seq[String]): Column = {
    val n = tokenCount(text).cast("double")
    val diversity = distinctTokenCount(text).cast("double") / n
    val lengthScore = least(lit(1.0), n / 100.0)
    val stopRatio = stopwordCount(text, stopwords).cast("double") / n
    round(diversity * 0.4 + lengthScore * 0.3 + stopRatio * 0.3, 6)
  }

  // ---------- fastText-shaped hashed-ngram linear scorer ----------

  /** Hashing-trick feature buckets for a fastText-shaped linear text
    * classifier (Joulin et al. 2016 model shape: bag of unigrams +
    * bigrams, each hashed into one of `dim` buckets). One pass over
    * the token array with higher-order functions only — no explode, no
    * shuffle; the per-document feature vector never materializes wider
    * than the token list itself.
    */
  def hashedNgramBuckets(text: Column, dim: Int): Column = {
    val toks = tokens(text)
    val n = size(toks)
    val bigrams = zip_with(
      slice(toks, lit(1), n - 1), slice(toks, lit(2), n - 1),
      (a, b) => concat(a, lit(" "), b))
    transform(concat(toks, bigrams), f => pmod(stringHash(f), lit(dim.toLong)))
  }

  /** The fixed weight of one hashed feature bucket: a Knuth
    * multiplicative hash of the bucket id folded into the symmetric
    * integer range [-(wMod-1)/2, (wMod-1)/2]. A deterministic
    * stand-in for a trained weight table: integer-exact, so the doc
    * score (mean of feature weights) is engine-portable with a single
    * final division.
    */
  def bucketWeight(bucket: Column, wMod: Long = 2000003L): Column =
    bucket * lit(2654435761L) % lit(wMod) - lit((wMod - 1) / 2)

  /** Aggressive normalization for "fuzzy-exact" dedup (the
    * RefinedWeb-style pass that catches case / punctuation /
    * whitespace variants byte-exact dedup misses): lowercase, collapse
    * every run of non-alphanumerics to one space, trim. RE2-subset
    * regex — Spark's java.util.regex and DuckDB's RE2 agree.
    */
  def normalizedText(text: Column): Column =
    trim(regexp_replace(lower(text), "[^a-z0-9]+", " "))
}
