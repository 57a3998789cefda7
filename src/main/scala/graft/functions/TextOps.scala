package graft.functions

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Text-pipeline operators over the `documents` table: normalization, exact
  * content dedup, and cheap text statistics. All pure column expressions —
  * codegen'd, shuffle only where an aggregation/window demands it, safe at
  * 100 TB (dedup shuffles on a 256-bit fingerprint, which is uniformly
  * distributed — no skew).
  */
object TextOps {

  /** Canonical text form for content identity: lowercase, trimmed, runs of
    * whitespace collapsed to one space.
    */
  def normalized(text: Column): Column =
    regexp_replace(lower(trim(text)), "\\s+", " ")

  /** 256-bit content fingerprint of the normalized text. At scale the
    * fingerprint (not the text) is the shuffle key: 32 bytes per row,
    * uniformly distributed.
    */
  def fingerprint(text: Column): Column = sha2(normalized(text), 256)

  /** Exact dedup: keep one representative per normalized content — the
    * smallest `idCol` (deterministic). One shuffle on the fingerprint.
    */
  def dedupExact(docs: DataFrame, textCol: String = "text", idCol: String = "doc_id"): DataFrame = {
    val w = Window.partitionBy(fingerprint(col(textCol))).orderBy(col(idCol))
    docs.withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1)
      .drop("__rn")
  }

  /** Whitespace token count; 0 for empty/blank text. */
  def tokenCount(text: Column): Column =
    when(length(trim(text)) === 0, lit(0)).otherwise(size(split(trim(text), "\\s+")))

  /** BPE-ish subword token count: letter runs, digit runs, and individual
    * non-alphanumeric marks each count as one token (the pre-tokenization
    * grain BPE vocabularies split on). The pattern uses only constructs with
    * identical semantics across regex engines, so it is oracle-checkable.
    */
  val BpeTokenPattern = "[A-Za-z]+|[0-9]+|[^A-Za-z0-9\\s]"

  def bpeTokenCount(text: Column): Column =
    size(regexp_extract_all(text, lit(BpeTokenPattern), lit(0)))

  /** Quality-score features: char/token counts, mean token length,
    * punctuation and digit ratios. All single-pass column expressions.
    */
  def withTextStats(docs: DataFrame, textCol: String = "text"): DataFrame = {
    val t = col(textCol)
    val chars = length(t)
    docs
      .withColumn("n_chars_actual", chars)
      .withColumn("n_tokens", tokenCount(t))
      .withColumn("n_punct", chars - length(regexp_replace(t, "[\\p{Punct}]", "")))
      .withColumn("n_digits", chars - length(regexp_replace(t, "[0-9]", "")))
  }

  /** Stopword lists for the n-gram-free language-ID heuristic. */
  val stopwords: Seq[(String, Seq[String])] = Seq(
    "en" -> Seq("the", "and", "of", "to", "in", "is", "that", "it", "for", "on", "with", "as", "at", "this", "a", "an"),
    "de" -> Seq("der", "die", "und", "das", "ist", "nicht", "mit", "ein", "zu", "den", "von", "auf", "für"),
    "es" -> Seq("el", "la", "los", "las", "es", "un", "una", "de", "que", "por", "para", "con"),
    "fr" -> Seq("le", "les", "et", "est", "une", "du", "que", "pour", "dans", "sur", "pas", "il"))

  /** Language ID: the language whose stopwords cover the largest fraction
    * of tokens; "und" (undetermined) when nothing matches. Deterministic
    * tie-break: lexicographically largest language code wins (struct max).
    */
  def langId(text: Column): Column = {
    val tokens = split(normalized(text), " ")
    val scored = stopwords.map { case (lang, words) =>
      val hits = size(filter(tokens, t => t.isInCollection(words)))
      struct((hits.cast("double") / greatest(size(tokens), lit(1))).as("score"), lit(lang).as("lang"))
    }
    val best = greatest(scored: _*)
    when(best.getField("score") > 0, best.getField("lang")).otherwise(lit("und"))
  }

  /** Heuristic quality score in [0, 1]: half alphabetic-character ratio,
    * half (capped) English-stopword density, zeroed for degenerate token
    * counts. Per-row scalar math — bit-identical across engines.
    */
  def qualityScore(text: Column): Column = QualityExprs.qualityScore(text)

  /** The original composed Column form of the quality score — the
    * SEMANTICS REFERENCE: the DuckDB oracles replay this expression tree
    * token for token, and `QualitySpec` pins the native kernel
    * ([[QualityKernel.score]], what [[qualityScore]] now runs) bit-equal
    * to it over randomized adversarial texts.
    */
  private[functions] def qualityScoreComposed(text: Column): Column = {
    val chars = greatest(length(text), lit(1))
    val alphaRatio = (chars - length(regexp_replace(text, "[a-zA-Z ]", ""))).cast("double") / chars
    val tokens = split(normalized(text), " ")
    val stopHits = size(filter(tokens, t => t.isInCollection(stopwords.head._2)))
    val stopRatio = stopHits.cast("double") / greatest(size(tokens), lit(1))
    val lengthOk = tokenCount(text).between(5, 100000).cast("double")
    lengthOk * (lit(0.5) * alphaRatio + lit(0.5) * least(stopRatio * 5, lit(1.0)))
  }

  /** Winnowing document fingerprints: rolling k-gram hashes thinned to the
    * minimum of each w-window (Schleimer et al.'s winnowing scheme) —
    * a compact, position-robust fingerprint set for overlap detection.
    */
  /** Binds `v` as a lambda variable so downstream references evaluate an
    * ATTRIBUTE, not the originating expression tree: inside nested
    * higher-order-function lambdas Spark re-evaluates referenced child
    * expressions per element (no cross-lambda subexpression elimination),
    * which turns an O(n) winnow into O(n²) regex evaluations of
    * [[normalized]]. The single-element-array transform guarantees one
    * evaluation regardless of how many lambda levels read it.
    */
  private def bindOnce(v: Column, f: Column => Column): Column =
    get(transform(array(v), x => f(x)), lit(0))

  def winnowFingerprints(text: Column, k: Int = 8, w: Int = 4): Column =
    bindOnce(normalized(text), { t =>
      val n = length(t)
      bindOnce(
        transform(sequence(lit(1), greatest(n - (k - 1), lit(1))),
          i => xxhash64(t.substr(i, lit(k)))),
        g => array_distinct(transform(sequence(lit(0), greatest(size(g) - w, lit(0))),
          i => array_min(slice(g, i + 1, lit(w))))))
    })

  /** Winnowing with an engine-portable polynomial k-gram hash
    * (h = Σ code(cⱼ)·31^(k-1-j), exact in a 64-bit long for k ≤ 8): the
    * identical winnowing scheme as [[winnowFingerprints]], but any engine
    * can recompute the fingerprint VALUES, so the whole gram→window-min→
    * distinct pipeline is externally checkable. Production keeps xxhash64
    * (better dispersion); this variant is the correctness witness.
    */
  def winnowFingerprintsPoly(text: Column, k: Int = 8, w: Int = 4): Column =
    bindOnce(normalized(text), { t =>
      val n = length(t)
      val grams = bindOnce(
        transform(sequence(lit(1), greatest(n - (k - 1), lit(1))),
          i => aggregate(sequence(lit(0), lit(k - 1)), lit(0L),
            (acc, j) => acc * 31L + ascii(t.substr(i + j, lit(1))))),
        g => array_distinct(transform(sequence(lit(0), greatest(size(g) - w, lit(0))),
          i => array_min(slice(g, i + 1, lit(w))))))
      grams
    })
}
