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
}
