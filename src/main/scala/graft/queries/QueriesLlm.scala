package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.core.Tables
import graft.functions.TextOps

/** LLM-data-pipeline operators over `documents` / `embeddings`
  * (BASELINE north_star): dedup, text analysis, similarity search. DuckDB
  * oracles where expressible; the approximate operators (MinHash-LSH, ANN)
  * get rows-only or self-checking entries.
  */
object QueriesLlm {

  /** Exact content dedup over documents: representative per normalized text,
    * aggregated per source so the output is small and hash-stable.
    */
  private def dedup(s: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(s, dir)
    TextOps.dedupExact(docs)
      .groupBy(col("source"))
      .agg(count(lit(1)).as("n_kept"), sum(col("doc_id")).as("sum_doc_id"))
  }

  private val dedupSql =
    """WITH norm AS (
      |  SELECT source, doc_id,
      |    row_number() OVER (
      |      PARTITION BY regexp_replace(lower(trim(text)), '\s+', ' ', 'g')
      |      ORDER BY doc_id) AS rn
      |  FROM documents)
      |SELECT source, COUNT(*) AS n_kept, CAST(SUM(doc_id) AS BIGINT) AS sum_doc_id
      |FROM norm WHERE rn = 1 GROUP BY source""".stripMargin

  /** Text statistics (token/punct/digit counts) aggregated per (lang,
    * source).
    */
  private def stats(s: SparkSession, dir: String): DataFrame =
    TextOps.withTextStats(Tables.documents(s, dir))
      .groupBy(col("lang"), col("source"))
      .agg(
        count(lit(1)).as("n_docs"),
        sum(col("n_tokens").cast("long")).as("sum_tokens"),
        sum(col("n_chars_actual").cast("long")).as("sum_chars"),
        sum(col("n_punct").cast("long")).as("sum_punct"),
        sum(col("n_digits").cast("long")).as("sum_digits"))

  private val statsSql =
    """SELECT lang, source, COUNT(*) AS n_docs,
      |  CAST(SUM(CASE WHEN length(trim(text)) = 0 THEN 0
      |    ELSE length(regexp_split_to_array(trim(text), '\s+')) END) AS BIGINT) AS sum_tokens,
      |  CAST(SUM(length(text)) AS BIGINT) AS sum_chars,
      |  CAST(SUM(length(text) - length(regexp_replace(text, '[!-/:-@\[-`{-~]', '', 'g'))) AS BIGINT) AS sum_punct,
      |  CAST(SUM(length(text) - length(regexp_replace(text, '[0-9]', '', 'g'))) AS BIGINT) AS sum_digits
      |FROM documents GROUP BY lang, source""".stripMargin

  val all: Seq[Q] = Seq(
    Q("llm_exact_dedup", dedup, Some(dedupSql)),
    Q("llm_text_stats", stats, Some(statsSql))
  )
}
