package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.functions.TextOps

/** §2.9 over the LLM-corpus surface: the training-data ingest funnel
  * (quality gate → language ID → exact content dedup) as a Structured
  * Streaming pipeline — a crawl arrives continuously; the corpus must stay
  * deduplicated without re-running batch jobs over the whole history.
  *
  * The dedup state is Spark's streaming `dropDuplicates` keyed on the
  * normalized content: one state row per distinct normalized text, exact
  * streaming parity with the batch `TextOps.dedupExact` SURVIVOR SET (which
  * doc_id represents a duplicate group is first-seen in the stream vs
  * lowest-id in batch — the retained CONTENT is identical, which is what a
  * corpus cares about; `stream_llm_dedup` pins exactly that equivalence).
  * Unbounded corpora bound the state with
  * `withWatermark + dropDuplicatesWithinWatermark` on an arrival-time
  * column, trading cross-epoch dedup for bounded state — same dial as the
  * tick pipeline's G5.
  */
object StreamingCorpus {

  /** Quality gate + language ID + streaming exact dedup on normalized
    * content. Emits the surviving rows with their predicted language.
    */
  def dedupExactStream(docs: DataFrame, textCol: String = "text"): DataFrame =
    docs
      .withColumn("pred_lang", TextOps.langId(col(textCol)))
      .filter(TextOps.qualityScore(col(textCol)) >= 0.3)
      .withColumn("__norm", TextOps.normalized(col(textCol)))
      .dropDuplicates("__norm")
      .drop("__norm")

  /** Online incremental admission against a STATIC corpus index — the
    * streaming half of `llm_incremental_dedup`'s exact legs: each arriving
    * doc's normalized-content fingerprint is anti-joined against the
    * admitted-corpus fingerprint index (a stream-static join; Spark
    * re-plans the static side per micro-batch, so at scale the index is
    * the bucketed fingerprint table and the join is hash-pruned, never a
    * corpus scan), then deduplicated against everything THIS stream has
    * already admitted (`dropDuplicates` on the fingerprint — that state is
    * precisely the index delta the stream is accumulating, so its size is
    * bounded by corpus GROWTH, not stream length). The near-dup leg stays
    * a batch-side band probe ([[graft.functions.MinHash.crossCandidatePairs]]);
    * online it belongs in a foreachBatch probe of the banded index — out
    * of scope for this operator, which pins the exact legs.
    */
  def admitIncrementalStream(docs: DataFrame, corpusFp: DataFrame,
                             textCol: String = "text"): DataFrame =
    docs
      .withColumn("__fp", TextOps.fingerprint(col(textCol)))
      .join(corpusFp, Seq("__fp"), "left_anti")
      .dropDuplicates("__fp")
      .drop("__fp")

  /** [[admitIncrementalStream]] against the PERSISTED corpus index — the
    * production shape where batch and stream admission share ONE catalog
    * table (the `bucketBy(fp)` index `llm_incremental_bucketed` writes at
    * ingest): the static side of the per-micro-batch anti-join is resolved
    * from the catalog BY NAME, so each micro-batch's re-planned join scans
    * the index's buckets directly — zero exchange on the index side, only
    * the (micro-batch-sized) stream side shuffles into the index's
    * bucketing (PlanSpec pins the batch-equivalent plan shape). At 100 TB
    * the index table is the corpus-growth ledger both admission paths
    * append to; neither ever re-scans, re-hashes, or re-shuffles the
    * admitted corpus.
    */
  def admitIncrementalStreamCatalog(docs: DataFrame, fpTable: String,
                                    textCol: String = "text"): DataFrame = {
    val idx = docs.sparkSession.table(fpTable).select(col("fp").as("__fp"))
    admitIncrementalStream(docs, idx, textCol)
  }

  /** The bounded-state dial: same funnel, but dedup state keyed on
    * normalized content is EVICTED once the watermark on `arrivalCol`
    * passes a row's arrival time + `delay`. State size is bounded by the
    * distinct content arriving within one watermark window — the 100 TB
    * unbounded-crawl configuration — at the cost of cross-epoch dedup: a
    * duplicate arriving after its original's state expired is readmitted
    * as new (`stream_llm_dedup_wm` pins exactly that readmission).
    */
  def dedupExactStreamBounded(docs: DataFrame, textCol: String = "text",
                              arrivalCol: String = "arrival_ts",
                              delay: String = "10 minutes"): DataFrame =
    docs
      .withColumn("pred_lang", TextOps.langId(col(textCol)))
      .filter(TextOps.qualityScore(col(textCol)) >= 0.3)
      .withColumn("__norm", TextOps.normalized(col(textCol)))
      .withWatermark(arrivalCol, delay)
      .dropDuplicatesWithinWatermark("__norm")
      .drop("__norm")
}
