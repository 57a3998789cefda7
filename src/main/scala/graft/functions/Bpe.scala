package graft.functions

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Distributed BPE tokenizer training — learn the merge table an LLM
  * tokenizer ships with, from the corpus itself (part of the training-data
  * extension surface motivated by SURVEY.md §2.11; the reference has no
  * tokenizer stage).
  *
  * Algorithm (Sennrich et al. 2016, the public subword-nmt formulation):
  * aggregate the corpus to a word-frequency table once, split each word
  * into character tokens plus an end-of-word marker, then repeat K times:
  * count adjacent token pairs weighted by word frequency, merge the most
  * frequent pair everywhere (greedy left-to-right, non-overlapping), record
  * it. The learned output is the ranked merge list.
  *
  * Scale shape (the 100 TB answer):
  *  - the ONLY corpus-scale pass is the word-count aggregation — one
  *    shuffle on the word, exactly [[QueriesCorpus]]'s `llm_vocab_topk`
  *    shape. Everything after runs on the VOCAB table (unique words ×
  *    frequency), which is heavy-hitter-bounded, not corpus-bounded: this
  *    is how every production BPE trainer works (count first, iterate on
  *    counts), and why training is tractable at any corpus size.
  *  - each merge round is one pair-count shuffle over the vocab table plus
  *    a ONE-ROW collect (the argmax pair) — driver state is the model (the
  *    merge list), never data, the same contract as the k-means centroids
  *    in [[Similarity]].
  *  - per-round lineage is cut by re-caching the merged vocab table and
  *    unpersisting the previous round, so K rounds do not stack K map
  *    stages onto one plan.
  *
  * Determinism contract: pair counts are exact integer sums; the argmax
  * tiebreak is (frequency DESC, left, right) under bytewise string order —
  * identical in Spark and DuckDB for the ASCII token alphabet — and the
  * greedy left-to-right merge below consumes matched pairs exactly like a
  * single-scan non-overlapping string replace, which is what the DuckDB
  * oracle's `replace()` on begin/end-delimited token strings computes. Both
  * sides therefore learn bit-identical merge tables.
  */
object Bpe {

  /** End-of-word marker appended as its own token ('>' sorts below 'a', so
    * ties involving it break the same bytewise way in both engines).
    */
  val Eow = ">"

  /** Vocab-table row: a word as its current token sequence + corpus count. */
  final case class WordToks(toks: Seq[String], c: Long)

  /** One greedy left-to-right merge pass: every non-overlapping (l, r)
    * adjacency becomes the concatenated token; a matched pair is consumed
    * (i advances by 2), so `[a,a,a]` merging (a,a) yields `[aa, a]` — the
    * canonical BPE single-scan semantics.
    */
  def mergePair(toks: IndexedSeq[String], l: String, r: String): IndexedSeq[String] = {
    val out = scala.collection.mutable.ArrayBuffer.empty[String]
    var i = 0
    val n = toks.length
    while (i < n) {
      if (i + 1 < n && toks(i) == l && toks(i + 1) == r) { out += (l + r); i += 2 }
      else { out += toks(i); i += 1 }
    }
    out.toIndexedSeq
  }

  /** Tokenize one word under a learned merge list: split to characters +
    * EOW, then apply each merge in rank order with the same greedy
    * single-scan semantics training used — so tokenizing the training
    * corpus reproduces exactly the vocab state the K-th training round
    * ended on.
    */
  def applyMerges(w: String, merges: Seq[(String, String)]): IndexedSeq[String] = {
    var t: IndexedSeq[String] = w.map(_.toString).toIndexedSeq :+ Eow
    merges.foreach { case (l, r) => t = mergePair(t, l, r) }
    t
  }

  /** Learn `k` merges from a word-frequency table (`w` string, `c` long).
    * Returns the ranked merge list (rank, left_tok, right_tok, freq) —
    * stops early if the vocab runs out of adjacent pairs.
    */
  def learnMerges(spark: SparkSession, words: DataFrame, k: Int): DataFrame = {
    import spark.implicits._
    // eager localCheckpoint (not cache+count): materializes in ONE job AND
    // cuts lineage, so round R's plan never stacks R map stages — the same
    // discipline as the connected-components fixpoint loop
    var cur: Dataset[WordToks] = words.select(
        expr("concat(transform(sequence(1, length(w)), i -> substring(w, i, 1))," +
          s" array('$Eow'))").as("toks"),
        col("c"))
      .as[WordToks].localCheckpoint(true)
    val merges = scala.collection.mutable.ArrayBuffer.empty[(Int, String, String, Long)]
    var rank = 1
    var exhausted = false
    while (rank <= k && !exhausted) {
      val best = cur.filter(size(col("toks")) >= 2)
        .select(col("c"), explode(expr(
          "transform(sequence(0, size(toks) - 2)," +
            " i -> struct(toks[i] AS l, toks[i + 1] AS r))")).as("p"))
        .groupBy(col("p.l").as("l"), col("p.r").as("r"))
        .agg(sum(col("c")).as("f"))
        .orderBy(col("f").desc, col("l"), col("r"))
        .limit(1).collect() // model-sized: exactly one row (the argmax pair)
      if (best.isEmpty) exhausted = true
      else {
        val (l, r, f) = (best(0).getString(0), best(0).getString(1), best(0).getLong(2))
        merges += ((rank, l, r, f))
        cur = cur.map(ws => WordToks(mergePair(ws.toks.toIndexedSeq, l, r), ws.c))
          .localCheckpoint(true)
        rank += 1
      }
    }
    merges.toSeq.toDF("rank", "left_tok", "right_tok", "freq")
  }
}
