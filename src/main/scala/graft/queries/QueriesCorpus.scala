package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.core.Tables
import graft.functions.CorpusOps

/** Corpus-curation operators (decontamination, repetition quality,
  * stratified sampling, packing planning) as oracle-checked queries over
  * `documents`. Every aggregate the oracle hashes is integer arithmetic —
  * counts, integer id sums, exact rational threshold tests — so the rows
  * are bit-stable across engines and partitionings by construction.
  */
object QueriesCorpus {

  /** DuckDB word n-gram construction matching [[graft.functions.MinHash.shingles]]:
    * normalized text, whole-text single gram when ≤ n tokens.
    */
  private def gramsSql(n: Int, gramCol: String): String =
    s"""WITH d AS (
       |  SELECT doc_id, source, regexp_replace(lower(trim(text)), '\\s+', ' ', 'g') AS norm
       |  FROM documents),
       |s AS (SELECT doc_id, source, string_split(norm, ' ') AS toks, norm FROM d),
       |g AS (SELECT doc_id, source,
       |  CASE WHEN len(toks) <= $n THEN [norm]
       |       ELSE list_transform(range(1, len(toks) - ${n - 2}),
       |         i -> array_to_string(list_slice(toks, i, i + ${n - 1}), ' '))
       |  END AS $gramCol
       |  FROM s)""".stripMargin

  /** Benchmark decontamination (GPT-3-style 4-gram overlap): docs with
    * `doc_id % 97 = 0` stand in for the benchmark suite; every other doc is
    * corpus and is flagged iff it shares a word 4-gram with the suite.
    * Per-source counts + the contaminated id sum pin exactly WHICH docs
    * were flagged, not just how many.
    */
  private def decontaminate(s: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(s, dir)
    val eval = docs.filter(col("doc_id") % 97 === 0)
    val corpus = docs.filter(col("doc_id") % 97 =!= 0)
    CorpusOps.withContamination(corpus, CorpusOps.evalNgrams(eval, 4), 4)
      .groupBy(col("source"))
      .agg(
        count(lit(1)).as("n_total"),
        sum(col("is_contaminated").cast("long")).as("n_contaminated"),
        sum(lit(1L) - col("is_contaminated")).as("n_kept"),
        sum(when(col("is_contaminated") === 1, col("doc_id")).otherwise(0L)).as("sum_contam_ids"))
  }

  private val decontaminateSql =
    s"""${gramsSql(4, "gr")},
       |ev AS (SELECT DISTINCT unnest(gr) AS gram FROM g WHERE doc_id % 97 = 0),
       |hits AS (
       |  SELECT DISTINCT c.doc_id
       |  FROM (SELECT doc_id, unnest(list_distinct(gr)) AS gram FROM g WHERE doc_id % 97 <> 0) c
       |  JOIN ev USING (gram)),
       |corpus AS (
       |  SELECT g.doc_id, g.source, CASE WHEN h.doc_id IS NULL THEN 0 ELSE 1 END AS contam
       |  FROM g LEFT JOIN hits h ON g.doc_id = h.doc_id
       |  WHERE g.doc_id % 97 <> 0)
       |SELECT source, COUNT(*) AS n_total,
       |  CAST(SUM(contam) AS BIGINT) AS n_contaminated,
       |  CAST(SUM(1 - contam) AS BIGINT) AS n_kept,
       |  CAST(SUM(CASE WHEN contam = 1 THEN doc_id ELSE 0 END) AS BIGINT) AS sum_contam_ids
       |FROM corpus GROUP BY source""".stripMargin

  /** Gopher-style repetition quality per source: integer numerators /
    * denominators of the duplicate-2-gram and top-2-gram fractions, plus
    * exact-rational flag counts (frac > 1/16 ⇔ numerator·16 > denominator —
    * no float compare anywhere).
    */
  private def repetition(s: SparkSession, dir: String): DataFrame =
    CorpusOps.withRepetitionStats(Tables.documents(s, dir))
      .groupBy(col("source"))
      .agg(
        count(lit(1)).as("n_docs"),
        sum(col("n2")).as("sum_n2"),
        sum(col("d2")).as("sum_d2"),
        sum(col("top2")).as("sum_top2"),
        sum(when((col("n2") - col("d2")) * 16 > col("n2"), 1L).otherwise(0L)).as("n_flag_dup"),
        sum(when(col("top2") * 16 > col("n2"), 1L).otherwise(0L)).as("n_flag_top"))

  private val repetitionSql =
    s"""${gramsSql(2, "g2")},
       |m AS (SELECT doc_id, source, len(g2) AS n2, len(list_distinct(g2)) AS d2 FROM g),
       |e AS (SELECT doc_id, unnest(g2) AS gram FROM g),
       |c AS (SELECT doc_id, gram, count(*) AS c FROM e GROUP BY 1, 2),
       |t AS (SELECT doc_id, max(c) AS top2 FROM c GROUP BY 1)
       |SELECT m.source, COUNT(*) AS n_docs,
       |  CAST(SUM(m.n2) AS BIGINT) AS sum_n2,
       |  CAST(SUM(m.d2) AS BIGINT) AS sum_d2,
       |  CAST(SUM(t.top2) AS BIGINT) AS sum_top2,
       |  CAST(SUM(CASE WHEN (m.n2 - m.d2) * 16 > m.n2 THEN 1 ELSE 0 END) AS BIGINT) AS n_flag_dup,
       |  CAST(SUM(CASE WHEN t.top2 * 16 > m.n2 THEN 1 ELSE 0 END) AS BIGINT) AS n_flag_top
       |FROM m JOIN t USING (doc_id) GROUP BY m.source""".stripMargin

  /** Deterministic stratified sampling: per-language keep rates (en 60%,
    * other known langs 30%, else 10%) applied through the portable md5
    * sample key — membership is a pure function of doc_id, reproducible in
    * any engine, across reruns and partitionings. The sampled id sum pins
    * exact membership per (lang, source) stratum.
    */
  private def stratified(s: SparkSession, dir: String): DataFrame = {
    val rate = when(col("lang") === "en", 600)
      .when(col("lang").isin("zh", "de", "es", "fr"), 300)
      .otherwise(100)
    Tables.documents(s, dir)
      .withColumn("keep", (CorpusOps.sampleKey(col("doc_id")) < rate).cast("long"))
      .groupBy(col("lang"), col("source"))
      .agg(
        count(lit(1)).as("n_total"),
        sum(col("keep")).as("n_sampled"),
        sum(when(col("keep") === 1, col("doc_id")).otherwise(0L)).as("sum_sampled_ids"))
  }

  private val stratifiedSql =
    """SELECT lang, source, COUNT(*) AS n_total,
      |  CAST(SUM(keep) AS BIGINT) AS n_sampled,
      |  CAST(SUM(CASE WHEN keep = 1 THEN doc_id ELSE 0 END) AS BIGINT) AS sum_sampled_ids
      |FROM (
      |  SELECT lang, source, doc_id,
      |    CASE WHEN CAST(concat('0x', substr(md5(concat('graft', CAST(doc_id AS VARCHAR))), 1, 8)) AS BIGINT) % 1000
      |           < (CASE WHEN lang = 'en' THEN 600
      |                   WHEN lang IN ('zh', 'de', 'es', 'fr') THEN 300
      |                   ELSE 100 END)
      |         THEN 1 ELSE 0 END AS keep
      |  FROM documents)
      |GROUP BY lang, source""".stripMargin

  /** Concat-and-chunk packing plan at a 512-token budget: per source
    * stream, total BPE-ish tokens, bins produced, docs split across a bin
    * boundary, and the last bin index (cross-checks the running-sum window
    * against the total).
    */
  private def packing(s: SparkSession, dir: String): DataFrame =
    CorpusOps.withPackingPlan(Tables.documents(s, dir), 512L)
      .groupBy(col("source"))
      .agg(
        count(lit(1)).as("n_docs"),
        sum(col("n_tok")).as("total_tokens"),
        sum(when(col("start_bin") =!= col("end_bin"), 1L).otherwise(0L)).as("n_split_docs"),
        max(col("end_bin")).as("last_bin"))
      .withColumn(
        "n_bins",
        when(col("total_tokens") === 0, 0L)
          .otherwise(expr("((total_tokens - 1) div 512) + 1")))

  private val packingSql =
    """WITH t AS (
      |  SELECT source, doc_id,
      |    CAST(length(regexp_extract_all(text, '[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]')) AS BIGINT) AS n_tok
      |  FROM documents),
      |o AS (
      |  SELECT source, doc_id, n_tok,
      |    COALESCE(CAST(SUM(n_tok) OVER (
      |      PARTITION BY source ORDER BY doc_id
      |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS BIGINT), 0) AS tok_offset
      |  FROM t),
      |b AS (
      |  SELECT source, n_tok, tok_offset,
      |    tok_offset // 512 AS start_bin,
      |    CASE WHEN n_tok = 0 THEN tok_offset // 512
      |         ELSE (tok_offset + n_tok - 1) // 512 END AS end_bin
      |  FROM o)
      |SELECT source, COUNT(*) AS n_docs,
      |  CAST(SUM(n_tok) AS BIGINT) AS total_tokens,
      |  CAST(SUM(CASE WHEN start_bin <> end_bin THEN 1 ELSE 0 END) AS BIGINT) AS n_split_docs,
      |  CAST(MAX(end_bin) AS BIGINT) AS last_bin,
      |  CAST(CASE WHEN SUM(n_tok) = 0 THEN 0 ELSE (SUM(n_tok) - 1) // 512 + 1 END AS BIGINT) AS n_bins
      |FROM b GROUP BY source""".stripMargin

  /** Deterministic shuffle-and-shard manifest ([[CorpusOps.shardManifest]]):
    * the full per-document (shuffle_key, shard, pos) assignment at 16
    * shards, hash-checked against a DuckDB replay of Spark's own
    * xxhash64-of-BIGINT ([[OracleHash.xxh64Long]]) — key values, shard
    * routing, and every in-shard rank must all match bit-for-bit.
    */
  private def shards(s: SparkSession, dir: String): DataFrame =
    CorpusOps.shardManifest(Tables.documents(s, dir), numShards = 16)

  private val shardsSql = {
    val (chain, last, hs, _) = OracleHash.xxh64Long("d", "shx", "doc_id")
    s"""WITH d AS (SELECT doc_id FROM documents),
       |$chain,
       |f AS (SELECT doc_id, $hs AS shuffle_key FROM $last)
       |SELECT doc_id, shuffle_key,
       |  CAST(((shuffle_key % 16) + 16) % 16 AS INTEGER) AS shard,
       |  CAST(row_number() OVER (PARTITION BY ((shuffle_key % 16) + 16) % 16
       |       ORDER BY shuffle_key, doc_id) - 1 AS INTEGER) AS pos
       |FROM f""".stripMargin
  }

  /** Exact substring-chunk dedup at an 8-token grid
    * ([[CorpusOps.withChunkDedup]]): per source, total and duplicated
    * distinct chunks plus the flagged (mostly-duplicated) docs — the
    * flagged id sum pins exact membership. All counts integer.
    */
  private def chunkDedup(s: SparkSession, dir: String): DataFrame =
    CorpusOps.withChunkDedup(Tables.documents(s, dir), 8)
      .groupBy(col("source"))
      .agg(
        count(lit(1)).as("n_docs"),
        sum(col("n_chunks")).as("sum_chunks"),
        sum(col("n_dup_chunks")).as("sum_dup_chunks"),
        sum(when(col("n_dup_chunks") * 2 > col("n_chunks"), 1L).otherwise(0L)).as("n_flagged"),
        sum(when(col("n_dup_chunks") * 2 > col("n_chunks"), col("doc_id")).otherwise(0L))
          .as("sum_flagged_ids"))

  private val chunkDedupSql =
    """WITH d AS (
      |  SELECT doc_id, source, regexp_replace(lower(trim(text)), '\s+', ' ', 'g') AS norm
      |  FROM documents),
      |s AS (SELECT doc_id, source, string_split(norm, ' ') AS toks FROM d),
      |c AS (SELECT doc_id, source,
      |  list_distinct(list_transform(range(0, (len(toks) - 1) // 8 + 1),
      |    i -> array_to_string(list_slice(toks, i * 8 + 1, i * 8 + 8), ' '))) AS chunks
      |  FROM s),
      |p AS (SELECT doc_id, unnest(chunks) AS chunk FROM c),
      |dup AS (SELECT chunk FROM p GROUP BY chunk HAVING COUNT(*) >= 2),
      |pd AS (SELECT p.doc_id, COUNT(*) AS n_dup FROM p JOIN dup USING (chunk) GROUP BY p.doc_id),
      |m AS (SELECT c.doc_id, c.source, len(chunks) AS n_chunks, COALESCE(pd.n_dup, 0) AS n_dup
      |      FROM c LEFT JOIN pd ON c.doc_id = pd.doc_id)
      |SELECT source, COUNT(*) AS n_docs,
      |  CAST(SUM(n_chunks) AS BIGINT) AS sum_chunks,
      |  CAST(SUM(n_dup) AS BIGINT) AS sum_dup_chunks,
      |  CAST(SUM(CASE WHEN n_dup * 2 > n_chunks THEN 1 ELSE 0 END) AS BIGINT) AS n_flagged,
      |  CAST(SUM(CASE WHEN n_dup * 2 > n_chunks THEN doc_id ELSE 0 END) AS BIGINT) AS sum_flagged_ids
      |FROM m GROUP BY source""".stripMargin

  /** Corpus vocabulary head: global top-20 tokens by occurrence count with
    * document frequency — the distributed word count every tokenizer/vocab
    * build starts from. Two-phase aggregate on the token (map-side partial
    * counts soak up the Zipf head before the exchange), then a global
    * TakeOrderedAndProject — O(k) driver result, no full sort. Unique-token
    * tie-break makes the top-20 boundary deterministic cross-engine.
    */
  private def vocabTopk(s: SparkSession, dir: String): DataFrame =
    Tables.documents(s, dir)
      .select(col("doc_id"),
        explode(split(graft.functions.TextOps.normalized(col("text")), " ")).as("token"))
      .groupBy(col("token"))
      .agg(count(lit(1)).as("n_occ"), countDistinct(col("doc_id")).as("n_docs"))
      .orderBy(col("n_occ").desc, col("token").asc)
      .limit(20)

  private val vocabTopkSql =
    """WITH d AS (
      |  SELECT doc_id, regexp_replace(lower(trim(text)), '\s+', ' ', 'g') AS norm
      |  FROM documents),
      |t AS (SELECT doc_id, unnest(string_split(norm, ' ')) AS token FROM d)
      |SELECT token, COUNT(*) AS n_occ, COUNT(DISTINCT doc_id) AS n_docs
      |FROM t GROUP BY token ORDER BY n_occ DESC, token LIMIT 20""".stripMargin

  /** Temperature-weighted source mixing (α = ½,
    * [[CorpusOps.sourceMixTargets]] / [[CorpusOps.sourceMixSample]]): the
    * per-source manifest — count, integer weight, target, actually-kept
    * count and the kept-id sum (pins exact membership of the deterministic
    * hash-ordered sample).
    */
  private def mixTemperature(s: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(s, dir)
    val targets = CorpusOps.sourceMixTargets(docs, budgetDiv = 4L)
    val kept = CorpusOps.sourceMixSample(docs, targets)
      .groupBy(col("source"))
      .agg(
        count(lit(1)).as("n_kept"),
        sum(col("doc_id")).as("sum_kept_ids"))
    // LEFT join from targets, n_kept coalesced to 0: a source whose integer
    // k_target floors to 0 keeps no rows and produces no `kept` row — an
    // inner join would silently drop it from the manifest, when the honest
    // answer is "present, n_kept = 0". Every source appears exactly once.
    targets.select(col("source"), col("n_docs"), col("wgt"), col("k_target"))
      .join(kept, Seq("source"), "left")
      .select(
        col("source"), col("n_docs"), col("wgt"), col("k_target"),
        coalesce(col("n_kept"), lit(0L)).as("n_kept"),
        coalesce(col("sum_kept_ids"), lit(0L)).as("sum_kept_ids"))
  }

  private val mixTemperatureSql =
    """WITH c AS (SELECT source, COUNT(*) AS n_docs FROM documents GROUP BY source),
      |w0 AS (SELECT source, n_docs,
      |         CAST(floor(sqrt(CAST(n_docs AS DOUBLE))) AS BIGINT) AS s0 FROM c),
      |w AS (SELECT source, n_docs,
      |        CASE WHEN (s0 + 1) * (s0 + 1) <= n_docs THEN s0 + 1
      |             WHEN s0 * s0 > n_docs THEN s0 - 1 ELSE s0 END AS wgt FROM w0),
      |t AS (SELECT SUM(n_docs) AS total_docs, SUM(wgt) AS total_wgt FROM w),
      |k AS (SELECT source, n_docs, wgt,
      |        ((total_docs // 4) * wgt) // total_wgt AS k_target FROM w, t),
      |r AS (SELECT d.source, d.doc_id,
      |        row_number() OVER (PARTITION BY d.source ORDER BY
      |          CAST(concat('0x', substr(md5(concat('graft', CAST(d.doc_id AS VARCHAR))), 1, 8)) AS BIGINT) % 1000 ASC,
      |          d.doc_id ASC) AS rn
      |      FROM documents d),
      |kept AS (SELECT r.source, COUNT(*) AS n_kept, CAST(SUM(r.doc_id) AS BIGINT) AS sum_kept_ids
      |         FROM r JOIN k ON r.source = k.source AND r.rn <= k.k_target
      |         GROUP BY r.source)
      |SELECT k.source, k.n_docs, k.wgt, CAST(k.k_target AS BIGINT) AS k_target,
      |       CAST(COALESCE(kept.n_kept, 0) AS BIGINT) AS n_kept,
      |       CAST(COALESCE(kept.sum_kept_ids, 0) AS BIGINT) AS sum_kept_ids
      |FROM k LEFT JOIN kept ON k.source = kept.source""".stripMargin

  /** Per-source top-5 characteristic terms by an integer-scaled
    * rarity-weighted frequency `score = (tf · 10^6) div df` (tf = in-source
    * occurrences, df = corpus-wide document frequency) — the TF-IDF shape
    * with an exact integer idf surrogate so the ranking (and the top-5
    * boundary, tie-broken on token) is bit-stable cross-engine; production
    * would use log-idf doubles, identical plan.
    *
    * Distributed shape: token df and (source, token) tf are two-phase
    * aggregates (map-side partials absorb the Zipf head before either
    * exchange); the df side joins in broadcast (a vocabulary is MBs even
    * for TB corpora — degrade to a shuffled join on the uniform token key
    * if it ever isn't); the final top-5 windows over #sources partitions
    * of ≤|vocab| rows (bottom-k aggregator shape at extreme vocab sizes).
    */
  private def tfidfTerms(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val toks = Tables.documents(s, dir)
      .select(col("doc_id"), col("source"),
        explode(split(graft.functions.TextOps.normalized(col("text")), " ")).as("token"))
    val dfreq = toks.groupBy(col("token")).agg(countDistinct(col("doc_id")).as("df"))
    val tf = toks.groupBy(col("source"), col("token")).agg(count(lit(1)).as("tf"))
    val w = Window.partitionBy(col("source")).orderBy(col("score").desc, col("token").asc)
    tf.join(broadcast(dfreq), "token")
      .withColumn("score", expr("(tf * 1000000L) div df"))
      .withColumn("rnk", row_number().over(w))
      .filter(col("rnk") <= 5)
      .select(col("source"), col("rnk"), col("token"), col("tf"), col("df"), col("score"))
  }

  private val tfidfTermsSql =
    """WITH d AS (
      |  SELECT doc_id, source, regexp_replace(lower(trim(text)), '\s+', ' ', 'g') AS norm
      |  FROM documents),
      |t AS (SELECT doc_id, source, unnest(string_split(norm, ' ')) AS token FROM d),
      |dfreq AS (SELECT token, COUNT(DISTINCT doc_id) AS df FROM t GROUP BY token),
      |tf AS (SELECT source, token, COUNT(*) AS tf FROM t GROUP BY source, token),
      |scored AS (
      |  SELECT tf.source, tf.token, tf.tf, dfreq.df,
      |    (tf.tf * 1000000) // dfreq.df AS score
      |  FROM tf JOIN dfreq USING (token)),
      |ranked AS (
      |  SELECT source, token, tf, df, score,
      |    row_number() OVER (PARTITION BY source ORDER BY score DESC, token ASC) AS rnk
      |  FROM scored)
      |SELECT source, rnk, token, CAST(tf AS BIGINT) AS tf, CAST(df AS BIGINT) AS df,
      |  CAST(score AS BIGINT) AS score
      |FROM ranked WHERE rnk <= 5""".stripMargin

  /** CCNet-style in-domain LM quality filter (Wenzek et al. 2020: score
    * CommonCrawl against a LM trained on a curated corpus; Gopher/LLaMA
    * pipelines keep the same shape): a Laplace-smoothed bigram model is
    * trained on the curated slice (`source = 'src0'` stands in for the
    * Wikipedia side) and every document in the corpus is scored against it.
    * Following the repo's determinism discipline the per-bigram score is the
    * integer probability surrogate `ppm = ((c(w1w2)+1)·10⁶) div (c(w1)+V)`
    * and the doc score its integer mean — production would sum log-prob
    * doubles; the plan is identical. On this corpus the filter separates
    * cleanly: train-source docs score 41–47k, out-of-domain docs mostly
    * 20–34k; threshold 40000 keeps the in-domain tail.
    *
    * Distributed shape: model = two aggregates over the train slice (map-side
    * partials absorb the Zipf head); scoring = the corpus bigram stream
    * joined to the bigram and unigram models — broadcast when the model is
    * MB-sized (any curated train slice is), degrading to a shuffled join on
    * the bigram key where AQE's skew split owns the "of the" hot keys; then
    * one per-doc re-aggregate and a tiny per-source rollup. No stage holds
    * more than one corpus pass.
    */
  /** Per-doc bigram-LM scores (doc_id, source, score, n_oov) — the shared
    * core of [[bigramLmFilter]] and the streaming twin's batch side.
    */
  private[graft] def bigramDocScores(s: SparkSession, dir: String): DataFrame = {
    val d = tokenizedDocs(s, dir)
    val (uni, big, vocab) = bigramModelFrames(d)
    scoreAgainstModel(d, uni, big, vocab)
  }

  /** documents → (doc_id, source, toks) with the <2-token rows dropped —
    * the shared tokenization of the batch scorer, the model build, and the
    * streaming twins (bit-equal normalization is what makes the stream
    * compare exact).
    */
  private[graft] def tokenizedDocs(s: SparkSession, dir: String): DataFrame =
    Tables.documents(s, dir)
      .select(col("doc_id"), col("source"),
        split(graft.functions.TextOps.normalized(col("text")), " ").as("toks"))
      .filter(size(col("toks")) >= 2)

  private def bigramsOf(df: DataFrame): DataFrame = df
    .select(col("doc_id"), col("source"),
      explode(transform(sequence(lit(1), size(col("toks")) - 1),
        i => struct(element_at(col("toks"), i).as("w1"),
          element_at(col("toks"), i + 1).as("w2")))).as("bg"))
    .select(col("doc_id"), col("source"), col("bg.w1"), col("bg.w2"))

  /** The LM model as three DataFrames over the curated train slice
    * (source='src0'): unigram counts (w1, cu), bigram counts (w1, w2, cb),
    * and the single-row vocab size (v). This is the form that scales — the
    * model never leaves the cluster; [[bigramModel]]'s driver-side maps are
    * the small-model fast path for the stateless streaming kernel. Fails
    * loudly on an empty train slice (an all-zero denominator would
    * otherwise surface as an opaque div-by-zero null deep in the scorer).
    */
  private[graft] def bigramModelFrames(d: DataFrame)
      : (DataFrame, DataFrame, DataFrame) = {
    // eager cut at the shared TRAIN tokenization: the three model frames
    // feed three SEPARATE broadcast subtrees (bigram attach, unigram
    // attach, vocab crossJoin) plus the isEmpty probe below, and without a
    // boundary each re-runs the train-slice normalize+split behind it.
    // The cut sits HERE — below the aggregates — so the broadcasts still
    // build CONCURRENTLY on Spark's broadcast-exchange threads (an eager
    // checkpoint of the aggregated frames themselves serialized the three
    // builds and measured WORSE, 54.3 → 66.1 s at sf10; this form reads
    // the token arrays from executor storage instead, train-slice-sized).
    val train = d.filter(col("source") === "src0").localCheckpoint(true)
    require(!train.isEmpty,
      "bigram LM train slice (source='src0') is empty — cannot build a model")
    val uni = train.select(explode(col("toks")).as("w1"))
      .groupBy(col("w1")).agg(count(lit(1)).as("cu"))
    val vocab = uni.agg(count(lit(1)).as("v"))
    val big = bigramsOf(train).groupBy(col("w1"), col("w2")).agg(count(lit(1)).as("cb"))
    (uni, big, vocab)
  }

  /** Score (doc_id, source, toks) docs against the model FRAMES — the
    * stream-static-join form: the model joins are BROADCAST by hint, not
    * left to the 10 MB estimate: the curated-slice bigram model is ~40 MB
    * at sf10 (1.4M rows) — map-side attach keeps the 30M-row corpus bigram
    * stream out of the shuffle entirely; the only exchange left is the
    * per-doc aggregate. Past the broadcast budget, drop the hints and let
    * the shuffled join + AQE skew split own the Zipf head (scaladoc note).
    * Works unchanged on a STREAMING `docs` frame inside foreachBatch —
    * `stream_bigram_lm_join` is exactly that wiring, zero driver collect.
    */
  private[graft] def scoreAgainstModel(docs: DataFrame, uni: DataFrame,
      big: DataFrame, vocab: DataFrame): DataFrame =
    bigramsOf(docs)
      .join(broadcast(big), Seq("w1", "w2"), "left")
      .join(broadcast(uni), Seq("w1"), "left")
      .crossJoin(broadcast(vocab))
      .select(col("doc_id"), col("source"),
        expr("((coalesce(cb, 0L) + 1L) * 1000000L) div (coalesce(cu, 0L) + v)").as("ppm"),
        col("cb").isNull.cast("long").as("oov"))
      .groupBy(col("doc_id"), col("source"))
      .agg(expr("sum(ppm) div count(1)").as("score"), sum(col("oov")).as("n_oov"))

  /** The bigram LM model as driver-side maps — MODEL, not data (the same
    * bound as the k-means centroid / PQ codebook collects): unigram counts,
    * bigram counts, and |V| of the curated train slice. The streaming
    * scorer broadcasts these; a corpus whose curated slice outgrows
    * broadcast switches to the stream-static join form of
    * [[bigramDocScores]].
    */
  private[queries] def bigramModel(s: SparkSession, dir: String)
      : (Map[String, Long], Map[(String, String), Long], Long) = {
    val d = Tables.documents(s, dir)
      .filter(col("source") === "src0")
      .select(split(graft.functions.TextOps.normalized(col("text")), " ").as("toks"))
      .filter(size(col("toks")) >= 2)
    val uni = d.select(explode(col("toks")).as("w"))
      .groupBy(col("w")).agg(count(lit(1)).as("cu"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    require(uni.nonEmpty,
      "bigram LM train slice (source='src0') is empty — cannot build a model")
    val big = d.select(explode(transform(sequence(lit(1), size(col("toks")) - 1),
        i => struct(element_at(col("toks"), i).as("w1"),
          element_at(col("toks"), i + 1).as("w2")))).as("bg"))
      .groupBy(col("bg.w1"), col("bg.w2")).agg(count(lit(1)).as("cb"))
      .collect().map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
    (uni, big, uni.size.toLong)
  }

  private def bigramLmFilter(s: SparkSession, dir: String): DataFrame =
    bigramDocScores(s, dir).groupBy(col("source")).agg(
      count(lit(1)).as("n_docs"),
      sum((col("score") >= 40000L).cast("long")).as("n_kept"),
      sum(col("score")).as("sum_score"),
      sum(col("n_oov")).as("sum_oov"),
      min(col("score")).as("min_score"),
      max(col("score")).as("max_score"))

  private val bigramLmFilterSql =
    """WITH d AS (
      |  SELECT doc_id, source,
      |    string_split(regexp_replace(lower(trim(text)), '\s+', ' ', 'g'), ' ') AS toks
      |  FROM documents),
      |dd AS (SELECT * FROM d WHERE len(toks) >= 2),
      |uni AS (
      |  SELECT w1, COUNT(*) AS cu FROM (
      |    SELECT unnest(toks) AS w1 FROM dd WHERE source = 'src0') GROUP BY w1),
      |vocab AS (SELECT COUNT(*) AS v FROM uni),
      |big AS (
      |  SELECT w1, w2, COUNT(*) AS cb FROM (
      |    SELECT toks[i] AS w1, toks[i+1] AS w2
      |    FROM dd, unnest(range(1, len(toks))) AS r(i) WHERE source = 'src0')
      |  GROUP BY w1, w2),
      |doc_big AS (
      |  SELECT doc_id, source, toks[i] AS w1, toks[i+1] AS w2
      |  FROM dd, unnest(range(1, len(toks))) AS r(i)),
      |doc_score AS (
      |  SELECT db.doc_id, db.source,
      |    SUM(((COALESCE(b.cb, 0) + 1) * 1000000) // (COALESCE(u.cu, 0) + v.v))
      |      // COUNT(*) AS score,
      |    SUM(CASE WHEN b.cb IS NULL THEN 1 ELSE 0 END) AS n_oov
      |  FROM doc_big db
      |  LEFT JOIN big b ON b.w1 = db.w1 AND b.w2 = db.w2
      |  LEFT JOIN uni u ON u.w1 = db.w1
      |  CROSS JOIN vocab v
      |  GROUP BY db.doc_id, db.source)
      |SELECT source, COUNT(*) AS n_docs,
      |  CAST(SUM(CASE WHEN score >= 40000 THEN 1 ELSE 0 END) AS BIGINT) AS n_kept,
      |  CAST(SUM(score) AS BIGINT) AS sum_score,
      |  CAST(SUM(n_oov) AS BIGINT) AS sum_oov,
      |  CAST(MIN(score) AS BIGINT) AS min_score,
      |  CAST(MAX(score) AS BIGINT) AS max_score
      |FROM doc_score GROUP BY source""".stripMargin

  /** PII / blocklist scrubbing audit ([[CorpusOps.ScrubRules]]): per
    * source, docs and total matches per rule category plus the total
    * scrubbed-text length after `[REDACTED]` replacement — the compliance
    * report a redaction pass emits. Pure map-side regex expressions; the
    * only shuffle is the final tiny per-source aggregate.
    */
  private def scrubRedact(s: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(s, dir)
    val withHits = CorpusOps.ScrubRules.foldLeft(docs) { case (d, (cat, pat)) =>
      d.withColumn(s"h_$cat", CorpusOps.scrubHits(col("text"), pat).cast("long"))
    }
    withHits
      .withColumn("len_scrubbed", length(CorpusOps.scrubbed(col("text"))).cast("long"))
      .groupBy(col("source"))
      .agg(
        count(lit(1)).as("n_docs"),
        sum((col("h_email") > 0).cast("long")).as("docs_email"),
        sum(col("h_email")).as("hits_email"),
        sum((col("h_phone") > 0).cast("long")).as("docs_phone"),
        sum(col("h_phone")).as("hits_phone"),
        sum((col("h_blocklist") > 0).cast("long")).as("docs_block"),
        sum(col("h_blocklist")).as("hits_block"),
        sum(col("len_scrubbed")).as("sum_len_scrubbed"))
  }

  private val scrubRedactSql = {
    val email = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
    val phone = "\\b[0-9]{3}[-. ][0-9]{3}[-. ][0-9]{4}\\b"
    val block = "\\b(slow|big)\\b"
    s"""WITH h AS (
       |  SELECT source,
       |    len(regexp_extract_all(text, '$email')) AS h_email,
       |    len(regexp_extract_all(text, '$phone')) AS h_phone,
       |    len(regexp_extract_all(text, '$block')) AS h_block,
       |    length(regexp_replace(regexp_replace(regexp_replace(text,
       |      '$email', '[REDACTED]', 'g'),
       |      '$phone', '[REDACTED]', 'g'),
       |      '$block', '[REDACTED]', 'g')) AS len_scrubbed
       |  FROM documents)
       |SELECT source, COUNT(*) AS n_docs,
       |  CAST(SUM(CASE WHEN h_email > 0 THEN 1 ELSE 0 END) AS BIGINT) AS docs_email,
       |  CAST(SUM(h_email) AS BIGINT) AS hits_email,
       |  CAST(SUM(CASE WHEN h_phone > 0 THEN 1 ELSE 0 END) AS BIGINT) AS docs_phone,
       |  CAST(SUM(h_phone) AS BIGINT) AS hits_phone,
       |  CAST(SUM(CASE WHEN h_block > 0 THEN 1 ELSE 0 END) AS BIGINT) AS docs_block,
       |  CAST(SUM(h_block) AS BIGINT) AS hits_block,
       |  CAST(SUM(len_scrubbed) AS BIGINT) AS sum_len_scrubbed
       |FROM h GROUP BY source""".stripMargin
  }

  /** BPE tokenizer training over the corpus ([[graft.functions.Bpe]]): one
    * corpus-scale word-count shuffle, then 12 merge rounds over the
    * vocab-sized table — each round one pair-count shuffle + a one-row
    * argmax collect. The oracle replays the ENTIRE training loop in DuckDB
    * as a recursive CTE carrying the vocab as list state in a single row:
    * words as begin/end-delimited token strings, the greedy non-overlapping
    * merge as a plain `replace()` (bit-identical semantics to the engine's
    * single-scan array merge), the argmax as a lateral aggregate with the
    * same (freq DESC, left, right) bytewise tiebreak. A wrong pair count,
    * a tiebreak drift, or an overlap-handling bug in ANY round changes
    * every later merge and hash-mismatches loudly.
    */
  private def bpeMerges(s: SparkSession, dir: String): DataFrame = {
    // widen below the explode so the corpus-scale word-count pass runs
    // parallel even when the corpus is one effective parquet split
    val words = graft.core.Widen.toCores(Tables.documents(s, dir).select(col("text")))
      .select(explode(split(col("text"), " ")).as("w"))
      .filter(length(col("w")) > 0)
      .groupBy("w").agg(count(lit(1)).as("c"))
    graft.functions.Bpe.learnMerges(s, words, 12)
  }

  private val bpeMergesSql =
    """WITH RECURSIVE
      |wc AS MATERIALIZED (
      |  SELECT w, COUNT(*)::BIGINT AS c
      |  FROM (SELECT UNNEST(string_split(text, ' ')) AS w FROM documents) u
      |  WHERE w <> '' GROUP BY w),
      |init AS MATERIALIZED (
      |  SELECT list(t ORDER BY w) AS words, list(c ORDER BY w) AS cnts
      |  FROM (SELECT w, c,
      |          list_aggregate(list_transform(range(1, length(w) + 1),
      |            i -> chr(1) || w[i::INTEGER] || chr(2)), 'string_agg', '')
      |          || chr(1) || '>' || chr(2) AS t
      |        FROM wc)),
      |st AS (
      |  SELECT 0 AS it, words, cnts,
      |         []::VARCHAR[] AS ml, []::VARCHAR[] AS mr, []::BIGINT[] AS mf
      |  FROM init
      |  UNION ALL
      |  SELECT st.it + 1,
      |    list_transform(st.words, w -> replace(w,
      |      chr(1) || best.l || chr(2) || chr(1) || best.r || chr(2),
      |      chr(1) || best.l || best.r || chr(2))),
      |    st.cnts,
      |    list_append(st.ml, best.l), list_append(st.mr, best.r), list_append(st.mf, best.f)
      |  FROM st, LATERAL (
      |    SELECT p.l, p.r, p.f FROM (
      |      SELECT t.tok[i::INTEGER] AS l, t.tok[(i + 1)::INTEGER] AS r, SUM(t.c)::BIGINT AS f
      |      FROM (SELECT string_split(ltrim(rtrim(u.w, chr(2)), chr(1)), chr(2) || chr(1)) AS tok, u.c
      |            FROM (SELECT UNNEST(st.words) AS w, UNNEST(st.cnts) AS c) u) t,
      |           UNNEST(range(1, len(t.tok))) AS g(i)
      |      GROUP BY 1, 2) p
      |    ORDER BY p.f DESC, p.l, p.r LIMIT 1) best
      |  WHERE st.it < 12)
      |SELECT g.i::INT AS rank, fin.ml[g.i::INTEGER] AS left_tok,
      |       fin.mr[g.i::INTEGER] AS right_tok, fin.mf[g.i::INTEGER] AS freq
      |FROM (SELECT * FROM st WHERE it = 12) fin, UNNEST(range(1, 13)) AS g(i)""".stripMargin

  /** The tokenizer applied back to its training corpus: learn the 12-merge
    * table, tokenize every DISTINCT word once ([[graft.functions.Bpe
    * .applyMerges]] — vocab-sized work, not corpus-sized), broadcast the
    * word→token-count map back onto the corpus word stream, and report the
    * per-source word/token totals an LLM data pipeline budgets with. At
    * 100 TB the broadcast becomes a plain shuffle join if the vocab
    * outgrows the broadcast threshold — same plan shape, Spark picks it.
    * The oracle composes the training replay with the apply step for free:
    * the recursive CTE's FINAL vocab state IS each word's tokenization
    * under the learned merges (apply-in-rank-order ≡ the training loop's
    * own rewrites), so it just measures token counts off the final state
    * and joins them back to the corpus words.
    */
  private def bpeTokenize(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val docWords = graft.core.Widen.toCores(
        Tables.documents(s, dir).select(col("source"), col("text")))
      .select(col("source"), explode(split(col("text"), " ")).as("w"))
      .filter(length(col("w")) > 0)
    val wordFreq = docWords.groupBy("w").agg(count(lit(1)).as("c"))
    val merges = graft.functions.Bpe.learnMerges(s, wordFreq, 12)
      .orderBy("rank").collect() // model-sized: the 12 learned merges
      .map(r => (r.getString(1), r.getString(2))).toSeq
    val tokPerWord = wordFreq.select(col("w")).as[String]
      .map(w => (w, graft.functions.Bpe.applyMerges(w, merges).length))
      .toDF("w", "n_tok")
    docWords.join(broadcast(tokPerWord), "w")
      .groupBy("source")
      .agg(count(lit(1)).as("n_words"), sum(col("n_tok").cast("long")).as("n_tokens"))
  }

  private val bpeTokenizeSql =
    """WITH RECURSIVE
      |wc AS MATERIALIZED (
      |  SELECT w, COUNT(*)::BIGINT AS c
      |  FROM (SELECT UNNEST(string_split(text, ' ')) AS w FROM documents) u
      |  WHERE w <> '' GROUP BY w),
      |init AS MATERIALIZED (
      |  SELECT list(t ORDER BY w) AS words, list(w ORDER BY w) AS raw,
      |         list(c ORDER BY w) AS cnts
      |  FROM (SELECT w, c,
      |          list_aggregate(list_transform(range(1, length(w) + 1),
      |            i -> chr(1) || w[i::INTEGER] || chr(2)), 'string_agg', '')
      |          || chr(1) || '>' || chr(2) AS t
      |        FROM wc)),
      |st AS (
      |  SELECT 0 AS it, words, raw, cnts FROM init
      |  UNION ALL
      |  SELECT st.it + 1,
      |    list_transform(st.words, w -> replace(w,
      |      chr(1) || best.l || chr(2) || chr(1) || best.r || chr(2),
      |      chr(1) || best.l || best.r || chr(2))),
      |    st.raw, st.cnts
      |  FROM st, LATERAL (
      |    SELECT p.l, p.r FROM (
      |      SELECT t.tok[i::INTEGER] AS l, t.tok[(i + 1)::INTEGER] AS r, SUM(t.c)::BIGINT AS f
      |      FROM (SELECT string_split(ltrim(rtrim(u.w, chr(2)), chr(1)), chr(2) || chr(1)) AS tok, u.c
      |            FROM (SELECT UNNEST(st.words) AS w, UNNEST(st.cnts) AS c) u) t,
      |           UNNEST(range(1, len(t.tok))) AS g(i)
      |      GROUP BY 1, 2) p
      |    ORDER BY p.f DESC, p.l, p.r LIMIT 1) best
      |  WHERE st.it < 12),
      |wt AS (
      |  SELECT u.rw AS w,
      |    len(string_split(ltrim(rtrim(u.dw, chr(2)), chr(1)), chr(2) || chr(1))) AS n_tok
      |  FROM (SELECT UNNEST(words) AS dw, UNNEST(raw) AS rw
      |        FROM (SELECT * FROM st WHERE it = 12)) u),
      |dw AS (
      |  SELECT source, w
      |  FROM (SELECT source, UNNEST(string_split(text, ' ')) AS w FROM documents)
      |  WHERE w <> '')
      |SELECT source, COUNT(*) AS n_words, CAST(SUM(wt.n_tok) AS BIGINT) AS n_tokens
      |FROM dw JOIN wt USING (w) GROUP BY source""".stripMargin

  def all: Seq[Q] = Seq(
    Q("llm_bpe_merges", bpeMerges, Some(bpeMergesSql), headline = true),
    Q("llm_bpe_tokenize", bpeTokenize, Some(bpeTokenizeSql)),
    Q("llm_decontaminate", decontaminate, Some(decontaminateSql)),
    Q("llm_repetition_quality", repetition, Some(repetitionSql)),
    Q("llm_stratified_sample", stratified, Some(stratifiedSql)),
    Q("llm_pack_sequences", packing, Some(packingSql)),
    Q("llm_shard_manifest", shards, Some(shardsSql)),
    Q("llm_chunk_dedup", chunkDedup, Some(chunkDedupSql)),
    Q("llm_vocab_topk", vocabTopk, Some(vocabTopkSql)),
    Q("llm_mix_temperature", mixTemperature, Some(mixTemperatureSql)),
    Q("llm_tfidf_terms", tfidfTerms, Some(tfidfTermsSql)),
    Q("llm_bigram_lm_filter", bigramLmFilter, Some(bigramLmFilterSql)),
    Q("llm_scrub_redact", scrubRedact, Some(scrubRedactSql)))
}
