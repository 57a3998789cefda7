package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Distributed suffix-array construction by prefix doubling (the
  * Manber–Myers recurrence in its scan-parallel form, cf. Flick & Aluru,
  * SC'15), token-granular over a document corpus — the exact-substring
  * index behind suffix-array dedup of training data (Lee et al. 2021,
  * "Deduplicating Training Data Makes Language Models Better": their
  * single-node suffix array is the step that caps that pipeline's scale;
  * prefix doubling is the standard distributed escape).
  *
  * Semantics: suffixes live WITHIN documents (a suffix runs from a token
  * position to its document's end — never across a document boundary, which
  * concatenation-with-sentinel schemes emulate anyway). Comparison is
  * token-lexicographic, capped at `capTokens` tokens; suffixes equal through
  * the cap tie-break by (doc_id, pos). Token-sequence order equals
  * space-joined-string order whenever every token byte sorts above the
  * space character — true for this corpus' normalized ASCII text (the same
  * precondition the mm_frame_stats oracle verifies) — which is what lets a
  * SQL oracle replay the order with a plain ORDER BY on the capped joined
  * suffix.
  *
  * Scale shape: each doubling round is (a) one equi-join on the composite
  * key (doc_id, pos + 2^k) to fetch the partner rank, and (b) one
  * order-preserving re-rank = global range-partitioned sort + per-partition
  * index assignment (monotonic ids + a #partitions-long offsets collect,
  * nothing driver-side beyond #partitions longs) + a first-index-per-group
  * aggregate. log₂(capTokens) rounds total — at 100 TB this is the honest
  * cost of an EXACT global suffix order; the rolling-hash window pipeline
  * ([[graft.functions.SubstringDedup]]) is the cheaper candidate-based
  * production path, and this operator is its exactness backstop.
  */
object SuffixArray {

  /** Global order index by `sortCols`: rows sorted, then assigned their
    * 0-based global position. Range partition + per-partition offsets — no
    * single partition anywhere, and (since r15) no external-Row round-trip:
    * the previous RDD.zipWithIndex form paid an
    * InternalRow→Row→InternalRow decode/re-encode on every row, six times
    * per build. Now the sorted frame is materialized ONCE
    * (localCheckpoint — this also freezes the range-partition bounds, which
    * a re-planned repartitionByRange would re-sample under a different RDD
    * id) with `monotonically_increasing_id` riding along
    * (partitionId<<33 | row-offset, assigned in sorted order within each
    * partition), the per-partition counts job collects #partitions longs
    * for the cumulative offsets (the same bounded metadata zipWithIndex's
    * internal count job collected), and the global index is
    * offset(pid) + local — all inside whole-stage codegen, the offset table
    * attached by broadcast join.
    */
  private def withGlobalIdx(df: DataFrame, sortCols: Seq[String]): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val withMid = df.repartitionByRange(sortCols.map(col): _*)
      .sortWithinPartitions(sortCols.map(col): _*)
      .withColumn("__mid", monotonically_increasing_id())
      .localCheckpoint(true)
    val counts = withMid
      .groupBy(shiftright(col("__mid"), 33).cast("int").as("__pid"))
      .agg(count(lit(1)).as("__n"))
      .collect().map(r => (r.getInt(0), r.getLong(1))).sortBy(_._1)
    val offsets = counts.map(_._1).zip(counts.scanLeft(0L)(_ + _._2).init)
    val offDf = offsets.toSeq.toDF("__pid", "__off")
    withMid
      .withColumn("__pid", shiftright(col("__mid"), 33).cast("int"))
      .join(broadcast(offDf), Seq("__pid"))
      .withColumn("__idx",
        col("__off") + col("__mid").bitwiseAND(lit((1L << 33) - 1)))
      .drop("__pid", "__mid", "__off")
  }

  /** Order-preserving sparse re-rank: rows that compare equal on `keyCols`
    * share a rank, ranks are monotone in `keyCols` order. The rank value is
    * the group's first global index — sparse, which the doubling recurrence
    * is indifferent to.
    */
  private def rankBy(df: DataFrame, keyCols: Seq[String]): DataFrame = {
    val idx = withGlobalIdx(df, keyCols)
    val ranks = idx.groupBy(keyCols.map(col): _*)
      .agg(min(col("__idx")).as("__rank"))
    idx.join(ranks, keyCols)
      .drop("__idx")
  }

  /** Build the capped suffix array: one row per (doc_id, pos) with `sa_rank`
    * = the suffix's 1-based position in the global capped-token order
    * (ties through the cap broken by doc_id, pos).
    *
    * @param docs      (idCol, textCol) corpus slice
    * @param capTokens comparison cap; must be a power of two ≥ 2
    */
  def build(docs: DataFrame, textCol: String = "text", idCol: String = "doc_id",
            capTokens: Int = 64): DataFrame = {
    require(capTokens >= 2 && (capTokens & (capTokens - 1)) == 0,
      s"capTokens $capTokens must be a power of two >= 2")
    val toks = docs.select(col(idCol).as("doc_id"),
        posexplode(split(graft.functions.TextOps.normalized(col(textCol)), " ")))
      .select(col("doc_id"), (col("pos") + 1).cast("long").as("pos"), col("col").as("tok"))
    // rank covering 1 token. Each round is eagerly localCheckpoint'ed (the
    // ConnectedComponents convention): the re-rank runs jobs per round,
    // and an uncut lineage would re-execute every earlier round inside it —
    // O(rounds²) work instead of O(rounds) — and recompute the whole chain
    // again at the caller's action.
    var ranked = rankBy(toks, Seq("tok"))
      .select(col("doc_id"), col("pos"), col("__rank").as("rank"))
      .localCheckpoint(true)
    var span = 1
    while (span < capTokens) {
      val partner = ranked.select(col("doc_id"),
        (col("pos") - span).as("pos"), col("rank").as("rank2"))
      val joined = ranked.join(partner, Seq("doc_id", "pos"), "left")
        .select(col("doc_id"), col("pos"), col("rank"),
          coalesce(col("rank2"), lit(-1L)).as("rank2"))
      ranked = rankBy(joined, Seq("rank", "rank2"))
        .select(col("doc_id"), col("pos"), col("__rank").as("rank"))
        .localCheckpoint(true)
      span *= 2
    }
    withGlobalIdx(ranked, Seq("rank", "doc_id", "pos"))
      .select((col("__idx") + 1).as("sa_rank"), col("doc_id"), col("pos"))
  }
}
