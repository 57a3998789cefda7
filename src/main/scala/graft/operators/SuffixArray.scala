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

  /** Byte budget for broadcasting the per-round partner frame
    * ((doc_id, pos, rank) ≈ 24 B/row) in [[build]]'s doubling loop; past it
    * the partner fetch switches from the broadcast equi-join to the per-doc
    * `lead(rank, span)` window shift (one exchange instead of two per
    * round). Session config, not a constant — mirrors Spark's own 10 MB
    * autoBroadcastJoinThreshold so the small-corpus physical plan is
    * unchanged from the AQE-chosen broadcast it always had.
    */
  val PartnerBroadcastBytesKey = "spark.graft.suffixArray.partnerBroadcastMaxBytes"
  private val PartnerBroadcastBytesDefault = 10L * 1024 * 1024

  /** Global order index by `sortCols`: rows sorted, then assigned their
    * 0-based global position — via the native
    * [[graft.plans.GlobalIndexPlan]] node: the planner inserts ONE range
    * exchange + sort (OrderedDistribution — no single partition anywhere),
    * and the index append zips the sorted InternalRows directly through a
    * codegen'd projection. No external-Row round-trip (the r14-flagged
    * RDD.zipWithIndex cost) and no per-call materialization (the r15
    * checkpoint+offsets-join attempt measured WORSE, 3.3 → 5.7 s at
    * sf0.1); the only extra job is zipWithIndex's bounded per-partition
    * count — #partitions longs to the driver.
    */
  private[graft] def withGlobalIdx(df: DataFrame, sortCols: Seq[String]): DataFrame =
    org.apache.spark.sql.graftbridge.PlanBridge.ofRows(df.sparkSession,
      graft.plans.GlobalIndexPlan(
        org.apache.spark.sql.graftbridge.PlanBridge.analyzed(df),
        sortCols, graft.plans.GlobalIndexPlan.mkOutAttr("__idx")))

  /** Order-preserving sparse re-rank: rows that compare equal on `keyCols`
    * share a rank, ranks are monotone in `keyCols` order. The rank value is
    * the group's first global index — sparse, which the doubling recurrence
    * is indifferent to.
    *
    * Implementation: the native segmented scan ([[graft.plans.GlobalRankPlan]])
    * — the frame leaving the range sort is already key-contiguous, so the
    * run-start rank needs only a #partitions-sized boundary exchange, not
    * the `groupBy(min)` + key join (two full hash exchanges per doubling
    * round) the DataFrame form paid. The legacy three-stage form (and its
    * `spark.graft.suffixArray.segmentedRank` escape hatch) was retired in
    * r17 after a full round of green artifacts on the segmented path
    * (r16: sf0.01 + sf0.1 + sf1 hash-green, sf10 A/B 29.6 → 23.1 s);
    * `GlobalIndexRankSpec` still pins exact parity against the public-API
    * groupBy(min)+join form, built inline as the test baseline.
    */
  private[graft] def rankBy(df: DataFrame, keyCols: Seq[String]): DataFrame =
    org.apache.spark.sql.graftbridge.PlanBridge.ofRows(df.sparkSession,
      graft.plans.GlobalRankPlan(
        org.apache.spark.sql.graftbridge.PlanBridge.analyzed(df),
        keyCols, graft.plans.GlobalIndexPlan.mkOutAttr("__rank")))

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
    // Partner-rank fetch: rank2(doc, pos) = rank(doc, pos + span), with two
    // size-gated physical forms (one bounded count on the already-
    // materialized round-0 checkpoint decides for all rounds):
    //  - SMALL (frame fits a broadcast): the (doc_id, pos) equi-join — the
    //    partner side broadcasts, zero exchanges per fetch. Forcing the
    //    window form here regressed sf0.1 2.5 -> 3.0 s: it replaced a
    //    broadcast join with a real shuffle.
    //  - LARGE (past the broadcast budget, where the join would shuffle the
    //    frame TWICE per round as an SMJ): positions are DENSE per doc
    //    (posexplode; every round keeps all rows), so the fetch is a per-doc
    //    shift — lead(rank, span) over (doc_id, pos) — one doc_id exchange +
    //    one in-partition sort per round. Document-granular suffixes bound
    //    the per-doc row count, so a window partition cannot outgrow a task.
    val rows = ranked.count()
    val maxBroadcast = docs.sparkSession.conf
      .getOption(PartnerBroadcastBytesKey).map(_.toLong)
      .getOrElse(PartnerBroadcastBytesDefault)
    val shiftByWindow = rows * 24L > maxBroadcast
    var span = 1
    while (span < capTokens) {
      ranked = rankBy(partnerFetch(ranked, span, shiftByWindow), Seq("rank", "rank2"))
        .select(col("doc_id"), col("pos"), col("__rank").as("rank"))
        .localCheckpoint(true)
      span *= 2
    }
    withGlobalIdx(ranked, Seq("rank", "doc_id", "pos"))
      .select((col("__idx") + 1).as("sa_rank"), col("doc_id"), col("pos"))
  }

  /** One doubling round's partner fetch (both size-gated forms — see the
    * comment in [[build]]). */
  private def partnerFetch(ranked: DataFrame, span: Int,
                           shiftByWindow: Boolean): DataFrame =
    if (shiftByWindow) {
      val byDocPos = org.apache.spark.sql.expressions.Window
        .partitionBy(col("doc_id")).orderBy(col("pos"))
      ranked.select(col("doc_id"), col("pos"), col("rank"),
        coalesce(lead(col("rank"), span).over(byDocPos), lit(-1L)).as("rank2"))
    } else {
      val partner = ranked.select(col("doc_id"),
        (col("pos") - span).as("pos"), col("rank").as("rank2"))
      ranked.join(broadcast(partner), Seq("doc_id", "pos"), "left")
        .select(col("doc_id"), col("pos"), col("rank"),
          coalesce(col("rank2"), lit(-1L)).as("rank2"))
    }

  /** Plan-evidence hook (graft.Profile `sa-round`): explain round 1's
    * partner-fetch + re-rank under the session's current partner budget —
    * the per-round plan is invisible in [[build]]'s final explain because
    * every round ends at a localCheckpoint boundary.
    */
  private[graft] def explainRound1(docs: DataFrame, textCol: String = "text",
                                   idCol: String = "doc_id"): Unit = {
    val toks = docs.select(col(idCol).as("doc_id"),
        posexplode(split(graft.functions.TextOps.normalized(col(textCol)), " ")))
      .select(col("doc_id"), (col("pos") + 1).cast("long").as("pos"), col("col").as("tok"))
    val ranked = rankBy(toks, Seq("tok"))
      .select(col("doc_id"), col("pos"), col("__rank").as("rank"))
      .localCheckpoint(true)
    val maxBroadcast = docs.sparkSession.conf
      .getOption(PartnerBroadcastBytesKey).map(_.toLong)
      .getOrElse(PartnerBroadcastBytesDefault)
    val shiftByWindow = ranked.count() * 24L > maxBroadcast
    rankBy(partnerFetch(ranked, 1, shiftByWindow), Seq("rank", "rank2"))
      .explain("formatted")
  }

  /** Duplicated fixed-width window positions read OFF the suffix array —
    * the operational dedup output of the exact index (Lee et al. 2021's
    * suffix-array step: duplicated substrings are contiguous RUNS in
    * suffix order): a position (doc, pos) hosts a duplicated `k`-token
    * window iff its suffix shares a ≥k-token prefix with an ADJACENT
    * suffix in rank order. Adjacency is complete by contiguity — all
    * suffixes sharing a k-token prefix are consecutive in the array
    * (k ≤ capTokens), and no shorter-than-k suffix can sort between two of
    * them (a prefix sorts BEFORE the strings it prefixes), so the
    * rank+1 self-join over the ≥k-token suffixes misses nothing. Unlike
    * the rolling-hash pipeline ([[graft.functions.SubstringDedup]], which
    * counts CROSS-DOC duplicates only), this counts ANY second occurrence,
    * within-doc repeats included — the two exact paths cross-check each
    * other's contracts where they overlap.
    *
    * Scale: one (doc_id)-keyed join to re-attach token arrays, one
    * rank-shifted equi-join on the 8-byte sa_rank key (NO global-order
    * window — a `lag() OVER (ORDER BY sa_rank)` would sort the corpus on
    * one reducer), and a distinct on 16-byte (doc, pos) pairs.
    *
    * @return one row per position hosting a duplicated k-token window:
    *         (doc_id, pos), pos 1-based.
    */
  def dupWindowPositions(docs: DataFrame, k: Int = 10, textCol: String = "text",
                         idCol: String = "doc_id", capTokens: Int = 64): DataFrame = {
    require(k >= 1 && k <= capTokens, s"k $k must be in [1, capTokens=$capTokens]")
    val sa = build(docs, textCol, idCol, capTokens)
    val toks = docs.select(col(idCol).as("doc_id"),
      split(graft.functions.TextOps.normalized(col(textCol)), " ").as("toks"))
    val suf = sa.join(toks, "doc_id")
      .filter(size(col("toks")) - col("pos") + 1 >= k)
      .select(col("sa_rank"), col("doc_id"), col("pos"),
        slice(col("toks"), col("pos"), lit(k)).as("win"))
    val prev = suf.select((col("sa_rank") + 1).as("sa_rank"),
      col("win").as("pwin"), col("doc_id").as("pdoc"), col("pos").as("ppos"))
    val eq = suf.join(prev, "sa_rank").filter(col("win") === col("pwin"))
    eq.select(col("doc_id"), col("pos"))
      .unionByName(eq.select(col("pdoc").as("doc_id"), col("ppos").as("pos")))
      .distinct()
  }
}
