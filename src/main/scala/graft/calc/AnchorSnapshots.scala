package graft.calc

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.operators.TickOps

/** W14 — the anchored_vwap_points output table
  * (compute_anchor_snapshots + flush loops, candle_to_calcs.py:226-249,
  * 657-686), batch form.
  *
  * Deterministic variant of the reference's flush policy: the reference
  * flushes every 300 s of PROCESSING time and at each 30-day chunk end,
  * clearing active anchors after each flush; wall-clock flushes are
  * irreproducible, so this operator emits exactly the chunk-end flushes —
  * what the reference produces when a chunk computes in under 5 minutes.
  * Pinned semantics per flush (= per (symbol, chunk)):
  *
  *  - peak/valley anchors: every row the per-chunk find_peaks flags
  *    (the reference also runs find_peaks on the chunk slice);
  *  - daily_4am/daily_930/daily_4pm: the FIRST row of the day at the trigger
  *    minute — and only in the chunk containing that row (the `*_added`
  *    day-flags persist across a flush, so a later chunk of the same day
  *    does NOT re-anchor);
  *  - daily_high/daily_low: the LAST row in the chunk that set a new
  *    running extreme for the chunk's last local day (anchors of earlier
  *    days are cleared by the day-change reset; a day whose extreme was set
  *    before the chunk boundary yields no anchor after it);
  *  - snapshot row = anchor × the chunk's last row; `anchored_vwap` is NULL
  *    always — the reference never computes it (:245-246);
  *  - `anchor_idx`/`current_idx` reproduce indices into the reference's
  *    buffer+chunk frame: global per-symbol row number rebased to the chunk
  *    start plus min(priorRows, bufferSize);
  *  - keep-last dedup on (symbol, timeframe, anchor_timestamp) by snapshot
  *    time (deduplicate_anchored_vwap_points, :183-193).
  *
  * Chunks are 30-day spans of event time anchored at the Unix epoch (the
  * reference anchors at the job's --start-date; pass `chunkOriginUs` to
  * reproduce a specific run).
  */
object AnchorSnapshots {

  val Triggers: Seq[(String, Int, Int)] =
    Seq(("daily_4am", 4, 0), ("daily_930", 9, 30), ("daily_4pm", 16, 0))

  /** Default chunking (matches the reference's 30-day accumulation window,
    * aggregator_candles.py). Oracle SQL derives its `// divisor` from
    * [[chunkUs]] so the Scala defaults and the replay can't drift.
    */
  val DefaultChunkDays: Int = 30

  /** Chunk width in microseconds for a given day count. */
  def chunkUs(chunkDays: Int = DefaultChunkDays): Long =
    chunkDays * 86400L * 1000000L

  /** The snapshot rows BEFORE the keep-last dedup — the full anchor × last
    * row cross per (symbol, chunk). Exposed separately so the daily-anchor
    * subset can be oracle-checked without the peak flags (which can steal a
    * colliding anchor_timestamp in the dedup); the dedup itself is G5,
    * oracle-verified on its own.
    */
  def snapshots(candles: DataFrame, timeframe: String = "1s",
                chunkDays: Int = DefaultChunkDays, bufferSize: Int = 10000,
                chunkOriginUs: Long = 0L, withTails: Boolean = false): DataFrame = {
    val chunkWidthUs = chunkUs(chunkDays)
    val labeled = WindowCalcs.withDailyRunningExtremes(
      SessionLabels.withSessionLabels(candles))
      .withColumn("chunk", expr(s"(unix_micros(timestamp) - ${chunkOriginUs}L) div ${chunkWidthUs}L"))
    val withPeaks = PeaksPass.withPeakFlags(labeled, Seq("chunk"))

    // cidx = position in the reference's buffer+chunk frame = in-chunk row
    // number + min(rows before this chunk, bufferSize). The in-chunk number
    // comes from a (symbol, chunk)-keyed window — bounded partitions — and
    // the cross-chunk offset from a per-(symbol, chunk) count rollup whose
    // running sum runs over symbols × chunks rows (tiny), broadcast back.
    // No global per-symbol window anywhere: at 100 TB no task ever sees a
    // symbol's full history.
    val wChunkOrd = Window.partitionBy("symbol", "chunk").orderBy("timestamp")
    val wChunk = Window.partitionBy("symbol", "chunk")
    val counts = withPeaks.groupBy(col("symbol").as("cs"), col("chunk").as("cc"))
      .agg(count(lit(1)).as("cnt"))
    val wCum = Window.partitionBy("cs").orderBy("cc")
      .rowsBetween(Window.unboundedPreceding, -1)
    val prior = counts
      .withColumn("prior_rows", coalesce(sum(col("cnt")).over(wCum), lit(0L)))
    val base = withPeaks
      .withColumn("crn", row_number().over(wChunkOrd))
      .withColumn("last_date", max(col("local_date")).over(wChunk))
      // the chunk's last row (the snapshot row every anchor pairs with) is
      // carried by the SAME whole-partition window, not by filtering a
      // second branch of this frame and self-joining: the uncached branch
      // pair re-ran the entire candles→peaks→windows chain twice (measured
      // at sf10: the peaks kernel alone is seconds per hot chunk) and paid
      // an SMJ back. max(timestamp) IS the last row's timestamp; crn is
      // timestamp-ordered so max(crn) is its row number, and cidx is
      // crn−1+const within the chunk, so the last cidx = max(crn)−1+const.
      .withColumn("current_snapshot_timestamp", max(col("timestamp")).over(wChunk))
      .withColumn("last_crn", max(col("crn")).over(wChunk))
      .join(broadcast(prior), col("symbol") === col("cs") && col("chunk") === col("cc"))
      .withColumn("cidx",
        (col("crn") - 1 + least(col("prior_rows"), lit(bufferSize.toLong))).cast("long"))
      .withColumn("current_idx",
        (col("last_crn") - 1 + least(col("prior_rows"), lit(bufferSize.toLong))).cast("long"))
      .drop("cs", "cc", "cnt")

    // ONE pass over `base` for all 27 anchor kinds. The first cut of this
    // operator built a filtered frame per kind and unioned them — 27
    // recomputations of the whole candles→peaks upstream (measured: 6.8 s
    // of the w14 row's cost at sf0.1 was exactly that replay). Instead,
    // every per-kind "row_number() == 1 among the hits" rank collapses to a
    // cumulative-sum-of-hits flag computed on base once, each row builds an
    // array of its anchor candidates, and one explode+filter emits them.
    // The last-among-hits rank deliberately uses partition-total − strict
    // prefix, not an UnboundedFollowing frame (which Spark re-aggregates
    // per row — see the anchoredVwapReal note).
    val wDayCum = Window.partitionBy("symbol", "local_date").orderBy("timestamp")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val wChunkPre = Window.partitionBy("symbol", "chunk").orderBy("timestamp")
      .rowsBetween(Window.unboundedPreceding, -1)

    def firstHitOfDay(hit: Column): Column =
      hit && sum(hit.cast("int")).over(wDayCum) === 1 && col("local_date") === col("last_date")
    def lastHitOfChunk(hit: Column): Column = {
      val h = hit.cast("int")
      hit && (sum(h).over(wChunk) - coalesce(sum(h).over(wChunkPre), lit(0))) === 1
    }

    def candidate(cond: Column, anchorType: String, price: String): Column =
      when(cond, struct(lit(anchorType).as("anchor_type"),
        col(price).as("price_at_anchor"))).otherwise(lit(null))

    val peakCands = PeaksPass.configs.flatMap { case (name, _, _) =>
      Seq(
        candidate(col(s"is_${name}_peak") === 1, s"${name}_peak", "high"),
        candidate(col(s"is_${name}_valley") === 1, s"${name}_valley", "low"))
    }
    val triggerCands = Triggers.map { case (name, h, m) =>
      candidate(
        firstHitOfDay(col("local_hour") === h && col("local_minute") === m),
        name, "close")
    }
    val extremeCands = Seq(
      candidate(
        lastHitOfChunk(col("is_new_daily_high") === 1 && col("local_date") === col("last_date")),
        "daily_high", "high"),
      candidate(
        lastHitOfChunk(col("is_new_daily_low") === 1 && col("local_date") === col("last_date")),
        "daily_low", "low"))

    // Optional per-row chunk-suffix sums for [[anchoredVwapReal]]: each
    // anchor's VWAP range is [anchor row .. chunk's last row], i.e. the
    // suffix AT the anchor's own row — so the sums ride these same
    // (symbol, chunk) windows and survive the explode, instead of a second
    // candling of the input joined back by (symbol, anchor_timestamp).
    // Suffix = whole-partition total − strict prefix, NOT an
    // UnboundedFollowing frame (Spark re-aggregates those per row; see the
    // anchoredVwapReal scaladoc for the decimal-exactness contract).
    val withTailCols = if (!withTails) base else {
      import org.apache.spark.sql.types.DecimalType
      val pD = col("close").cast(DecimalType(18, 2))
      val vD = col("volume").cast(DecimalType(18, 4))
      val pv = col("__pv")
      base.withColumn("__pv", pD * vD)
        .withColumn("tail_pv",
          (sum(pv).over(wChunk) - coalesce(sum(pv).over(wChunkPre), lit(0)))
            .cast(DecimalType(38, 2)))
        .withColumn("tail_v",
          (sum(vD).over(wChunk) - coalesce(sum(vD).over(wChunkPre), lit(0)))
            .cast(DecimalType(38, 2)))
    }

    val tailCols = if (withTails) Seq(col("tail_pv"), col("tail_v")) else Nil
    withTailCols
      .withColumn("__cands", array(peakCands ++ triggerCands ++ extremeCands: _*))
      .withColumn("__a", explode(filter(col("__cands"), _.isNotNull)))
      .select(Seq(
        col("symbol"), lit(timeframe).as("timeframe"),
        col("__a.anchor_type").as("anchor_type"),
        col("timestamp").as("anchor_timestamp"), col("cidx").as("anchor_idx"),
        col("__a.price_at_anchor").as("price_at_anchor"),
        col("current_snapshot_timestamp"), col("current_idx"),
        lit(null).cast("double").as("anchored_vwap")) ++ tailCols: _*)
  }

  def anchoredVwapPoints(candles: DataFrame, timeframe: String = "1s",
                         chunkDays: Int = DefaultChunkDays, bufferSize: Int = 10000,
                         chunkOriginUs: Long = 0L, withTails: Boolean = false): DataFrame = {
    val snaps = snapshots(candles, timeframe, chunkDays, bufferSize, chunkOriginUs, withTails)
    // Dedup ties: different anchor TYPES can share an anchor_timestamp (a
    // peak row that is also the daily high). The reference's keep-last then
    // depends on dict-insertion order — irreproducible — so we pin a
    // documented priority: peak/valley beats daily types, larger granularity
    // beats smaller.
    val priority = typePriority.zipWithIndex
      .foldLeft(lit(-1)) { case (acc, (t, i)) =>
        when(col("anchor_type") === t, lit(i)).otherwise(acc)
      }
    TickOps.dedupKeepLast(snaps,
      Seq("symbol", "timeframe", "anchor_timestamp"),
      Seq(col("current_snapshot_timestamp"), priority))
  }

  /** Collision-tiebreak order, lowest first (see dedup note above). */
  val typePriority: Seq[String] = Seq(
    "daily_4am", "daily_930", "daily_4pm", "daily_high", "daily_low",
    "micro_peak", "micro_valley", "minor_peak", "minor_valley",
    "major_peak", "major_valley")

  /** M4 extension — [[anchoredVwapPoints]] with the `anchored_vwap` column
    * actually computed: Σ close·volume / Σ volume over [anchor row ..
    * chunk's last row] inclusive. The reference allocates the column but
    * never fills it (candle_to_calcs.py:245-246); SURVEY M4 flags the real
    * computation as the natural extension.
    *
    * Because every snapshot is its chunk's LAST row, the anchored range is
    * exactly a per-(symbol, chunk) SUFFIX — one bounded window computes
    * suffix sums for every candle, and each anchor attaches its own row's
    * values by (symbol, anchor_timestamp) equality. No range join, no
    * re-scan per anchor; partitions stay chunk-bounded at any scale.
    * Arithmetic is exact-decimal so the result is accumulation-order-
    * independent and the DuckDB oracle hash-compares bit-for-bit; the
    * single double division happens last.
    *
    * Exactness precondition (stated once, relied on below): close carries
    * ≤2 decimals and volume is a WHOLE number — then every close·volume
    * product is a cent multiple and the scale-2 recast of the sums is
    * lossless. With genuinely fractional volume (the tick API caps it at 4
    * decimals) the recast rounds half-away-from-zero; both engines round
    * identically so oracle parity survives, but the value is then a
    * cent-rounded VWAP numerator/denominator, not the exact one.
    */
  def anchoredVwapReal(candles: DataFrame, timeframe: String = "1s",
                       chunkDays: Int = DefaultChunkDays, bufferSize: Int = 10000,
                       chunkOriginUs: Long = 0L): DataFrame = {
    // The suffix sums ride the snapshot pass's own (symbol, chunk) windows
    // (`withTails` — total − strict prefix, both O(rows); an
    // UnboundedFollowing frame re-aggregates per row, observed wedging the
    // sf1 hot symbol's 500k-row chunk for 40+ minutes) and survive the
    // explode on the anchor's own row — the earlier form candled the input
    // a SECOND time for a tails frame and SMJ'd it back on
    // (symbol, anchor_timestamp). The scale-2 recast is lossless under the
    // whole-number-volume precondition (scaladoc above) and keeps the
    // scaled numerator under 2^53 so the final decimal→double casts are
    // exact in both engines (see Det.centsDouble for the failure mode).
    anchoredVwapPoints(candles, timeframe, chunkDays, bufferSize, chunkOriginUs,
        withTails = true)
      .drop("anchored_vwap")
      .withColumn("anchored_vwap",
        when(col("tail_v") > 0, col("tail_pv").cast("double") / col("tail_v").cast("double")))
      .drop("tail_pv", "tail_v")
  }
}
