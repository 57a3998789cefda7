package graft.operators

import java.sql.Timestamp

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** G1/G2 — the core operator: tick → N-second OHLCV+VWAP candles
  * (reference: aggregate_candles aggregator_candles.py:181-226).
  *
  * Semantics pinned against the reference:
  *  - bucket = floor(ts, N seconds) (aggregator_candles.py:197);
  *  - open/close are the first/last tick *by time* in the bucket. pandas
  *    `first/last` depend on physical row order; we pin them with
  *    min_by/max_by over (timestamp, seq) so the result is deterministic and
  *    shuffle-order-independent (DuckDB oracle: arg_min/arg_max);
  *  - `vwap = Σ(p·v)/Σv`, null when Σv = 0 (aggregator_candles.py:212);
  *  - the candle `timestamp` is the FIRST TICK's ts in the bucket, not the
  *    bucket start — a reference quirk we preserve (SURVEY §2.4 G1);
  *  - `number_of_trades` is the group size (aggregator_candles.py:211).
  *
  * Plan shape: partial hash-aggregate → exchange on (symbol, bucket) → final
  * hash-aggregate. No window, no sort: scales linearly with input and is
  * skew-tolerant (bucket cardinality ≫ symbol cardinality).
  */
object CandleAggregator {

  /** @param ticks   columns: symbol, timestamp, price, volume[, seq]
    * @param seconds candle width; 1 for the reference's only active timeframe
    *                (aggregator_candles.py:30)
    * @param priceCol price for raw ticks, close for candle→candle rollup
    *                 (the `use_raw` switch, aggregator_candles.py:196)
    */
  /** The eight candle aggregates, shared verbatim by the batch path and the
    * streaming path ([[graft.streaming.StreamingCandles]]) so batch ≡ stream
    * holds by construction.
    */
  private[graft] def candleAggs(ticks: DataFrame, priceCol: String,
                                priceScale: Int, volumeScale: Int): Seq[Column] = {
    // The min_by/max_by ordering key MUST be a single primitive: a
    // struct(ts, seq) key gives the aggregate a non-mutable buffer and
    // Catalyst silently falls back to SortAggregate — a full sort of the
    // tick table per aggregation, the difference between hash and sort-merge
    // cost at 100 TB (PlanSpec pins the HashAggregate shape). A µs long is
    // enough: the pipeline contract is G5 keep-last dedup upstream, so
    // (symbol, timestamp) is unique exactly as in the reference, where
    // candle aggregation always follows the dedup merge
    // (aggregator_candles.py:104-136,319).
    val ord = unix_micros(col("timestamp"))
    val p = col(priceCol)
    // Σp·v and Σv in decimal: double sums are shuffle-order-dependent; exact
    // decimal arithmetic makes candle VWAP bit-reproducible on any cluster
    // layout (and hash-comparable against the DuckDB oracle).
    val pD = p.cast(DecimalType(18, priceScale))
    val vD = col("volume").cast(DecimalType(18, volumeScale))
    Seq(
      min(col("timestamp")).as("timestamp"), // first-tick ts quirk
      min_by(p, ord).as("open"),
      max(p).as("high"),
      min(p).as("low"),
      max_by(p, ord).as("close"),
      sum(vD).cast("double").as("volume"),
      count(lit(1)).as("number_of_trades"),
      when(sum(vD) > 0,
        sum(pD * vD).cast("double") / sum(vD).cast("double")).as("vwap")
    )
  }

  def aggregate(ticks: DataFrame, seconds: Int = 1, priceCol: String = "price",
                priceScale: Int = 4, volumeScale: Int = 4): DataFrame = {
    val bucket =
      if (seconds == 1) date_trunc("second", col("timestamp"))
      else timestamp_seconds(expr(s"unix_timestamp(timestamp) div $seconds") * seconds)
    val aggs = candleAggs(ticks, priceCol, priceScale, volumeScale)

    // bucket_start is grouping-only: the reference candle schema has no such
    // column (aggregator_candles.py:142) — the candle ts is the first tick's.
    ticks
      .groupBy(col("symbol"), bucket.as("bucket_start"))
      .agg(aggs.head, aggs.tail: _*)
      .drop("bucket_start")
  }

  /** P3 candle validity split (reference: candle_to_calcs.py:76-136): null
    * core fields; high < low; open/close <= 0; volume < 0; zero trades with
    * positive volume. Rejected rows divert to the invalid side-output.
    */
  def validateCandles(candles: DataFrame): ValidatedFrame = {
    val core = Seq("open", "high", "low", "close", "volume", "number_of_trades")
    val anyNull = core.map(c => col(c).isNull).reduce(_ || _)
    val reason =
      when(anyNull, "null_field")
        .when(col("high") < col("low"), "high_lt_low")
        .when(col("open") <= 0 || col("close") <= 0, "nonpositive_price")
        .when(col("volume") < 0, "negative_volume")
        .when(col("number_of_trades") <= 0 && col("volume") > 0, "trades_volume_mismatch")
    ValidatedFrame(
      valid = candles.filter(reason.isNull),
      invalid = candles.filter(reason.isNotNull).withColumn("reject_reason", reason)
    )
  }

  /** P4 stage-2 invariant check — same rules but abort-not-divert, and
    * `number_of_trades <= 0` is unconditional here
    * (reference: aggregator_candles.py:139-163). Returns the violating rows
    * (empty = pass) so callers can fail fast without a second scan.
    */
  def invariantViolations(candles: DataFrame): DataFrame = {
    val core = Seq("open", "high", "low", "close", "volume", "number_of_trades")
    val anyNull = core.map(c => col(c).isNull).reduce(_ || _)
    candles.filter(
      anyNull || col("high") < col("low") || col("open") <= 0 || col("close") <= 0 ||
        col("volume") < 0 || col("number_of_trades") <= 0)
  }

  /** P7 timestamp-gap detector (reference: candle_to_calcs.py:114-128):
    * per-symbol sorted diff > threshold → observability metrics, rows are
    * never filtered. Gaps are measured in integer microseconds (exact; a
    * double-seconds diff would be engine-rounding-dependent).
    */
  def gapStats(candles: DataFrame, thresholdMicros: Long = 1500000L): DataFrame = {
    val w = Window.partitionBy("symbol").orderBy("timestamp")
    val diff = unix_micros(col("timestamp")) - lag(unix_micros(col("timestamp")), 1).over(w)
    candles
      .withColumn("__gap", diff)
      .groupBy(col("symbol"))
      .agg(
        sum(when(col("__gap") > thresholdMicros, 1L).otherwise(0L)).as("gap_count"),
        max(when(col("__gap") > thresholdMicros, col("__gap"))).as("max_gap_us")
      )
  }

  /** P5 pushdown-friendly symbol + time-range scan filter. `endExclusive`
    * distinguishes stage 2's closed interval (aggregator_candles.py:85) from
    * stage 3's half-open one (candle_to_calcs.py:599).
    */
  def rangeFilter(df: DataFrame, symbols: Seq[String], start: Timestamp, end: Timestamp,
                  endExclusive: Boolean = false): DataFrame = {
    val tsOk =
      if (endExclusive) col("timestamp") >= lit(start) && col("timestamp") < lit(end)
      else col("timestamp").between(lit(start), lit(end))
    val symOk: Column = if (symbols.isEmpty) lit(true) else col("symbol").isin(symbols: _*)
    df.filter(tsOk && symOk)
  }
}
