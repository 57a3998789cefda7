package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.operators.CandleAggregator

/** Structured Streaming surface (SURVEY §2.9) — the reference's `--stream`
  * mode (candle_to_calcs.py:702-829) is a hand-rolled micro-batch loop over
  * 1-minute event-time slices; Spark's micro-batch engine is the same model
  * with real watermarks and checkpointed state.
  *
  *  - [[candles1s]] is G1 as a streaming windowed aggregation: the exact
    *  batch aggregate expressions ([[CandleAggregator.candleAggs]]) grouped
    *  by `window(ts, Ns)` (streaming needs the event-time window for
    *  watermark state eviction; batch uses the equivalent `date_trunc`
    *  bucket). Append mode emits each candle exactly once, when the
    *  watermark passes its window — so late ticks within the delay still
    *  land in their candle, and state is bounded by (symbols × delay) rows
    *  regardless of stream length.
  *  - [[dedupWithinWatermark]] is G5's streaming analog: the reference
  *    handles replayed rows by keep-last dedup on re-merge
  *    (fetch_historical_trades_nvda.py:239-245); in-flight, replayed ticks
  *    are byte-identical so drop-first ≡ keep-last, and
  *    `dropDuplicatesWithinWatermark` bounds the dedup state where a plain
  *    `dropDuplicates` would grow forever.
  *
  * The reference's stream mode silently assumes in-order input (SURVEY
  * §2.9); the watermark delay makes that assumption explicit and tunable
  * (its 1.5 s gap-log threshold suggests ≥ 2 s; default 10 s is safe).
  */
object StreamingCandles {

  /** G1 candle aggregation over a streaming tick frame
    * (columns: symbol, timestamp, price, volume[, seq]).
    */
  def candles1s(ticks: DataFrame, watermarkDelay: String = "10 seconds",
                seconds: Int = 1): DataFrame = {
    val wm = ticks.withWatermark("timestamp", watermarkDelay)
    val aggs = CandleAggregator.candleAggs(ticks, "price", 4, 4)
    wm.groupBy(col("symbol"), window(col("timestamp"), s"$seconds seconds"))
      .agg(aggs.head, aggs.tail: _*)
      .drop("window")
  }

  /** G5 streaming dedup on the tick key (symbol, timestamp) with bounded
    * state.
    */
  def dedupWithinWatermark(ticks: DataFrame,
                           watermarkDelay: String = "10 seconds"): DataFrame =
    ticks.withWatermark("timestamp", watermarkDelay)
      .dropDuplicatesWithinWatermark("symbol", "timestamp")

  /** G5 → G1 chained as TWO stateful operators in ONE streaming query —
    * the stage-1→2 spine of the pipeline composition. One `withWatermark`
    * only: with multiple stateful operators Spark forbids redefining the
    * watermark mid-chain, so the dedup and the windowed aggregation share
    * the single upstream definition (dedup state evicts at wm, windows
    * close at wm — the one delay bounds both).
    */
  def dedupedCandles1s(ticks: DataFrame, watermarkDelay: String = "10 seconds",
                       seconds: Int = 1): DataFrame = {
    val deduped = ticks.withWatermark("timestamp", watermarkDelay)
      .dropDuplicatesWithinWatermark("symbol", "timestamp")
    val aggs = CandleAggregator.candleAggs(ticks, "price", 4, 4)
    deduped.groupBy(col("symbol"), window(col("timestamp"), s"$seconds seconds"))
      .agg(aggs.head, aggs.tail: _*)
      .drop("window")
  }
}
