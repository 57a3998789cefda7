package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.calc.SessionLabels

/** W13 time-trigger anchors on a candle stream — the anchor-extraction side
  * of the reference's stream mode (check_daily_anchors,
  * candle_to_calcs.py:289-299, driven from the stream loop :777-799).
  *
  * The batch form takes the FIRST row per (symbol, local day, trigger). In a
  * stream, "first by event time" must not depend on arrival order inside a
  * micro-batch, so this is a watermarked windowed aggregation, not a dedup:
  * a local trigger minute is exactly one UTC minute per day, so grouping the
  * trigger-matching rows by (symbol, anchor_type, 1-minute event window) and
  * taking min/min_by yields the day's first trigger row deterministically.
  * Append mode emits each anchor exactly once when the watermark passes its
  * minute; state is bounded by (symbols × triggers × delay).
  *
  * Emission cadence is the caller's trigger — the reference flushes anchors
  * every 300 s of processing time (candle_to_calcs.py:43,788), which is
  * `Trigger.ProcessingTime("5 minutes")` on the writeStream; the rows are
  * identical under any trigger.
  */
object StreamingAnchors {

  def timeTriggerAnchors(candles: DataFrame,
                         watermarkDelay: String = "10 seconds",
                         triggers: Seq[(String, Int, Int)] = Seq(
                           ("daily_4am", 4, 0), ("daily_930", 9, 30), ("daily_4pm", 16, 0))): DataFrame = {
    // watermark FIRST, on the raw candle stream: event-time progress must
    // come from every arriving candle — tracked after the trigger filter it
    // would only advance on trigger hits and the last day's anchors would
    // never flush
    val labeled = SessionLabels.withSessionLabels(
      candles.withWatermark("timestamp", watermarkDelay))
    val anchorType = triggers.foldLeft(lit(null).cast("string")) {
      case (acc, (name, h, m)) =>
        when(col("local_hour") === h && col("local_minute") === m, lit(name)).otherwise(acc)
    }
    labeled
      .withColumn("anchor_type", anchorType)
      .filter(col("anchor_type").isNotNull)
      .groupBy(col("symbol"), col("anchor_type"), window(col("timestamp"), "1 minute"))
      .agg(
        min(col("timestamp")).as("anchor_timestamp"),
        min_by(col("close"), col("timestamp")).as("price_at_anchor"))
      .drop("window")
  }
}
