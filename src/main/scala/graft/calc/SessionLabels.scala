package graft.calc

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** F6 — one-hot trading-session labels over New-York wall-clock time
  * (reference: label_session_binary candle_to_calcs.py:352-379).
  *
  * The reference derives local date/hour/minute via tz_convert to
  * America/New_York (candle_to_calcs.py:642-645) — DST-aware, so we use
  * `from_utc_timestamp` with the IANA zone, never a fixed offset. Flags stay
  * 0/1 ints (not booleans) to match the reference's `.astype(int)` encoding
  * (candle_to_calcs.py:366-377).
  */
object SessionLabels {

  val Zone = "America/New_York"

  /** Session buckets as [lo, hi) minute-of-day ranges, reference declaration
    * order. "closing" is 16:30–17:00 INCLUSIVE in the reference
    * (candle_to_calcs.py:376) = [990, 1021) in integer minutes; afterhours is
    * the rest of the day. Shared by the Spark expressions and the DuckDB
    * oracle SQL builder — one source of truth.
    */
  val minuteRanges: Seq[(String, Int, Int)] = Seq(
    ("is_overnight_early", 0, 2 * 60),
    ("is_overnight_late", 2 * 60, 4 * 60),
    ("is_early_morning", 4 * 60, 8 * 60),
    ("is_premarket_early", 8 * 60, 9 * 60),
    ("is_premarket_morn", 9 * 60, 9 * 60 + 30),
    ("is_morning", 9 * 60 + 30, 11 * 60),
    ("is_late_morning", 11 * 60, 12 * 60 + 30),
    ("is_midday", 12 * 60 + 30, 14 * 60),
    ("is_early_afternoon", 14 * 60, 15 * 60 + 30),
    ("is_late_afternoon", 15 * 60 + 30, 16 * 60 + 30),
    ("is_closing", 16 * 60 + 30, 17 * 60 + 1),
    ("is_afterhours", 17 * 60 + 1, 24 * 60)
  )

  private def buckets(h: Column, m: Column): Seq[(String, Column)] = {
    val hm = h * 60 + m
    minuteRanges.map { case (name, lo, hi) => name -> (hm >= lo && hm < hi) }
  }

  /** Adds the 4 local-time helper columns + 12 one-hot session flags. */
  def withSessionLabels(df: DataFrame, tsCol: String = "timestamp"): DataFrame = {
    val local = from_utc_timestamp(col(tsCol), Zone)
    val base = df
      .withColumn("local_date", to_date(local))
      .withColumn("local_hour", hour(local))
      .withColumn("local_minute", minute(local))
    buckets(col("local_hour"), col("local_minute")).foldLeft(base) {
      case (acc, (name, pred)) => acc.withColumn(name, pred.cast("int"))
    }
  }

  def labelNames: Seq[String] = buckets(lit(0), lit(0)).map(_._1)
}
