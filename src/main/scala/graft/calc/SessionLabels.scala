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

  /** (name, predicate over (hour h, minute m)) in reference declaration order. */
  private def buckets(h: Column, m: Column): Seq[(String, Column)] = {
    val hm = h * 60 + m
    def between(lo: Int, hi: Int): Column = hm >= lo && hm < hi // [lo, hi) in minutes
    Seq(
      "session_overnight_early" -> between(0 * 60, 2 * 60),
      "session_overnight_late" -> between(2 * 60, 4 * 60),
      "session_early_morning" -> between(4 * 60, 8 * 60),
      "session_premarket_early" -> between(8 * 60, 9 * 60),
      "session_premarket_morning" -> between(9 * 60, 9 * 60 + 30),
      "session_morning" -> between(9 * 60 + 30, 11 * 60),
      "session_late_morning" -> between(11 * 60, 12 * 60 + 30),
      "session_midday" -> between(12 * 60 + 30, 14 * 60),
      "session_early_afternoon" -> between(14 * 60, 15 * 60 + 30),
      "session_late_afternoon" -> between(15 * 60 + 30, 16 * 60 + 30),
      "session_closing" -> (hm >= 16 * 60 + 30 && hm <= 17 * 60),
      "session_afterhours" -> (hm > 17 * 60)
    )
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
