package graft.calc

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** W-family: frame-expressible rolling/lag analytics over per-symbol,
  * time-ordered candles. Everything here compiles to Spark's sort-based
  * window exec — one exchange on symbol, one in-partition sort, all
  * expressions whole-stage-codegen'd.
  */
object WindowCalcs {

  private def w = Window.partitionBy("symbol").orderBy("timestamp")

  /** W1 — volume spike: volume > 1.5 × rolling-60 mean (min_periods=1, so
    * partial leading frames count)
    * (reference: detect_volume_spikes candle_to_calcs.py:517-526).
    */
  def withVolumeSpikes(df: DataFrame, window: Int = 60, mult: Double = 1.5,
                       exact: Boolean = false): DataFrame = {
    val frame = w.rowsBetween(-(window - 1), 0)
    // `exact`: decimal window sum → identical bits in any engine/partitioning
    // (Spark sums frames sequentially, DuckDB uses segment trees — double
    // sums would differ in last ulps). Default: codegen'd avg.
    val avgVol =
      if (exact) sum(col("volume").cast("decimal(18,4)")).over(frame).cast("double") /
        count(col("volume")).over(frame)
      else avg(col("volume")).over(frame)
    // reference column names + operand order: volume > avg * mult
    // (candle_to_calcs.py:524-525)
    df.withColumn("rolling_avg_volume", avgVol)
      .withColumn("is_volume_spike",
        (col("volume") > col("rolling_avg_volume") * lit(mult)).cast("int"))
  }

  /** W2 — lag difference, nulls→0 per the reference's fillna(0)
    * (reference: candle_to_calcs.py:411,437).
    */
  def withLagDiff(df: DataFrame, src: String, out: String, n: Int = 1): DataFrame =
    df.withColumn(out, coalesce(col(src) - lag(col(src), n).over(w), lit(0.0)))

  /** W3 — rolling mean with pandas default min_periods=window: rows before
    * the window fills emit NaN which the reference collapses to 0/false
    * (reference: high_volatility candle_to_calcs.py:412).
    */
  def rollingMeanFull(df: DataFrame, src: String, out: String, window: Int,
                      exact: Boolean = false, scale: Int = 2): DataFrame = {
    val frame = w.rowsBetween(-(window - 1), 0)
    val filled = count(col(src)).over(frame) >= window
    val mean =
      if (exact) sum(col(src).cast(s"decimal(18,$scale)")).over(frame).cast("double") /
        count(col(src)).over(frame)
      else avg(col(src)).over(frame)
    df.withColumn(out, when(filled, mean))
  }

  /** W4 — Bollinger Bands BBANDS(close, 20, 2, 2, matype=SMA): 20-row SMA ±
    * 2·population σ; TA-Lib emits NaN for the first 19 rows, which the
    * reference backfills with `close` (reference: candle_to_calcs.py:419-425).
    * Pinned semantics, matching the reference column-for-column:
    *  - bb_width = bb_upper - bb_lower (absolute, NOT normalized);
    *  - bb_pos = (close - lower)/(upper - lower), which in pandas is 0/0=NaN
    *    on zero-width bands (warm-up rows where all three = close) → we emit
    *    null there;
    *  - bb_breakout is ONE combined flag (close outside either band).
    */
  def withBollinger(df: DataFrame, period: Int = 20, nbDev: Double = 2.0,
                    exact: Boolean = false): DataFrame = {
    val frame = w.rowsBetween(-(period - 1), 0)
    val filled = count(col("close")).over(frame) >= period
    // `exact`: moments from exact decimal window sums (bit-reproducible under
    // any partitioning; what the oracle queries use). Default: codegen'd
    // avg/stddev_pop (Welford), faster and numerically stabler for deep
    // frames.
    val (meanE, devE) =
      if (exact) {
        val cD = col("close").cast("decimal(18,2)")
        val m = sum(cD).over(frame).cast("double") / count(col("close")).over(frame)
        val ex2 = sum(cD * cD).over(frame).cast("double") / count(col("close")).over(frame)
        (m, sqrt(greatest(ex2 - m * m, lit(0.0))))
      } else (avg(col("close")).over(frame), stddev_pop(col("close")).over(frame))
    val mid = when(filled, meanE).otherwise(col("close"))
    val dev = when(filled, devE).otherwise(lit(0.0))
    val upper = mid + lit(nbDev) * dev
    val lower = mid - lit(nbDev) * dev
    df.withColumn("bb_mid", mid)
      .withColumn("bb_upper", upper)
      .withColumn("bb_lower", lower)
      .withColumn("bb_width", col("bb_upper") - col("bb_lower"))
      .withColumn("bb_pos",
        when(col("bb_upper") =!= col("bb_lower"),
          (col("close") - col("bb_lower")) / (col("bb_upper") - col("bb_lower"))))
      .withColumn("bb_breakout",
        (col("close") > col("bb_upper") || col("close") < col("bb_lower")).cast("int"))
  }

  /** W12 — per NY-local-day running high/low with new-extreme flags
    * (reference: check_daily_anchors candle_to_calcs.py:276-311). Requires a
    * `local_date` column (see [[SessionLabels.withSessionLabels]]).
    *
    * The day's FIRST row initializes the daily state without counting as a
    * new extreme (the reference registers an anchor only when a later row
    * strictly exceeds the running value), so both flags require a non-null
    * lag and a strict comparison.
    */
  def withDailyRunningExtremes(df: DataFrame): DataFrame = {
    val wd = Window.partitionBy("symbol", "local_date").orderBy("timestamp")
      .rowsBetween(Window.unboundedPreceding, 0)
    val wLag = Window.partitionBy("symbol", "local_date").orderBy("timestamp")
    val runHigh = max(col("high")).over(wd)
    val runLow = min(col("low")).over(wd)
    df.withColumn("daily_running_high", runHigh)
      .withColumn("daily_running_low", runLow)
      .withColumn("is_new_daily_high",
        (col("high") > lag(col("daily_running_high"), 1).over(wLag)).cast("int"))
      .withColumn("is_new_daily_low",
        (col("low") < lag(col("daily_running_low"), 1).over(wLag)).cast("int"))
      .withColumn("is_new_daily_high", coalesce(col("is_new_daily_high"), lit(0)))
      .withColumn("is_new_daily_low", coalesce(col("is_new_daily_low"), lit(0)))
  }

  /** W13 — time-trigger daily anchors: the FIRST row whose NY-local (hour,
    * minute) equals a trigger, once per (symbol, local day, trigger)
    * (reference: candle_to_calcs.py:289-299). Minute-exact on purpose: a day
    * with no 04:00:xx candle gets no 4am anchor — reference quirk preserved.
    * Requires local_date/local_hour/local_minute columns.
    */
  def timeTriggerAnchors(df: DataFrame,
                         triggers: Seq[(String, Int, Int)] = Seq(
                           ("daily_4am", 4, 0), ("daily_930", 9, 30), ("daily_4pm", 16, 0))): DataFrame = {
    val frames = triggers.map { case (name, h, m) =>
      val hit = df.filter(col("local_hour") === h && col("local_minute") === m)
      val first = Window.partitionBy("symbol", "local_date").orderBy("timestamp")
      hit.withColumn("__rn", row_number().over(first))
        .filter(col("__rn") === 1)
        .select(col("symbol"), lit(name).as("anchor_type"),
          col("timestamp").as("anchor_timestamp"), col("close").as("price_at_anchor"))
    }
    frames.reduce(_ unionByName _)
  }
}
