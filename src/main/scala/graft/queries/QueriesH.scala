package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.calc.IndicatorPass
import graft.queries.Det._
import graft.queries.QueriesDomain.{candles, fmt}

/** Hard correctness signal for the H-family (the reference's stage-3 core,
  * candle_to_calcs.py:381-452), split into two oracle-checkable pieces:
  *
  *  - `h1_derived` — [[IndicatorPass]]'s derived-column logic (fills, lag
  *    diffs, flags, the rolling-14 mean) checked against an independent
  *    window-SQL implementation, GIVEN the base indicators: the Spark pass
  *    writes its own psar/atr/di/t3 base columns to an intermediate parquet
  *    that both engines read. Verifies every pandas-collapse decision
  *    (candle_to_calcs.py:386-452) bit-for-bit.
  *  - `h1_recurrences` — the MACD EMA family and Wilder ATR recurrences
  *    themselves, replayed in DuckDB as a recursive CTE that steps the exact
  *    TA-Lib state machine ([[graft.calc.ta.Ta.Macd]]/[[graft.calc.ta.Ta.Atr]])
  *    row-by-row per symbol. Both sides perform the identical IEEE double
  *    operations in the identical order, so the comparison is exact.
  *
  * Together with the TaGoldenSpec goldens these give the h1 column family an
  * external (non-self-referential) correctness check.
  */
object QueriesH {

  /** Fixed intermediate path (inside the repo tree; target/ is untracked) the
    * h1_derived oracle SQL reads. Absolute because the driver's DuckDB may
    * run with any CWD.
    */
  private val h1BasePath = "/root/repo/target/graft/h1_base"

  // ---------------------------------------------------------------- h1_derived

  private def h1Derived(s: SparkSession, dir: String): DataFrame = {
    val out = IndicatorPass.withIndicators(candles(s, dir)).cache()
    out.select(col("symbol"), tsMicros(col("timestamp")).as("ts"),
        col("high"), col("low"), col("close"),
        col("psar"), col("atr"), col("di_pos"), col("di_neg"), col("t3"))
      .coalesce(1).write.mode("overwrite").parquet(h1BasePath)
    out.select(col("symbol"), tsMicros(col("timestamp")).as("ts"),
      col("typical_price"), col("di_diff"),
      col("psar_trend"), col("psar_reversal"),
      col("atr_norm"), col("atr_change"), col("high_volatility"),
      col("t3_slope"), col("is_uptrend"), col("is_downtrend"), col("is_no_trend"))
  }

  /** Explicit oldest-first lag chain: SQL's left-assoc `+` replays the exact
    * add order of [[graft.calc.ta.Ta.Ring.seqMean]], so the rolling-14 mean
    * matches bit-for-bit (a windowed SUM would not — DuckDB's segment-tree
    * accumulation order differs in final ulps).
    */
  private val rollChain: String =
    ((13 to 1 by -1).map(k => s"lag(atr / close, $k) OVER w") :+ "(atr / close)")
      .mkString(" + ")

  private val h1DerivedSql =
    s"""WITH b AS (SELECT * FROM read_parquet('$h1BasePath/*.parquet')),
       |d AS (
       |  SELECT symbol, ts,
       |    (high + low + close) / 3.0 AS typical_price,
       |    di_pos - di_neg AS di_diff,
       |    CASE WHEN close > psar THEN 1 ELSE 0 END AS psar_trend,
       |    atr / close AS atr_norm,
       |    COALESCE(atr - lag(atr) OVER w, 0.0) AS atr_change,
       |    COALESCE(t3 - lag(t3, 60) OVER w, 0.0) AS t3_slope,
       |    lag(atr / close, 13) OVER w AS an13,
       |    $rollChain AS roll_sum
       |  FROM b WINDOW w AS (PARTITION BY symbol ORDER BY ts)),
       |e AS (
       |  SELECT *,
       |    COALESCE(ABS(CAST(psar_trend AS DOUBLE)
       |      - CAST(lag(psar_trend) OVER w2 AS DOUBLE)), 0.0) AS psar_reversal,
       |    CASE WHEN an13 IS NULL THEN 0.0 ELSE roll_sum / 14.0 END AS roll_mean
       |  FROM d WINDOW w2 AS (PARTITION BY symbol ORDER BY ts))
       |SELECT symbol, ts, typical_price, di_diff, psar_trend, psar_reversal,
       |  atr_norm, atr_change,
       |  CASE WHEN atr_norm > roll_mean THEN 1 ELSE 0 END AS high_volatility,
       |  t3_slope,
       |  CASE WHEN t3_slope > 0.2 THEN 1 ELSE 0 END AS is_uptrend,
       |  CASE WHEN t3_slope < -0.2 THEN 1 ELSE 0 END AS is_downtrend,
       |  CASE WHEN t3_slope > 0.2 OR t3_slope < -0.2 THEN 0 ELSE 1 END AS is_no_trend
       |FROM e""".stripMargin

  // ---------------------------------------------------------------- h1_recurrences

  private def h1Recurrences(s: SparkSession, dir: String): DataFrame =
    IndicatorPass.withIndicators(candles(s, dir)).select(
      col("symbol"), tsMicros(col("timestamp")).as("ts"),
      col("macd"), col("macd_signal"), col("macd_diff"), col("atr"))

  /** Recursive state machine mirroring Ta.Macd(12,26,9) + Ta.Atr(14):
    *  - slow/fast EMAs seed as SMAs ending at row 26 (TA-Lib alignment: the
    *    fast EMA starts accumulating at row 15, ignoring rows 1-14);
    *  - signal EMA of the macd line seeds at row 34 = slow+signal-2+1;
    *  - EMA recurrence written exactly as TA_INT_EMA: ((x - e) * k) + e;
    *  - Wilder ATR: SMA of the first 14 true ranges at row 15, then
    *    ((atr * 13) + tr) / 14;
    *  - outputs NaN→0-filled exactly like IndicatorPass.
    * The inner nesting computes this row's EMAs before the signal branch
    * consumes the fresh macd value m, matching the sequential kernel.
    */
  private val h1RecurrencesSql =
    s"""WITH RECURSIVE ticks AS MATERIALIZED (
       |  SELECT event_type AS symbol, ts::TIMESTAMP AS tstamp, value AS price
       |  FROM events),
       |candles AS MATERIALIZED (
       |  SELECT symbol, min(tstamp) AS tstamp, max(price) AS high,
       |    min(price) AS low, arg_max(price, tstamp) AS close
       |  FROM ticks GROUP BY symbol, date_trunc('second', tstamp)),
       |base AS MATERIALIZED (
       |  SELECT symbol, tstamp, high, low, close,
       |    row_number() OVER (PARTITION BY symbol ORDER BY tstamp) AS rn
       |  FROM candles),
       |rec AS (
       |  SELECT symbol, rn, tstamp,
       |    close AS sum_slow, CAST(NULL AS DOUBLE) AS e_slow,
       |    CAST(0.0 AS DOUBLE) AS sum_fast, CAST(NULL AS DOUBLE) AS e_fast,
       |    CAST(0.0 AS DOUBLE) AS sum_sig, CAST(NULL AS DOUBLE) AS e_sig,
       |    close AS prev_close, CAST(0.0 AS DOUBLE) AS sum_tr,
       |    CAST(NULL AS DOUBLE) AS atr
       |  FROM base WHERE rn = 1
       |  UNION ALL
       |  SELECT symbol, rn, tstamp,
       |    sum_slow2, e_slow2, sum_fast2, e_fast2,
       |    CASE WHEN rn >= 26 AND rn < 34 THEN sum_sig + m ELSE sum_sig END,
       |    CASE WHEN rn < 34 THEN CAST(NULL AS DOUBLE)
       |         WHEN rn = 34 THEN (sum_sig + m) / 9.0
       |         ELSE ((m - e_sig) * (2.0 / 10.0)) + e_sig END,
       |    x, sum_tr2, atr2
       |  FROM (
       |    SELECT *, e_fast2 - e_slow2 AS m FROM (
       |      SELECT b.symbol AS symbol, b.rn AS rn, b.tstamp AS tstamp,
       |        b.close AS x, r.sum_sig AS sum_sig, r.e_sig AS e_sig,
       |        CASE WHEN b.rn <= 26 THEN r.sum_slow + b.close ELSE r.sum_slow END AS sum_slow2,
       |        CASE WHEN b.rn < 26 THEN CAST(NULL AS DOUBLE)
       |             WHEN b.rn = 26 THEN (r.sum_slow + b.close) / 26.0
       |             ELSE ((b.close - r.e_slow) * (2.0 / 27.0)) + r.e_slow END AS e_slow2,
       |        CASE WHEN b.rn >= 15 AND b.rn <= 26 THEN r.sum_fast + b.close ELSE r.sum_fast END AS sum_fast2,
       |        CASE WHEN b.rn < 26 THEN CAST(NULL AS DOUBLE)
       |             WHEN b.rn = 26 THEN (r.sum_fast + b.close) / 12.0
       |             ELSE ((b.close - r.e_fast) * (2.0 / 13.0)) + r.e_fast END AS e_fast2,
       |        CASE WHEN b.rn < 15 THEN r.sum_tr + GREATEST(b.high - b.low, ABS(b.high - r.prev_close), ABS(b.low - r.prev_close)) ELSE r.sum_tr END AS sum_tr2,
       |        CASE WHEN b.rn < 15 THEN CAST(NULL AS DOUBLE)
       |             WHEN b.rn = 15 THEN (r.sum_tr + GREATEST(b.high - b.low, ABS(b.high - r.prev_close), ABS(b.low - r.prev_close))) / 14.0
       |             ELSE ((r.atr * 13.0) + GREATEST(b.high - b.low, ABS(b.high - r.prev_close), ABS(b.low - r.prev_close))) / 14.0 END AS atr2
       |      FROM rec r JOIN base b ON b.symbol = r.symbol AND b.rn = r.rn + 1)))
       |SELECT symbol, strftime(tstamp, '$fmt') AS ts,
       |  CASE WHEN rn >= 34 THEN e_fast - e_slow ELSE 0.0 END AS macd,
       |  CASE WHEN rn >= 34 THEN e_sig ELSE 0.0 END AS macd_signal,
       |  CASE WHEN rn >= 34 THEN (e_fast - e_slow) - e_sig ELSE 0.0 END AS macd_diff,
       |  COALESCE(atr, 0.0) AS atr
       |FROM rec""".stripMargin

  // ---------------------------------------------------------------- registry

  val all: Seq[Q] = Seq(
    Q("h1_derived", h1Derived, Some(h1DerivedSql)),
    Q("h1_recurrences", h1Recurrences, Some(h1RecurrencesSql))
  )
}
