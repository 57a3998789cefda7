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

  /** Intermediate path the h1_derived oracle SQL reads: under the same
    * STABLE staging root as the ingest queries (see
    * [[QueriesIngest.stageRoot]]) so repeated processes overwrite one copy
    * instead of leaking per-process tempdirs, and a persisted
    * oracle_sql.json stays replayable after this process exits.
    */
  private lazy val h1BasePath: String =
    QueriesIngest.stageRoot.resolve("h1_base").toString

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

  /** atr/close with JVM IEEE-754 division semantics spelled out: DuckDB's
    * `/` yields NULL on a zero divisor where the Spark kernel (and the
    * reference's numpy) yield ±inf / nan — and zero-close candles DO occur
    * (6 zero-price events at sf0.1; none at sf0.01, which is why the
    * divergence hid until the sf0.1 sweep). The full IEEE surface is spelled
    * out: NULL atr stays NULL (JVM null/0 is null, not nan), and `signbit`
    * distinguishes -0.0 so atr/-0.0 flips the infinity sign exactly as the
    * JVM does. Shared by every oracle that derives atr_norm.
    */
  private[queries] val ieeeAtrNorm: String =
    "(CASE WHEN close = 0 THEN (CASE WHEN atr IS NULL THEN NULL " +
      "WHEN atr > 0 THEN (CASE WHEN signbit(close) THEN '-infinity'::DOUBLE ELSE 'infinity'::DOUBLE END) " +
      "WHEN atr < 0 THEN (CASE WHEN signbit(close) THEN 'infinity'::DOUBLE ELSE '-infinity'::DOUBLE END) " +
      "ELSE 'nan'::DOUBLE END) " +
      "ELSE atr / close END)"

  /** Explicit oldest-first lag chain: SQL's left-assoc `+` replays the exact
    * add order of [[graft.calc.ta.Ta.Ring.seqMean]], so the rolling-14 mean
    * matches bit-for-bit (a windowed SUM would not — DuckDB's segment-tree
    * accumulation order differs in final ulps).
    */
  private val rollChain: String =
    ((13 to 1 by -1).map(k => s"lag($ieeeAtrNorm, $k) OVER w") :+ s"($ieeeAtrNorm)")
      .mkString(" + ")

  private val h1DerivedSql =
    s"""WITH b AS (SELECT * FROM read_parquet('$h1BasePath/*.parquet')),
       |d AS (
       |  SELECT symbol, ts,
       |    (high + low + close) / 3.0 AS typical_price,
       |    di_pos - di_neg AS di_diff,
       |    CASE WHEN close > psar THEN 1 ELSE 0 END AS psar_trend,
       |    $ieeeAtrNorm AS atr_norm,
       |    COALESCE(atr - lag(atr) OVER w, 0.0) AS atr_change,
       |    COALESCE(t3 - lag(t3, 60) OVER w, 0.0) AS t3_slope,
       |    lag($ieeeAtrNorm, 13) OVER w AS an13,
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
  /** Shared recursion preamble: trimmed candle CTEs + per-symbol row
    * numbering.
    */
  /** The minimal recursive-oracle preamble, parameterized on the stage-1
    * front end: `tickWhere` filters raw events (P1 validity for the
    * pipeline oracle; empty for the plain H rows) and `dedup` inserts the
    * exact-timestamp keep-last pass between ticks and candles.
    */
  private[queries] def recPreambleFrom(tickWhere: String, dedup: Boolean): String = {
    val dedupCte = if (dedup)
      """tdd AS MATERIALIZED (
        |  SELECT * FROM ticks
        |  QUALIFY row_number() OVER (PARTITION BY symbol, tstamp
        |    ORDER BY seq DESC) = 1),
        |""".stripMargin
    else ""
    val src = if (dedup) "tdd" else "ticks"
    s"""WITH RECURSIVE ticks AS MATERIALIZED (
       |  SELECT event_type AS symbol, ts::TIMESTAMP AS tstamp, value AS price,
       |    event_id AS seq
       |  FROM events $tickWhere),
       |${dedupCte}candles AS MATERIALIZED (
       |  SELECT symbol, min(tstamp) AS tstamp, max(price) AS high,
       |    min(price) AS low, arg_max(price, tstamp) AS close
       |  FROM $src GROUP BY symbol, date_trunc('second', tstamp)),
       |base AS MATERIALIZED (
       |  SELECT symbol, tstamp, high, low, close,
       |    row_number() OVER (PARTITION BY symbol ORDER BY tstamp) AS rn
       |  FROM candles),""".stripMargin
  }

  private[queries] val recPreamble = recPreambleFrom("", dedup = false)

  /** The MACD(12,26,9) + Wilder-ATR(14) state machine as a named recursive
    * CTE over `base` — name-parameterized so the standalone h1_recurrences
    * oracle and the composed full-h1 oracle share one text.
    */
  private[queries] def macdAtrCte(nm: String): String =
    s"""$nm AS (
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
       |      FROM $nm r JOIN base b ON b.symbol = r.symbol AND b.rn = r.rn + 1)))""".stripMargin

  private val h1RecurrencesSql =
    s"""$recPreamble
       |${macdAtrCte("rec")}
       |SELECT symbol, strftime(tstamp, '$fmt') AS ts,
       |  CASE WHEN rn >= 34 THEN e_fast - e_slow ELSE 0.0 END AS macd,
       |  CASE WHEN rn >= 34 THEN e_sig ELSE 0.0 END AS macd_signal,
       |  CASE WHEN rn >= 34 THEN (e_fast - e_slow) - e_sig ELSE 0.0 END AS macd_diff,
       |  COALESCE(atr, 0.0) AS atr
       |FROM rec""".stripMargin

  // ---------------------------------------------------------------- h1_adx

  private def h1Adx(s: SparkSession, dir: String): DataFrame =
    IndicatorPass.withIndicators(candles(s, dir)).select(
      col("symbol"), tsMicros(col("timestamp")).as("ts"),
      col("adx"), col("di_pos"), col("di_neg"))

  /** Wilder ADX/±DI(14) state machine mirroring Ta.Adx: raw DM/TR
    * accumulation over rows 2..14, the Wilder transition
    * `s - s/14 + v` from row 15, DX-mean ADX seed at the 14th DX, zero-TR
    * rows pin DI to 0 and freeze the DX counters. Tie bars (diffP = diffM)
    * count for neither side; the layered subqueries order sm→di→dx exactly
    * like the kernel's statement sequence.
    */
  private[queries] def adxCte(nm: String): String =
    s"""$nm AS (
       |  SELECT symbol, rn, tstamp, high AS ph, low AS pl, close AS pc,
       |    CAST(0.0 AS DOUBLE) AS sm_plus, CAST(0.0 AS DOUBLE) AS sm_minus,
       |    CAST(0.0 AS DOUBLE) AS sm_tr, CAST(0.0 AS DOUBLE) AS dx_sum,
       |    0 AS dx_n, CAST(NULL AS DOUBLE) AS adx,
       |    CAST(NULL AS DOUBLE) AS di_plus, CAST(NULL AS DOUBLE) AS di_minus
       |  FROM base WHERE rn = 1
       |  UNION ALL
       |  SELECT symbol, rn, tstamp, h, l, c,
       |    sm_plus2, sm_minus2, sm_tr2,
       |    CASE WHEN rn >= 15 AND sm_tr2 <> 0 AND dx_n < 14 THEN dx_sum + dxt ELSE dx_sum END,
       |    CASE WHEN rn >= 15 AND sm_tr2 <> 0 AND dx_n < 14 THEN dx_n + 1 ELSE dx_n END,
       |    CASE WHEN rn >= 15 AND sm_tr2 <> 0 THEN
       |           CASE WHEN dx_n < 14 THEN (CASE WHEN dx_n + 1 = 14 THEN (dx_sum + dxt) / 14.0 ELSE adx END)
       |                WHEN s2 <> 0 THEN ((adx * 13.0) + dxt) / 14.0
       |                ELSE adx END
       |         ELSE adx END,
       |    di_plus2, di_minus2
       |  FROM (
       |    SELECT *, CASE WHEN s2 <> 0 THEN 100.0 * (ABS(di_plus2 - di_minus2) / s2) ELSE 0.0 END AS dxt
       |    FROM (
       |      SELECT *, di_plus2 + di_minus2 AS s2
       |      FROM (
       |        SELECT *,
       |          CASE WHEN rn < 15 THEN CAST(NULL AS DOUBLE)
       |               WHEN sm_tr2 <> 0 THEN 100.0 * (sm_plus2 / sm_tr2) ELSE 0.0 END AS di_plus2,
       |          CASE WHEN rn < 15 THEN CAST(NULL AS DOUBLE)
       |               WHEN sm_tr2 <> 0 THEN 100.0 * (sm_minus2 / sm_tr2) ELSE 0.0 END AS di_minus2
       |        FROM (
       |          SELECT r.symbol AS symbol, b.rn AS rn, b.tstamp AS tstamp,
       |            b.high AS h, b.low AS l, b.close AS c,
       |            r.dx_sum AS dx_sum, r.dx_n AS dx_n, r.adx AS adx,
       |            CASE WHEN b.rn <= 14 THEN r.sm_plus +
       |                   (CASE WHEN b.high - r.ph > 0 AND b.high - r.ph > r.pl - b.low THEN b.high - r.ph ELSE 0 END)
       |                 ELSE (r.sm_plus - r.sm_plus / 14) +
       |                   (CASE WHEN b.high - r.ph > 0 AND b.high - r.ph > r.pl - b.low THEN b.high - r.ph ELSE 0 END) END AS sm_plus2,
       |            CASE WHEN b.rn <= 14 THEN r.sm_minus +
       |                   (CASE WHEN r.pl - b.low > 0 AND b.high - r.ph < r.pl - b.low THEN r.pl - b.low ELSE 0 END)
       |                 ELSE (r.sm_minus - r.sm_minus / 14) +
       |                   (CASE WHEN r.pl - b.low > 0 AND b.high - r.ph < r.pl - b.low THEN r.pl - b.low ELSE 0 END) END AS sm_minus2,
       |            CASE WHEN b.rn <= 14 THEN r.sm_tr + GREATEST(b.high - b.low, ABS(b.high - r.pc), ABS(b.low - r.pc))
       |                 ELSE (r.sm_tr - r.sm_tr / 14) + GREATEST(b.high - b.low, ABS(b.high - r.pc), ABS(b.low - r.pc)) END AS sm_tr2
       |          FROM $nm r JOIN base b ON b.symbol = r.symbol AND b.rn = r.rn + 1)))))""".stripMargin

  private val h1AdxSql =
    s"""$recPreamble
       |${adxCte("rec")}
       |SELECT symbol, strftime(tstamp, '$fmt') AS ts,
       |  COALESCE(adx, 0.0) AS adx,
       |  COALESCE(di_plus, 0.0) AS di_pos,
       |  COALESCE(di_minus, 0.0) AS di_neg
       |FROM rec""".stripMargin

  // ---------------------------------------------------------------- h1_t3

  private def h1T3(s: SparkSession, dir: String): DataFrame =
    IndicatorPass.withIndicators(candles(s, dir)).select(
      col("symbol"), tsMicros(col("timestamp")).as("ts"), col("t3"))

  /** T3(60, 0.7) mirroring Ta.T3: e1 seeds as the SMA of rows 1-60, each
    * deeper EMA seeds as the mean of the previous stage's seed + next 59
    * outputs (seed rows 119/178/237/296/355 — phase is a pure function of
    * rn), steady-state from row 355 with the `k·x + (1−k)·e` float form.
    * Every 0.7 is cast to DOUBLE: DuckDB would otherwise fold the GD
    * coefficients in exact decimal (−0.343) where the JVM has
    * −0.3429999999999999. NaN→close fill matches IndicatorPass.
    */
  private val kT3 = "(2.0 / 61.0)"
  private val omkT3 = "(1.0 - 2.0 / 61.0)"
  private[queries] val vT3 = "0.7::DOUBLE"

  /** T3's output polynomial over the stage EMAs carried by [[t3Cte]]. */
  private[queries] def t3Out(pfx: String = ""): String = {
    val v = vT3
    s"""CASE WHEN ${pfx}rn >= 355 THEN
       |    (-($v*$v*$v)) * ${pfx}e6
       |    + (3.0::DOUBLE*($v*$v) + 3.0::DOUBLE*($v*$v*$v)) * ${pfx}e5
       |    + (-6.0::DOUBLE*($v*$v) - 3.0::DOUBLE*$v - 3.0::DOUBLE*($v*$v*$v)) * ${pfx}e4
       |    + (1.0::DOUBLE + 3.0::DOUBLE*$v + ($v*$v*$v) + 3.0::DOUBLE*($v*$v)) * ${pfx}e3
       |  ELSE ${pfx}close END""".stripMargin
  }

  private[queries] def t3Cte(nm: String): String = {
    val k = kT3
    val omk = omkT3
    s"""$nm AS (
       |  SELECT symbol, rn, tstamp, close, close AS temp_sum,
       |    CAST(NULL AS DOUBLE) AS e1, CAST(NULL AS DOUBLE) AS e2,
       |    CAST(NULL AS DOUBLE) AS e3, CAST(NULL AS DOUBLE) AS e4,
       |    CAST(NULL AS DOUBLE) AS e5, CAST(NULL AS DOUBLE) AS e6
       |  FROM base WHERE rn = 1
       |  UNION ALL
       |  SELECT symbol, rn, tstamp, c,
       |    CASE WHEN rn < 60 THEN temp_sum + c
       |         WHEN rn = 60 THEN e1n
       |         WHEN rn < 119 THEN temp_sum + e1n
       |         WHEN rn = 119 THEN e2n
       |         WHEN rn < 178 THEN temp_sum + e2n
       |         WHEN rn = 178 THEN e3n
       |         WHEN rn < 237 THEN temp_sum + e3n
       |         WHEN rn = 237 THEN e4n
       |         WHEN rn < 296 THEN temp_sum + e4n
       |         WHEN rn = 296 THEN e5n
       |         WHEN rn < 355 THEN temp_sum + e5n
       |         WHEN rn = 355 THEN e6n
       |         ELSE temp_sum END,
       |    e1n, e2n, e3n, e4n, e5n, e6n
       |  FROM (
       |    SELECT r.symbol AS symbol, b.rn AS rn, b.tstamp AS tstamp,
       |      b.close AS c, r.temp_sum AS temp_sum,
       |      CASE WHEN b.rn < 60 THEN CAST(NULL AS DOUBLE)
       |           WHEN b.rn = 60 THEN (r.temp_sum + b.close) / 60.0
       |           ELSE ($k * b.close) + ($omk * r.e1) END AS e1n,
       |      r.e2 AS e2_old, r.e3 AS e3_old, r.e4 AS e4_old,
       |      r.e5 AS e5_old, r.e6 AS e6_old
       |    FROM $nm r JOIN base b ON b.symbol = r.symbol AND b.rn = r.rn + 1
       |  ) q0
       |  , LATERAL (SELECT CASE WHEN q0.rn < 119 THEN CAST(NULL AS DOUBLE)
       |      WHEN q0.rn = 119 THEN (q0.temp_sum + q0.e1n) / 60.0
       |      ELSE ($k * q0.e1n) + ($omk * q0.e2_old) END AS e2n) l2
       |  , LATERAL (SELECT CASE WHEN q0.rn < 178 THEN CAST(NULL AS DOUBLE)
       |      WHEN q0.rn = 178 THEN (q0.temp_sum + l2.e2n) / 60.0
       |      ELSE ($k * l2.e2n) + ($omk * q0.e3_old) END AS e3n) l3
       |  , LATERAL (SELECT CASE WHEN q0.rn < 237 THEN CAST(NULL AS DOUBLE)
       |      WHEN q0.rn = 237 THEN (q0.temp_sum + l3.e3n) / 60.0
       |      ELSE ($k * l3.e3n) + ($omk * q0.e4_old) END AS e4n) l4
       |  , LATERAL (SELECT CASE WHEN q0.rn < 296 THEN CAST(NULL AS DOUBLE)
       |      WHEN q0.rn = 296 THEN (q0.temp_sum + l4.e4n) / 60.0
       |      ELSE ($k * l4.e4n) + ($omk * q0.e5_old) END AS e5n) l5
       |  , LATERAL (SELECT CASE WHEN q0.rn < 355 THEN CAST(NULL AS DOUBLE)
       |      WHEN q0.rn = 355 THEN (q0.temp_sum + l5.e5n) / 60.0
       |      ELSE ($k * l5.e5n) + ($omk * q0.e6_old) END AS e6n) l6
       |)""".stripMargin
  }

  private val h1T3Sql =
    s"""$recPreamble
       |${t3Cte("rec")}
       |SELECT symbol, strftime(tstamp, '$fmt') AS ts,
       |  ${t3Out()} AS t3
       |FROM rec""".stripMargin

  // ---------------------------------------------------------------- h1_sar

  private def h1Sar(s: SparkSession, dir: String): DataFrame =
    IndicatorPass.withIndicators(candles(s, dir)).select(
      col("symbol"), tsMicros(col("timestamp")).as("ts"), col("psar"))

  /** Parabolic SAR(0.02, 0.2) mirroring Ta.Sar: row-2 direction from the
    * one-period −DM of the first two bars, the reversal/advance/clamp
    * sequence flattened into layered CASEs (out = the pre-advance SAR the
    * kernel emits), prior-two-bars clamping by the NEW direction. NaN→close
    * fill on row 1.
    */
  private[queries] def sarCte(nm: String): String =
    s"""$nm AS (
       |  SELECT symbol, rn, tstamp, high AS prev_high, low AS prev_low, close,
       |    TRUE AS il, CAST(0.02 AS DOUBLE) AS af, CAST(NULL AS DOUBLE) AS ep,
       |    CAST(NULL AS DOUBLE) AS sar, CAST(NULL AS DOUBLE) AS psar_out
       |  FROM base WHERE rn = 1
       |  UNION ALL
       |  SELECT symbol, rn, tstamp, h, l, c,
       |    il1, af1, ep1,
       |    CASE WHEN il1 THEN LEAST(LEAST(out + af1 * (ep1 - out), pL), l)
       |         ELSE GREATEST(GREATEST(out + af1 * (ep1 - out), pH), h) END,
       |    out
       |  FROM (
       |    SELECT *,
       |      CASE WHEN rev THEN NOT il0 ELSE il0 END AS il1,
       |      CASE WHEN rev THEN (CASE WHEN il0 THEN GREATEST(GREATEST(ep0, pH), h)
       |                               ELSE LEAST(LEAST(ep0, pL), l) END)
       |           ELSE sar0 END AS out,
       |      CASE WHEN rev THEN 0.02::DOUBLE
       |           ELSE CASE WHEN il0 AND h > ep0 THEN LEAST(af0 + 0.02::DOUBLE, 0.2::DOUBLE)
       |                     WHEN NOT il0 AND l < ep0 THEN LEAST(af0 + 0.02::DOUBLE, 0.2::DOUBLE)
       |                     ELSE af0 END END AS af1,
       |      CASE WHEN rev THEN (CASE WHEN il0 THEN l ELSE h END)
       |           ELSE CASE WHEN il0 AND h > ep0 THEN h
       |                     WHEN NOT il0 AND l < ep0 THEN l
       |                     ELSE ep0 END END AS ep1
       |    FROM (
       |      SELECT *, CASE WHEN il0 THEN l <= sar0 ELSE h >= sar0 END AS rev
       |      FROM (
       |        SELECT b.symbol AS symbol, b.rn AS rn, b.tstamp AS tstamp,
       |          b.high AS h, b.low AS l, b.close AS c,
       |          r.prev_high AS pH, r.prev_low AS pL,
       |          CASE WHEN b.rn = 2 THEN NOT (r.prev_low - b.low > 0 AND b.high - r.prev_high < r.prev_low - b.low)
       |               ELSE r.il END AS il0,
       |          CASE WHEN b.rn = 2 THEN 0.02::DOUBLE ELSE r.af END AS af0,
       |          CASE WHEN b.rn = 2 THEN (CASE WHEN NOT (r.prev_low - b.low > 0 AND b.high - r.prev_high < r.prev_low - b.low) THEN b.high ELSE b.low END)
       |               ELSE r.ep END AS ep0,
       |          CASE WHEN b.rn = 2 THEN (CASE WHEN NOT (r.prev_low - b.low > 0 AND b.high - r.prev_high < r.prev_low - b.low) THEN r.prev_low ELSE r.prev_high END)
       |               ELSE r.sar END AS sar0
       |        FROM $nm r JOIN base b ON b.symbol = r.symbol AND b.rn = r.rn + 1))))""".stripMargin

  private val h1SarSql =
    s"""$recPreamble
       |${sarCte("rec")}
       |SELECT symbol, strftime(tstamp, '$fmt') AS ts,
       |  COALESCE(psar_out, close) AS psar
       |FROM rec""".stripMargin

  // ---------------------------------------------------------------- h2 sample

  private val samplePatterns =
    Seq("CDLDOJI", "CDLMARUBOZU", "CDLSHORTLINE", "CDLLONGLINE", "CDLENGULFING")

  private def h2Sample(s: SparkSession, dir: String): DataFrame =
    IndicatorPass.withIndicators(candles(s, dir), patterns = true).select(
      (col("symbol") +: tsMicros(col("timestamp")).as("ts") +:
        samplePatterns.map(col)): _*)

  /** Window-SQL oracle for five representative CDL kernels — covering all
    * three TA-Lib range types (RealBody, HighLow, Shadows), factor scaling,
    * the strictly-before trailing averages (explicit newest-first lag chains
    * replaying TA_CANDLEAVERAGE's exact add order), ±100 color outputs, the
    * lookback zero-fill, and a pure-geometry two-candle pattern
    * (ENGULFING). The other 54 kernels share exactly this machinery
    * ([[graft.calc.ta.Patterns.State]]) with more clauses.
    */
  private val h2SampleSql = {
    def chain(expr: String, n: Int) =
      (1 to n).map(k => s"lag($expr, $k) OVER w").mkString(" + ")
    s"""${QueriesDomain.withCandles},
       |g AS (
       |  SELECT symbol, tstamp, open, high, low, close,
       |    ABS(close - open) AS body,
       |    high - GREATEST(close, open) AS up,
       |    LEAST(close, open) - low AS lo,
       |    CASE WHEN close >= open THEN 1 ELSE -1 END AS color,
       |    row_number() OVER w AS rn,
       |    ${chain("ABS(close - open)", 10)} AS sum_body_10,
       |    ${chain("high - low", 10)} AS sum_hl_10,
       |    ${chain("(high - GREATEST(close, open)) + (LEAST(close, open) - low)", 10)} AS sum_sh_10,
       |    lag(CASE WHEN close >= open THEN 1 ELSE -1 END) OVER w AS pcolor,
       |    lag(open) OVER w AS popen, lag(close) OVER w AS pclose
       |  FROM candles
       |  WINDOW w AS (PARTITION BY symbol ORDER BY tstamp)),
       |t AS (
       |  SELECT *,
       |    0.1::DOUBLE * (sum_hl_10 / 10.0) AS thr_hl01,
       |    (sum_body_10 / 10.0) AS thr_body,
       |    (sum_sh_10 / 10.0) / 2.0 AS thr_sh
       |  FROM g)
       |SELECT symbol, strftime(tstamp, '$fmt') AS ts,
       |  CASE WHEN rn > 10 AND body <= thr_hl01 THEN 100 ELSE 0 END AS CDLDOJI,
       |  CASE WHEN rn > 10 AND body > thr_body AND up < thr_hl01 AND lo < thr_hl01
       |    THEN color * 100 ELSE 0 END AS CDLMARUBOZU,
       |  CASE WHEN rn > 10 AND body < thr_body AND up < thr_sh AND lo < thr_sh
       |    THEN color * 100 ELSE 0 END AS CDLSHORTLINE,
       |  CASE WHEN rn > 10 AND body > thr_body AND up < thr_sh AND lo < thr_sh
       |    THEN color * 100 ELSE 0 END AS CDLLONGLINE,
       |  CASE WHEN rn > 2 AND color = 1 AND pcolor = -1 AND close >= popen AND open <= pclose
       |            AND (close > popen OR open < pclose) THEN 100
       |       WHEN rn > 2 AND color = -1 AND pcolor = 1 AND open >= pclose AND close <= popen
       |            AND (open > pclose OR close < popen) THEN -100
       |       ELSE 0 END AS CDLENGULFING
       |FROM t""".stripMargin
  }

  // ---------------------------------------------------------------- h2 sample 2

  private val samplePatterns2 = Seq("CDLHARAMI", "CDLHARAMICROSS", "CDLDOJISTAR",
    "CDLPIERCING", "CDLDARKCLOUDCOVER", "CDLMORNINGSTAR", "CDLEVENINGSTAR",
    "CDLMORNINGDOJISTAR", "CDLEVENINGDOJISTAR", "CDL3WHITESOLDIERS",
    "CDL3BLACKCROWS", "CDLIDENTICAL3CROWS", "CDL3LINESTRIKE")

  private def h2Sample2(s: SparkSession, dir: String): DataFrame =
    IndicatorPass.withIndicators(candles(s, dir), patterns = true)
      .select((col("symbol") +: tsMicros(col("timestamp")).as("ts") +:
        samplePatterns2.map(col)): _*)
      .withColumn("cdl_sum_sample", samplePatterns2.map(col).reduce(_ + _))

  /** Second oracle batch — 13 kernels across the harami/star/three-line
    * families: 2- and 3-candle geometry (inside bodies, body gaps, 30%/50%
    * penetrations), the Near/Far/Equal 5-period thresholds, a 4-candle
    * context (3BLACKCROWS' white bar, 3LINESTRIKE's strike), and ±100 from
    * trend color. `cdl_sum_sample` replays the row-wise pattern-sum shape
    * (G7, candle_to_calcs.py:482-507) over the sampled set with a hard
    * oracle. With the first batch this pins 18 of 59 kernels + every range
    * type, threshold family, and output convention the other 41 reuse.
    */
  private val h2Sample2Sql = {
    def chain(expr: String, n: Int) =
      (1 to n).map(k => s"lag($expr, $k) OVER w").mkString(" + ")
    s"""${QueriesDomain.withCandles},
       |g AS (
       |  SELECT symbol, tstamp, open, high, low, close,
       |    ABS(close - open) AS body,
       |    high - GREATEST(close, open) AS up,
       |    LEAST(close, open) - low AS lo,
       |    GREATEST(close, open) AS bt,
       |    LEAST(close, open) AS bb,
       |    CASE WHEN close >= open THEN 1 ELSE -1 END AS color,
       |    row_number() OVER w AS rn,
       |    ${chain("ABS(close - open)", 10)} AS sum_body_10,
       |    ${chain("high - low", 10)} AS sum_hl_10,
       |    ${chain("high - low", 5)} AS sum_hl_5
       |  FROM candles
       |  WINDOW w AS (PARTITION BY symbol ORDER BY tstamp)),
       |t AS (
       |  SELECT *,
       |    (sum_body_10 / 10.0) AS thr_body,
       |    0.1::DOUBLE * (sum_hl_10 / 10.0) AS thr_hl01,
       |    0.2::DOUBLE * (sum_hl_5 / 5.0) AS thr_near,
       |    0.6::DOUBLE * (sum_hl_5 / 5.0) AS thr_far,
       |    0.05::DOUBLE * (sum_hl_5 / 5.0) AS thr_eq
       |  FROM g),
       |x AS (
       |  SELECT *,
       |    lag(open) OVER w AS o1, lag(open, 2) OVER w AS o2, lag(open, 3) OVER w AS o3,
       |    lag(close) OVER w AS c1, lag(close, 2) OVER w AS c2, lag(close, 3) OVER w AS c3,
       |    lag(high) OVER w AS h1, lag(high, 3) OVER w AS h3,
       |    lag(low) OVER w AS l1,
       |    lag(body) OVER w AS body1, lag(body, 2) OVER w AS body2,
       |    lag(up) OVER w AS up1, lag(up, 2) OVER w AS up2,
       |    lag(lo) OVER w AS lo1, lag(lo, 2) OVER w AS lo2,
       |    lag(bt) OVER w AS bt1, lag(bt, 2) OVER w AS bt2, lag(bt, 3) OVER w AS bt3,
       |    lag(bb) OVER w AS bb1, lag(bb, 2) OVER w AS bb2, lag(bb, 3) OVER w AS bb3,
       |    lag(color) OVER w AS col1, lag(color, 2) OVER w AS col2, lag(color, 3) OVER w AS col3,
       |    lag(thr_body) OVER w AS thr_body1, lag(thr_body, 2) OVER w AS thr_body2,
       |    lag(thr_hl01) OVER w AS thr_hl011, lag(thr_hl01, 2) OVER w AS thr_hl012,
       |    lag(thr_near) OVER w AS thr_near1, lag(thr_near, 2) OVER w AS thr_near2,
       |    lag(thr_near, 3) OVER w AS thr_near3,
       |    lag(thr_far, 1) OVER w AS thr_far1, lag(thr_far, 2) OVER w AS thr_far2,
       |    lag(thr_eq, 1) OVER w AS thr_eq1, lag(thr_eq, 2) OVER w AS thr_eq2
       |  FROM t WINDOW w AS (PARTITION BY symbol ORDER BY tstamp)),
       |pats AS (
       |  SELECT symbol, strftime(tstamp, '$fmt') AS ts,
       |    CASE WHEN rn > 11 AND body1 > thr_body1 AND body <= thr_body
       |      AND bt < bt1 AND bb > bb1 THEN -col1 * 100 ELSE 0 END AS CDLHARAMI,
       |    CASE WHEN rn > 11 AND body1 > thr_body1 AND body <= thr_hl01
       |      AND bt < bt1 AND bb > bb1 THEN -col1 * 100 ELSE 0 END AS CDLHARAMICROSS,
       |    CASE WHEN rn > 11 AND body1 > thr_body1 AND body <= thr_hl01
       |      AND ((col1 = 1 AND bb > bt1) OR (col1 = -1 AND bt < bb1))
       |      THEN -col1 * 100 ELSE 0 END AS CDLDOJISTAR,
       |    CASE WHEN rn > 11 AND col1 = -1 AND body1 > thr_body1
       |      AND color = 1 AND body > thr_body AND open < l1
       |      AND close < o1 AND close > c1 + body1 * 0.5::DOUBLE
       |      THEN 100 ELSE 0 END AS CDLPIERCING,
       |    CASE WHEN rn > 11 AND col1 = 1 AND body1 > thr_body1
       |      AND color = -1 AND open > h1
       |      AND close > o1 AND close < c1 - body1 * 0.5::DOUBLE
       |      THEN -100 ELSE 0 END AS CDLDARKCLOUDCOVER,
       |    CASE WHEN rn > 12 AND col2 = -1 AND body2 > thr_body2
       |      AND body1 <= thr_body1 AND bt1 < bb2
       |      AND color = 1 AND body > thr_body
       |      AND close > c2 + body2 * 0.3::DOUBLE THEN 100 ELSE 0 END AS CDLMORNINGSTAR,
       |    CASE WHEN rn > 12 AND col2 = 1 AND body2 > thr_body2
       |      AND body1 <= thr_body1 AND bb1 > bt2
       |      AND color = -1 AND body > thr_body
       |      AND close < c2 - body2 * 0.3::DOUBLE THEN -100 ELSE 0 END AS CDLEVENINGSTAR,
       |    CASE WHEN rn > 12 AND col2 = -1 AND body2 > thr_body2
       |      AND body1 <= thr_hl011 AND bt1 < bb2
       |      AND color = 1 AND body > thr_body
       |      AND close > c2 + body2 * 0.3::DOUBLE THEN 100 ELSE 0 END AS CDLMORNINGDOJISTAR,
       |    CASE WHEN rn > 12 AND col2 = 1 AND body2 > thr_body2
       |      AND body1 <= thr_hl011 AND bb1 > bt2
       |      AND color = -1 AND body > thr_body
       |      AND close < c2 - body2 * 0.3::DOUBLE THEN -100 ELSE 0 END AS CDLEVENINGDOJISTAR,
       |    CASE WHEN rn > 12 AND col2 = 1 AND up2 < thr_hl012
       |      AND col1 = 1 AND up1 < thr_hl011 AND color = 1 AND up < thr_hl01
       |      AND close > c1 AND c1 > c2
       |      AND o1 > o2 AND o1 <= c2 + thr_near2
       |      AND open > o1 AND open <= c1 + thr_near1
       |      AND body1 > body2 - thr_far2 AND body > body1 - thr_far1
       |      THEN 100 ELSE 0 END AS CDL3WHITESOLDIERS,
       |    CASE WHEN rn > 13 AND col3 = 1
       |      AND col2 = -1 AND lo2 < thr_hl012
       |      AND col1 = -1 AND lo1 < thr_hl011
       |      AND color = -1 AND lo < thr_hl01
       |      AND o1 < o2 AND o1 > c2 AND open < o1 AND open > c1
       |      AND h3 > c2 AND c2 > c1 AND c1 > close
       |      THEN -100 ELSE 0 END AS CDL3BLACKCROWS,
       |    CASE WHEN rn > 12 AND col2 = -1 AND lo2 < thr_hl012
       |      AND col1 = -1 AND lo1 < thr_hl011
       |      AND color = -1 AND lo < thr_hl01
       |      AND c2 > c1 AND c1 > close
       |      AND o1 <= c2 + thr_eq2 AND o1 >= c2 - thr_eq2
       |      AND open <= c1 + thr_eq1 AND open >= c1 - thr_eq1
       |      THEN -100 ELSE 0 END AS CDLIDENTICAL3CROWS,
       |    CASE WHEN rn > 8 AND col3 = col2 AND col2 = col1 AND color = -col1
       |      AND o2 >= bb3 - thr_near3 AND o2 <= bt3 + thr_near3
       |      AND o1 >= bb2 - thr_near2 AND o1 <= bt2 + thr_near2
       |      AND ((col1 = 1 AND c1 > c2 AND c2 > c3 AND open > c1 AND close < o3)
       |        OR (col1 = -1 AND c1 < c2 AND c2 < c3 AND open < c1 AND close > o3))
       |      THEN col1 * 100 ELSE 0 END AS CDL3LINESTRIKE
       |  FROM x)
       |SELECT *,
       |  (CDLHARAMI + CDLHARAMICROSS + CDLDOJISTAR + CDLPIERCING
       |   + CDLDARKCLOUDCOVER + CDLMORNINGSTAR + CDLEVENINGSTAR
       |   + CDLMORNINGDOJISTAR + CDLEVENINGDOJISTAR + CDL3WHITESOLDIERS
       |   + CDL3BLACKCROWS + CDLIDENTICAL3CROWS + CDL3LINESTRIKE) AS cdl_sum_sample
       |FROM pats""".stripMargin
  }

  // ---------------------------------------------------------------- registry

  val all: Seq[Q] = Seq(
    Q("h1_derived", h1Derived, Some(h1DerivedSql)),
    Q("h1_recurrences", h1Recurrences, Some(h1RecurrencesSql)),
    Q("h1_adx", h1Adx, Some(h1AdxSql)),
    Q("h1_t3", h1T3, Some(h1T3Sql)),
    Q("h1_sar", h1Sar, Some(h1SarSql)),
    Q("h2_patterns_sample", h2Sample, Some(h2SampleSql)),
    Q("h2_patterns_sample2", h2Sample2, Some(h2Sample2Sql))
  )
}
