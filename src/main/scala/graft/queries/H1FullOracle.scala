package graft.queries

/** The FULL h1 oracle: all 20 indicator columns of the single-pass H-family
  * engine replayed in one DuckDB query — the four recursive state machines
  * (MACD+ATR, ADX/±DI, T3, SAR — each hash-proven standalone by its
  * component oracle) joined per (symbol, rn), NaN-filled exactly like
  * [[graft.calc.IndicatorPass]], and the pandas-collapse derived layer
  * (h1_derived's window SQL) computed from the oracle's OWN base columns
  * instead of the Spark parquet handoff. This removes the one
  * self-referential step in the H-family verification chain: every input to
  * every derived column is now independently recomputed by DuckDB.
  */
object H1FullOracle {

  /** Oldest-first add order of Ta.Ring.seqMean — see h1DerivedSql. IEEE
    * division (QueriesH.ieeeAtrNorm) for zero-close candles.
    */
  private val rollChain: String =
    ((13 to 1 by -1).map(k => s"lag(${QueriesH.ieeeAtrNorm}, $k) OVER w")
      :+ s"(${QueriesH.ieeeAtrNorm})").mkString(" + ")

  val sql: String = sqlFrom(QueriesH.recPreamble)

  /** Same oracle over a caller-supplied preamble (must define `base`): the
    * pipeline-full row feeds the validated+deduped variant through here.
    */
  def sqlFrom(preamble: String): String =
    s"""$preamble
       |${QueriesH.macdAtrCte("rma")},
       |${QueriesH.adxCte("radx")},
       |${QueriesH.t3Cte("rt3")},
       |${QueriesH.sarCte("rsar")},
       |filled AS (
       |  SELECT b.symbol, b.rn, b.tstamp, b.high, b.low, b.close,
       |    CASE WHEN b.rn >= 34 THEN m.e_fast - m.e_slow ELSE 0.0 END AS macd,
       |    CASE WHEN b.rn >= 34 THEN m.e_sig ELSE 0.0 END AS macd_signal,
       |    CASE WHEN b.rn >= 34 THEN (m.e_fast - m.e_slow) - m.e_sig ELSE 0.0 END AS macd_diff,
       |    COALESCE(m.atr, 0.0) AS atr,
       |    COALESCE(a.adx, 0.0) AS adx,
       |    COALESCE(a.di_plus, 0.0) AS di_pos,
       |    COALESCE(a.di_minus, 0.0) AS di_neg,
       |    ${QueriesH.t3Out("t.")} AS t3,
       |    COALESCE(s.psar_out, b.close) AS psar
       |  FROM base b
       |  JOIN rma m ON m.symbol = b.symbol AND m.rn = b.rn
       |  JOIN radx a ON a.symbol = b.symbol AND a.rn = b.rn
       |  JOIN rt3 t ON t.symbol = b.symbol AND t.rn = b.rn
       |  JOIN rsar s ON s.symbol = b.symbol AND s.rn = b.rn),
       |d AS (
       |  SELECT *,
       |    (high + low + close) / 3.0 AS typical_price,
       |    di_pos - di_neg AS di_diff,
       |    CASE WHEN close > psar THEN 1 ELSE 0 END AS psar_trend,
       |    ${QueriesH.ieeeAtrNorm} AS atr_norm,
       |    COALESCE(atr - lag(atr) OVER w, 0.0) AS atr_change,
       |    COALESCE(t3 - lag(t3, 60) OVER w, 0.0) AS t3_slope,
       |    lag(${QueriesH.ieeeAtrNorm}, 13) OVER w AS an13,
       |    $rollChain AS roll_sum
       |  FROM filled WINDOW w AS (PARTITION BY symbol ORDER BY rn)),
       |e AS (
       |  SELECT *,
       |    COALESCE(ABS(CAST(psar_trend AS DOUBLE)
       |      - CAST(lag(psar_trend) OVER w2 AS DOUBLE)), 0.0) AS psar_reversal,
       |    CASE WHEN an13 IS NULL THEN 0.0 ELSE roll_sum / 14.0 END AS roll_mean
       |  FROM d WINDOW w2 AS (PARTITION BY symbol ORDER BY rn))
       |SELECT symbol, strftime(tstamp, '${QueriesDomain.fmt}') AS ts,
       |  typical_price, adx, di_pos, di_neg, di_diff,
       |  macd, macd_signal, macd_diff, psar, psar_trend, psar_reversal,
       |  atr, atr_norm, atr_change,
       |  CASE WHEN atr_norm > roll_mean THEN 1 ELSE 0 END AS high_volatility,
       |  t3, t3_slope,
       |  CASE WHEN t3_slope > 0.2 THEN 1 ELSE 0 END AS is_uptrend,
       |  CASE WHEN t3_slope < -0.2 THEN 1 ELSE 0 END AS is_downtrend,
       |  CASE WHEN t3_slope > 0.2 OR t3_slope < -0.2 THEN 0 ELSE 1 END AS is_no_trend
       |FROM e""".stripMargin
}
