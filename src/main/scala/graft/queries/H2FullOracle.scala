package graft.queries

/** The FULL W10 oracle: every one of the 59 CDL kernels + the row-wise
  * candle_pattern_sum (G7) replayed as DuckDB window SQL — so `h2_patterns`
  * itself hash-checks, not just sampled kernels.
  *
  * Structure mirrors [[graft.calc.ta.Patterns]] (the spec; re-derived from
  * the published TA-Lib C sources):
  *
  *  - thresholds are TA-Lib candle settings: factor × trailing average of a
  *    range type over the candles strictly before the candle under test,
  *    with the lag chains written oldest-last left-associated so the double
  *    adds replay the kernel's exact order;
  *  - per-offset values/thresholds are plain window lags (`x_1` … `x_4`);
  *  - CDLHIKKAKEMOD's cross-row confirmation state is bounded (3 bars), so
  *    the armed-pattern logic expands into lags over the detection flag:
  *    a row confirms against the latest detection k ≤ 3 bars back iff no
  *    detection sits between them and no intermediate row (gated by its own
  *    lookback) already confirmed it;
  *  - a pattern emits 0 until its TA-Lib lookback (`rn > lookback`),
  *    reproducing the leading-NaN → fillna(0) shape.
  */
object H2FullOracle {

  private def chain(expr: String, n: Int) =
    (1 to n).map(k => s"lag($expr, $k) OVER w").mkString(" + ")

  private val lagVars = Seq("open", "high", "low", "close", "body", "up", "lo",
    "bt", "bb", "color", "thr_body", "thr_hl01", "thr_sh", "thr_near",
    "thr_far", "thr_eq")

  private val lagDefs = (for { v <- lagVars; k <- 1 to 4 }
    yield s"lag($v, $k) OVER w AS ${v}_$k").mkString(",\n    ")

  private val maru0 = "body > thr_body AND up < thr_hl01 AND lo < thr_hl01"
  private val maru1 = "body_1 > thr_body_1 AND up_1 < thr_hl01_1 AND lo_1 < thr_hl01_1"

  private def beyond0(k: Int) =
    s"((hk_r_$k = 100 AND close > hk_ch_$k) OR (hk_r_$k = -100 AND close < hk_cl_$k))"
  private def beyond(a: Int, k: Int) =
    s"((hk_r_$k = 100 AND close_$a > hk_ch_$k) OR (hk_r_$k = -100 AND close_$a < hk_cl_$k))"

  private val hikkakeMod =
    s"""CASE
       |  WHEN rn > 10 AND hk_d THEN hk_r
       |  WHEN rn > 10 AND NOT hk_d AND hk_d_1 AND ${beyond0(1)} THEN 2 * hk_r_1
       |  WHEN rn > 10 AND NOT hk_d AND NOT hk_d_1 AND hk_d_2 AND ${beyond0(2)}
       |    AND NOT (rn > 11 AND ${beyond(1, 2)}) THEN 2 * hk_r_2
       |  WHEN rn > 10 AND NOT hk_d AND NOT hk_d_1 AND NOT hk_d_2 AND hk_d_3 AND ${beyond0(3)}
       |    AND NOT (rn > 12 AND ${beyond(2, 3)})
       |    AND NOT (rn > 11 AND ${beyond(1, 3)}) THEN 2 * hk_r_3
       |  ELSE 0 END""".stripMargin

  /** (name, lookback gate, condition, value); condition == null → value is a
    * full expression (already 0-defaulted), still gated on rn where set.
    */
  private val patterns: Seq[(String, Option[Int], Option[String], String)] = Seq(
    // ---- single-candle (17)
    ("CDLDOJI", Some(10), Some("body <= thr_hl01"), "100"),
    ("CDLHAMMER", Some(11), Some(
      "body < thr_body AND lo > body AND up < thr_hl01 AND bb <= low_1 + thr_near_1"), "100"),
    ("CDLINVERTEDHAMMER", Some(11), Some(
      "body < thr_body AND up > body AND lo < thr_hl01 AND bt < bb_1"), "100"),
    ("CDLHANGINGMAN", Some(11), Some(
      "body < thr_body AND lo > body AND up < thr_hl01 AND bb >= high_1 - thr_near_1"), "-100"),
    ("CDLSHOOTINGSTAR", Some(11), Some(
      "body < thr_body AND up > body AND lo < thr_hl01 AND bb > bt_1"), "-100"),
    ("CDLMARUBOZU", Some(10), Some(maru0), "color * 100"),
    ("CDLLONGLEGGEDDOJI", Some(10), Some(
      "body <= thr_hl01 AND (lo > body OR up > body)"), "100"),
    ("CDLDRAGONFLYDOJI", Some(10), Some(
      "body <= thr_hl01 AND up < thr_hl01 AND lo > thr_hl01"), "100"),
    ("CDLGRAVESTONEDOJI", Some(10), Some(
      "body <= thr_hl01 AND lo < thr_hl01 AND up > thr_hl01"), "100"),
    ("CDLTAKURI", Some(10), Some(
      "body <= thr_hl01 AND up < thr_hl01 AND lo > 2.0::DOUBLE * body"), "100"),
    ("CDLHIGHWAVE", Some(10), Some(
      "body < thr_body AND up > 2.0::DOUBLE * body AND lo > 2.0::DOUBLE * body"),
      "color * 100"),
    ("CDLSPINNINGTOP", Some(10), Some(
      "body < thr_body AND up > body AND lo > body"), "color * 100"),
    ("CDLCLOSINGMARUBOZU", Some(10), Some(
      "body > thr_body AND ((color = 1 AND up < thr_hl01) OR (color = -1 AND lo < thr_hl01))"),
      "color * 100"),
    ("CDLBELTHOLD", Some(10), Some(
      "body > thr_body AND ((color = 1 AND lo < thr_hl01) OR (color = -1 AND up < thr_hl01))"),
      "color * 100"),
    ("CDLRICKSHAWMAN", Some(10), Some(
      "body <= thr_hl01 AND lo > body AND up > body " +
        "AND bb <= low + (high - low) / 2 + thr_near " +
        "AND bt >= low + (high - low) / 2 - thr_near"), "100"),
    ("CDLSHORTLINE", Some(10), Some(
      "body < thr_body AND up < thr_sh AND lo < thr_sh"), "color * 100"),
    ("CDLLONGLINE", Some(10), Some(
      "body > thr_body AND up < thr_sh AND lo < thr_sh"), "color * 100"),
    // ---- two-candle (19)
    ("CDLHARAMI", Some(11), Some(
      "body_1 > thr_body_1 AND body <= thr_body AND bt < bt_1 AND bb > bb_1"),
      "-color_1 * 100"),
    ("CDLENGULFING", Some(2), None,
      "CASE WHEN color = 1 AND color_1 = -1 AND close >= open_1 AND open <= close_1 " +
        "AND (close > open_1 OR open < close_1) THEN 100 " +
        "WHEN color = -1 AND color_1 = 1 AND open >= close_1 AND close <= open_1 " +
        "AND (open > close_1 OR close < open_1) THEN -100 ELSE 0 END"),
    ("CDLPIERCING", Some(11), Some(
      "color_1 = -1 AND body_1 > thr_body_1 AND color = 1 AND body > thr_body " +
        "AND open < low_1 AND close < open_1 AND close > close_1 + body_1 * 0.5::DOUBLE"),
      "100"),
    ("CDLDARKCLOUDCOVER", Some(11), Some(
      "color_1 = 1 AND body_1 > thr_body_1 AND color = -1 AND open > high_1 " +
        "AND close > open_1 AND close < close_1 - body_1 * 0.5::DOUBLE"), "-100"),
    ("CDLKICKING", Some(11), Some(
      s"color = -color_1 AND $maru0 AND $maru1 " +
        "AND ((color = 1 AND bb > bt_1) OR (color = -1 AND bt < bb_1))"), "color * 100"),
    ("CDLKICKINGBYLENGTH", Some(11), Some(
      s"color = -color_1 AND $maru0 AND $maru1 " +
        "AND ((color = 1 AND bb > bt_1) OR (color = -1 AND bt < bb_1))"),
      "CASE WHEN body > body_1 THEN color * 100 ELSE color_1 * 100 END"),
    ("CDLCOUNTERATTACK", Some(11), Some(
      "color_1 = -color AND body_1 > thr_body_1 AND body > thr_body " +
        "AND close <= close_1 + thr_eq_1 AND close >= close_1 - thr_eq_1"), "color * 100"),
    ("CDLGAPSIDESIDEWHITE", Some(7), Some(
      "((bb_1 > bt_2 AND bb > bt_2) OR (bt_1 < bb_2 AND bt < bb_2)) " +
        "AND color_1 = 1 AND color = 1 " +
        "AND body >= body_1 - thr_near_1 AND body <= body_1 + thr_near_1 " +
        "AND open >= open_1 - thr_eq_1 AND open <= open_1 + thr_eq_1"),
      "CASE WHEN bb_1 > bt_2 THEN 100 ELSE -100 END"),
    ("CDLSEPARATINGLINES", Some(11), Some(
      "color_1 = -color AND ABS(open - open_1) <= thr_eq_1 AND body > thr_body " +
        "AND ((color = 1 AND lo < thr_hl01) OR (color = -1 AND up < thr_hl01))"),
      "color * 100"),
    ("CDLONNECK", Some(11), Some(
      "color_1 = -1 AND body_1 > thr_body_1 AND color = 1 AND open < low_1 " +
        "AND close <= low_1 + thr_eq_1 AND close >= low_1 - thr_eq_1"), "-100"),
    ("CDLINNECK", Some(11), Some(
      "color_1 = -1 AND body_1 > thr_body_1 AND color = 1 AND open < low_1 " +
        "AND close <= close_1 + thr_eq_1 AND close >= close_1"), "-100"),
    ("CDLSTALLEDPATTERN", Some(12), Some(
      "color_2 = 1 AND color_1 = 1 AND color = 1 " +
        "AND close > close_1 AND close_1 > close_2 " +
        "AND body_2 > thr_body_2 AND body_1 > thr_body_1 AND up_1 < thr_hl01_1 " +
        "AND open_1 > open_2 AND open_1 <= close_2 + thr_near_2 " +
        "AND body < thr_body AND open >= close_1 - body - thr_near_1"), "-100"),
    ("CDLMATCHINGLOW", Some(6), Some(
      "color_1 = -1 AND color = -1 " +
        "AND close <= close_1 + thr_eq_1 AND close >= close_1 - thr_eq_1"), "100"),
    ("CDLBREAKAWAY", Some(14), Some(
      "body_4 > thr_body_4 AND color_4 = color_3 AND color_3 = color_1 AND color_1 = -color " +
        "AND ((color_4 = -1 AND bt_3 < bb_4 " +
        "AND high_2 < high_3 AND low_2 < low_3 AND high_1 < high_2 AND low_1 < low_2 " +
        "AND close > open_3 AND close < close_4) " +
        "OR (color_4 = 1 AND bb_3 > bt_4 " +
        "AND high_2 > high_3 AND low_2 > low_3 AND high_1 > high_2 AND low_1 > low_2 " +
        "AND close < open_3 AND close > close_4))"), "color * 100"),
    ("CDLHARAMICROSS", Some(11), Some(
      "body_1 > thr_body_1 AND body <= thr_hl01 AND bt < bt_1 AND bb > bb_1"),
      "-color_1 * 100"),
    ("CDLTHRUSTING", Some(11), Some(
      "color_1 = -1 AND body_1 > thr_body_1 AND color = 1 AND open < low_1 " +
        "AND close > close_1 + thr_eq_1 AND close <= close_1 + body_1 * 0.5::DOUBLE"), "-100"),
    ("CDLUNIQUE3RIVER", Some(12), Some(
      "body_2 > thr_body_2 AND color_2 = -1 AND color_1 = -1 " +
        "AND close_1 > close_2 AND open_1 <= open_2 AND low_1 < low_2 " +
        "AND body < thr_body AND color = 1 AND open > low_1"), "100"),
    ("CDLHOMINGPIGEON", Some(11), Some(
      "color_1 = -1 AND color = -1 AND body_1 > thr_body_1 AND body <= thr_body " +
        "AND open < open_1 AND close > close_1"), "100"),
    ("CDLTASUKIGAP", Some(7), Some(
      "((bb_1 > bt_2 AND color_1 = 1 AND color = -1 " +
        "AND open < close_1 AND open > open_1 AND close < open_1 AND close > bt_2 " +
        "AND ABS(body_1 - body) < thr_near_1) " +
        "OR (bt_1 < bb_2 AND color_1 = -1 AND color = 1 " +
        "AND open < open_1 AND open > close_1 AND close > open_1 AND close < bb_2 " +
        "AND ABS(body_1 - body) < thr_near_1))"), "color_1 * 100"),
    // ---- three-candle (16)
    ("CDL3WHITESOLDIERS", Some(12), Some(
      "color_2 = 1 AND up_2 < thr_hl01_2 AND color_1 = 1 AND up_1 < thr_hl01_1 " +
        "AND color = 1 AND up < thr_hl01 " +
        "AND close > close_1 AND close_1 > close_2 " +
        "AND open_1 > open_2 AND open_1 <= close_2 + thr_near_2 " +
        "AND open > open_1 AND open <= close_1 + thr_near_1 " +
        "AND body_1 > body_2 - thr_far_2 AND body > body_1 - thr_far_1"), "100"),
    ("CDL3BLACKCROWS", Some(13), Some(
      "color_3 = 1 AND color_2 = -1 AND lo_2 < thr_hl01_2 " +
        "AND color_1 = -1 AND lo_1 < thr_hl01_1 AND color = -1 AND lo < thr_hl01 " +
        "AND open_1 < open_2 AND open_1 > close_2 AND open < open_1 AND open > close_1 " +
        "AND high_3 > close_2 AND close_2 > close_1 AND close_1 > close"), "-100"),
    ("CDL3INSIDE", Some(12), Some(
      "body_2 > thr_body_2 AND body_1 <= thr_body_1 " +
        "AND bt_1 < bt_2 AND bb_1 > bb_2 " +
        "AND ((color_2 = -1 AND color = 1 AND close > high_2) " +
        "OR (color_2 = 1 AND color = -1 AND close < low_2))"), "-color_2 * 100"),
    ("CDLEVENINGSTAR", Some(12), Some(
      "color_2 = 1 AND body_2 > thr_body_2 AND body_1 <= thr_body_1 AND bb_1 > bt_2 " +
        "AND color = -1 AND body > thr_body " +
        "AND close < close_2 - body_2 * 0.3::DOUBLE"), "-100"),
    ("CDLMORNINGSTAR", Some(12), Some(
      "color_2 = -1 AND body_2 > thr_body_2 AND body_1 <= thr_body_1 AND bt_1 < bb_2 " +
        "AND color = 1 AND body > thr_body " +
        "AND close > close_2 + body_2 * 0.3::DOUBLE"), "100"),
    ("CDLDOJISTAR", Some(11), Some(
      "body_1 > thr_body_1 AND body <= thr_hl01 " +
        "AND ((color_1 = 1 AND bb > bt_1) OR (color_1 = -1 AND bt < bb_1))"),
      "-color_1 * 100"),
    ("CDLABANDONEDBABY", Some(12), Some(
      "body_2 > thr_body_2 AND body_1 <= thr_hl01_1 AND body > thr_body " +
        "AND ((color_2 = 1 AND color = -1 AND close < close_2 - body_2 * 0.3::DOUBLE " +
        "AND low_1 > high_2 AND high < low_1) " +
        "OR (color_2 = -1 AND color = 1 AND close > close_2 + body_2 * 0.3::DOUBLE " +
        "AND high_1 < low_2 AND low > high_1))"), "color * 100"),
    ("CDLTRISTAR", Some(12), None,
      "CASE WHEN body <= thr_hl01_2 AND body_1 <= thr_hl01_2 AND body_2 <= thr_hl01_2 THEN " +
        "CASE WHEN bb_1 > bt_2 AND bt < bt_1 THEN -100 " +
        "WHEN bt_1 < bb_2 AND bb > bb_1 THEN 100 ELSE 0 END ELSE 0 END"),
    ("CDLADVANCEBLOCK", Some(12), Some(
      "color_2 = 1 AND color_1 = 1 AND color = 1 " +
        "AND close > close_1 AND close_1 > close_2 " +
        "AND open_1 > open_2 AND open_1 <= close_2 + thr_near_2 " +
        "AND open > open_1 AND open <= close_1 + thr_near_1 " +
        "AND body_2 > thr_body_2 AND up_2 < thr_sh_2 " +
        "AND ((body_1 < body_2 - thr_far_2 AND body < body_1 + thr_near_1) " +
        "OR (body < body_1 - thr_far_1) " +
        "OR (body < body_1 AND body_1 < body_2 AND (up > thr_sh OR up_1 > thr_sh_1)) " +
        "OR (body < body_1 AND up > body))"), "-100"),
    ("CDLSTICKSANDWICH", Some(7), Some(
      "color_2 = -1 AND color_1 = 1 AND color = -1 AND low_1 > close_2 " +
        "AND close <= close_2 + thr_eq_2 AND close >= close_2 - thr_eq_2"), "100"),
    ("CDL3STARSINSOUTH", Some(12), Some(
      "color_2 = -1 AND color_1 = -1 AND color = -1 " +
        "AND body_2 > thr_body_2 AND lo_2 > body_2 " +
        "AND body_1 < body_2 AND open_1 > close_2 AND open_1 <= high_2 " +
        "AND low_1 < close_2 AND low_1 >= low_2 AND lo_1 > thr_hl01_1 " +
        "AND body < thr_body AND lo < thr_hl01 AND up < thr_hl01 " +
        "AND low > low_1 AND high < high_1"), "100"),
    ("CDLMORNINGDOJISTAR", Some(12), Some(
      "color_2 = -1 AND body_2 > thr_body_2 AND body_1 <= thr_hl01_1 AND bt_1 < bb_2 " +
        "AND color = 1 AND body > thr_body " +
        "AND close > close_2 + body_2 * 0.3::DOUBLE"), "100"),
    ("CDLEVENINGDOJISTAR", Some(12), Some(
      "color_2 = 1 AND body_2 > thr_body_2 AND body_1 <= thr_hl01_1 AND bb_1 > bt_2 " +
        "AND color = -1 AND body > thr_body " +
        "AND close < close_2 - body_2 * 0.3::DOUBLE"), "-100"),
    ("CDL3LINESTRIKE", Some(8), Some(
      "color_3 = color_2 AND color_2 = color_1 AND color = -color_1 " +
        "AND open_2 >= bb_3 - thr_near_3 AND open_2 <= bt_3 + thr_near_3 " +
        "AND open_1 >= bb_2 - thr_near_2 AND open_1 <= bt_2 + thr_near_2 " +
        "AND ((color_1 = 1 AND close_1 > close_2 AND close_2 > close_3 " +
        "AND open > close_1 AND close < open_3) " +
        "OR (color_1 = -1 AND close_1 < close_2 AND close_2 < close_3 " +
        "AND open < close_1 AND close > open_3))"), "color_1 * 100"),
    ("CDL2CROWS", Some(12), Some(
      "color_2 = 1 AND body_2 > thr_body_2 AND color_1 = -1 AND bb_1 > bt_2 " +
        "AND color = -1 AND open < open_1 AND open > close_1 " +
        "AND close > open_2 AND close < close_2"), "-100"),
    ("CDLIDENTICAL3CROWS", Some(12), Some(
      "color_2 = -1 AND lo_2 < thr_hl01_2 AND color_1 = -1 AND lo_1 < thr_hl01_1 " +
        "AND color = -1 AND lo < thr_hl01 " +
        "AND close_2 > close_1 AND close_1 > close " +
        "AND open_1 <= close_2 + thr_eq_2 AND open_1 >= close_2 - thr_eq_2 " +
        "AND open <= close_1 + thr_eq_1 AND open >= close_1 - thr_eq_1"), "-100"),
    // ---- multi-candle (7)
    ("CDLRISEFALL3METHODS", Some(14), Some(
      "body_4 > thr_body_4 AND body_3 < thr_body_3 AND body_2 < thr_body_2 " +
        "AND body_1 < thr_body_1 AND body > thr_body " +
        "AND color_4 = -color_3 AND color_3 = color_2 AND color_2 = color_1 " +
        "AND color_1 = -color " +
        "AND bb_3 < high_4 AND bt_3 > low_4 AND bb_2 < high_4 AND bt_2 > low_4 " +
        "AND bb_1 < high_4 AND bt_1 > low_4 " +
        "AND close_2 * color_4 < close_3 * color_4 " +
        "AND close_1 * color_4 < close_2 * color_4 " +
        "AND open * color_4 > close_1 * color_4 " +
        "AND close * color_4 > close_4 * color_4"), "color_4 * 100"),
    ("CDLXSIDEGAP3METHODS", Some(2), Some(
      "color_2 = color_1 AND color_1 = -color " +
        "AND open < bt_1 AND open > bb_1 AND close < bt_2 AND close > bb_2 " +
        "AND ((color_2 = 1 AND bb_1 > bt_2) OR (color_2 = -1 AND bt_1 < bb_2))"),
      "color_2 * 100"),
    ("CDLUPSIDEGAP2CROWS", Some(12), Some(
      "color_2 = 1 AND body_2 > thr_body_2 AND color_1 = -1 AND body_1 < thr_body_1 " +
        "AND bb_1 > bt_2 AND color = -1 " +
        "AND open > open_1 AND close < close_1 AND close > close_2"), "-100"),
    ("CDLLADDERBOTTOM", Some(14), Some(
      "color_4 = -1 AND color_3 = -1 AND color_2 = -1 " +
        "AND open_4 > open_3 AND open_3 > open_2 " +
        "AND close_4 > close_3 AND close_3 > close_2 " +
        "AND color_1 = -1 AND up_1 > thr_hl01_1 " +
        "AND color = 1 AND open > open_1 AND close > high_1"), "100"),
    ("CDLCONCEALBABYSWALL", Some(13), Some(
      "color_3 = -1 AND color_2 = -1 AND color_1 = -1 AND color = -1 " +
        "AND lo_3 < thr_hl01_3 AND up_3 < thr_hl01_3 " +
        "AND lo_2 < thr_hl01_2 AND up_2 < thr_hl01_2 " +
        "AND bt_1 < bb_2 AND up_1 > thr_hl01_1 AND high_1 > close_2 " +
        "AND high > high_1 AND low < low_1"), "100"),
    ("CDLHIKKAKEMOD", None, None, hikkakeMod),
    ("CDLMATHOLD", Some(14), Some(
      "body_4 > thr_body_4 AND body_3 < thr_body_3 AND body_2 < thr_body_2 " +
        "AND body_1 < thr_body_1 AND color_4 = 1 AND color_3 = -1 AND color = 1 " +
        "AND bb_3 > bt_4 " +
        "AND bb_2 < close_4 AND bb_1 < close_4 " +
        "AND bb_2 > close_4 - body_4 * 0.5::DOUBLE " +
        "AND bb_1 > close_4 - body_4 * 0.5::DOUBLE " +
        "AND bt_2 < open_3 AND bt_1 < bt_2 " +
        "AND open > close_1 AND close > GREATEST(high_3, high_2, high_1)"), "100")
  )

  private val patternCols = patterns.map {
    case (name, None, None, value) => s"$value AS $name"
    case (name, Some(gate), None, value) =>
      s"CASE WHEN rn > $gate THEN ($value) ELSE 0 END AS $name"
    case (name, Some(gate), Some(cond), value) =>
      s"CASE WHEN rn > $gate AND $cond THEN $value ELSE 0 END AS $name"
    case other => throw new IllegalStateException(other.toString)
  }.mkString(",\n    ")

  private val sumExpr = "CAST(" + patterns.map(_._1).mkString(" + ") +
    " AS BIGINT) AS candle_pattern_sum"

  val sql: String = sqlFrom(QueriesDomain.withCandles)

  /** Same oracle over a caller-supplied preamble (must end in a `candles`
    * CTE): the pipeline-full row feeds the validated+deduped variant.
    */
  def sqlFrom(preamble: String): String =
    s"""$preamble,
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
       |    ${chain("(high - GREATEST(close, open)) + (LEAST(close, open) - low)", 10)} AS sum_sh_10,
       |    ${chain("high - low", 5)} AS sum_hl_5
       |  FROM candles
       |  WINDOW w AS (PARTITION BY symbol ORDER BY tstamp)),
       |t AS (
       |  SELECT *,
       |    (sum_body_10 / 10.0) AS thr_body,
       |    0.1::DOUBLE * (sum_hl_10 / 10.0) AS thr_hl01,
       |    (sum_sh_10 / 10.0) / 2.0 AS thr_sh,
       |    0.2::DOUBLE * (sum_hl_5 / 5.0) AS thr_near,
       |    0.6::DOUBLE * (sum_hl_5 / 5.0) AS thr_far,
       |    0.05::DOUBLE * (sum_hl_5 / 5.0) AS thr_eq
       |  FROM g),
       |x AS (
       |  SELECT *,
       |    $lagDefs
       |  FROM t WINDOW w AS (PARTITION BY symbol ORDER BY tstamp)),
       |hk AS (
       |  SELECT *,
       |    (rn > 7 AND high_2 < high_3 AND low_2 > low_3
       |     AND high_1 < high_2 AND low_1 > low_2
       |     AND ((high < high_1 AND low < low_1 AND close_2 <= low_2 + thr_near_2)
       |       OR (high > high_1 AND low > low_1 AND close_2 >= high_2 - thr_near_2))) AS hk_d,
       |    CASE WHEN high < high_1 THEN 100 ELSE -100 END AS hk_r,
       |    high_1 AS hk_ch, low_1 AS hk_cl
       |  FROM x),
       |hk2 AS (
       |  SELECT *,
       |    COALESCE(lag(hk_d, 1) OVER w, FALSE) AS hk_d_1,
       |    COALESCE(lag(hk_d, 2) OVER w, FALSE) AS hk_d_2,
       |    COALESCE(lag(hk_d, 3) OVER w, FALSE) AS hk_d_3,
       |    lag(hk_r, 1) OVER w AS hk_r_1, lag(hk_r, 2) OVER w AS hk_r_2,
       |    lag(hk_r, 3) OVER w AS hk_r_3,
       |    lag(hk_ch, 1) OVER w AS hk_ch_1, lag(hk_ch, 2) OVER w AS hk_ch_2,
       |    lag(hk_ch, 3) OVER w AS hk_ch_3,
       |    lag(hk_cl, 1) OVER w AS hk_cl_1, lag(hk_cl, 2) OVER w AS hk_cl_2,
       |    lag(hk_cl, 3) OVER w AS hk_cl_3
       |  FROM hk WINDOW w AS (PARTITION BY symbol ORDER BY tstamp)),
       |pats AS (
       |  SELECT symbol, strftime(tstamp, '${QueriesDomain.fmt}') AS ts,
       |    $patternCols
       |  FROM hk2)
       |SELECT *, $sumExpr FROM pats""".stripMargin
}
