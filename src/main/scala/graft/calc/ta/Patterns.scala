package graft.calc.ta

/** Candlestick-pattern kernels — the reference's full 59-column CDL* surface
  * (candle_to_calcs.py:454-507) with TA-Lib's candle-setting machinery:
  * every geometric threshold ("long body", "very short shadow", "near",
  * "equal") is a factor times a trailing average of a range type, using
  * TA-Lib's published default settings. Averages for a candle are taken over
  * the `period` candles strictly BEFORE it, and a pattern emits 0 until its
  * TA-Lib lookback index — reproducing the leading-NaN → fillna(0) shape of
  * the reference.
  *
  * Outputs are −100/0/+100 (±200 for CDLHIKKAKEMOD's confirmation bars, as
  * TA-Lib emits). Column order follows the reference's four group lists
  * exactly — single (17, candle_to_calcs.py:458-462), two-candle (19,
  * :473-477), three-candle (16, :487-492), multi-candle (7, :502-503) — so
  * a frame produced here has the same CDL column sequence as the reference
  * output schema. `names` is the contract — candle_pattern_sum (G7) sums
  * exactly this set.
  *
  * All pattern logic is re-derived from the published TA-Lib C sources
  * (ta_CDL*.c); the two parameterized patterns use TA-Lib's defaults
  * (CDLABANDONEDBABY penetration 0.3, CDLMATHOLD penetration 0.5).
  */
object Patterns {

  // range types
  private final val RealBody = 0
  private final val HighLow = 1
  private final val Shadows = 2

  /** TA-Lib default candle settings: (rangeType, avgPeriod, factor). */
  private final case class Setting(rangeType: Int, period: Int, factor: Double)
  private val BodyLong = Setting(RealBody, 10, 1.0)
  private val BodyVeryLong = Setting(RealBody, 10, 3.0)
  private val BodyShort = Setting(RealBody, 10, 1.0)
  private val BodyDoji = Setting(HighLow, 10, 0.1)
  private val ShadowLong = Setting(RealBody, 0, 1.0)
  private val ShadowVeryLong = Setting(RealBody, 0, 2.0)
  private val ShadowShort = Setting(Shadows, 10, 1.0)
  private val ShadowVeryShort = Setting(HighLow, 10, 0.1)
  private val Near = Setting(HighLow, 5, 0.2)
  private val Far = Setting(HighLow, 5, 0.6)
  private val Equal = Setting(HighLow, 5, 0.05)

  /** One pattern: output for the CURRENT candle given the state window. */
  private final case class Pattern(name: String, lookback: Int, eval: State => Int)

  /** Ring of recent candles; offset 0 = current, 1 = previous, ... */
  final class State {
    private val cap = 16
    private val o = new Array[Double](cap)
    private val h = new Array[Double](cap)
    private val l = new Array[Double](cap)
    private val c = new Array[Double](cap)
    private var n = 0
    private var pos = 0

    def push(open: Double, high: Double, low: Double, close: Double): Unit = {
      o(pos) = open; h(pos) = high; l(pos) = low; c(pos) = close
      pos = (pos + 1) % cap
      if (n < cap) n += 1
    }
    /** 0-based index of the current candle in the series. */
    def idx: Int = total - 1
    private var total0 = 0
    private[Patterns] def bump(): Unit = total0 += 1
    def total: Int = total0

    private def at(j: Int) = (pos - 1 - j + 2 * cap) % cap
    def open(j: Int): Double = o(at(j))
    def high(j: Int): Double = h(at(j))
    def low(j: Int): Double = l(at(j))
    def close(j: Int): Double = c(at(j))

    def body(j: Int): Double = math.abs(close(j) - open(j))
    def upper(j: Int): Double = high(j) - math.max(close(j), open(j))
    def lower(j: Int): Double = math.min(close(j), open(j)) - low(j)
    def hl(j: Int): Double = high(j) - low(j)
    /** +1 white (close >= open), −1 black. */
    def color(j: Int): Int = if (close(j) >= open(j)) 1 else -1
    def bodyTop(j: Int): Double = math.max(close(j), open(j))
    def bodyBot(j: Int): Double = math.min(close(j), open(j))
    /** real-body gap between candle j1 (later) and j2 (earlier) */
    def gapUp(j1: Int, j2: Int): Boolean = bodyBot(j1) > bodyTop(j2)
    def gapDown(j1: Int, j2: Int): Boolean = bodyTop(j1) < bodyBot(j2)

    private def range(t: Int, j: Int): Double = t match {
      case RealBody => body(j)
      case HighLow => hl(j)
      case Shadows => upper(j) + lower(j)
    }

    /** TA_CANDLEAVERAGE: threshold for the candle at offset `at`, averaging
      * the `period` candles strictly before it (or that candle's own range
      * when period == 0). Shadows averages halve (two shadows per candle).
      */
    private[Patterns] def avg(s: Setting, at: Int): Double = {
      val base =
        if (s.period == 0) range(s.rangeType, at)
        else {
          var sum = 0.0
          var j = at + 1
          while (j <= at + s.period) { sum += range(s.rangeType, j); j += 1 }
          sum / s.period
        }
      s.factor * base / (if (s.rangeType == Shadows) 2.0 else 1.0)
    }
  }

  private def p(name: String, lookback: Int)(f: State => Int) = Pattern(name, lookback, f)

  /** Builds a fresh pattern vector. A def, not a val: CDLHIKKAKEMOD carries
    * cross-row confirmation state in its closure, so each [[Evaluator]] needs
    * its own instances. Order = the reference's four group lists.
    */
  private def mkPatterns(): Vector[Pattern] = Vector(
    // ------------------------------------------------ single-candle (17)
    p("CDLDOJI", 10) { s =>
      if (s.body(0) <= s.avg(BodyDoji, 0)) 100 else 0
    },
    p("CDLHAMMER", 11) { s =>
      if (s.body(0) < s.avg(BodyShort, 0) &&
        s.lower(0) > s.avg(ShadowLong, 0) &&
        s.upper(0) < s.avg(ShadowVeryShort, 0) &&
        s.bodyBot(0) <= s.low(1) + s.avg(Near, 1)) 100 else 0
    },
    p("CDLINVERTEDHAMMER", 11) { s =>
      if (s.body(0) < s.avg(BodyShort, 0) &&
        s.upper(0) > s.avg(ShadowLong, 0) &&
        s.lower(0) < s.avg(ShadowVeryShort, 0) &&
        s.gapDown(0, 1)) 100 else 0
    },
    p("CDLHANGINGMAN", 11) { s =>
      if (s.body(0) < s.avg(BodyShort, 0) &&
        s.lower(0) > s.avg(ShadowLong, 0) &&
        s.upper(0) < s.avg(ShadowVeryShort, 0) &&
        s.bodyBot(0) >= s.high(1) - s.avg(Near, 1)) -100 else 0
    },
    p("CDLSHOOTINGSTAR", 11) { s =>
      if (s.body(0) < s.avg(BodyShort, 0) &&
        s.upper(0) > s.avg(ShadowLong, 0) &&
        s.lower(0) < s.avg(ShadowVeryShort, 0) &&
        s.gapUp(0, 1)) -100 else 0
    },
    p("CDLMARUBOZU", 10) { s =>
      if (s.body(0) > s.avg(BodyLong, 0) &&
        s.upper(0) < s.avg(ShadowVeryShort, 0) &&
        s.lower(0) < s.avg(ShadowVeryShort, 0)) s.color(0) * 100 else 0
    },
    p("CDLLONGLEGGEDDOJI", 10) { s =>
      if (s.body(0) <= s.avg(BodyDoji, 0) &&
        (s.lower(0) > s.avg(ShadowLong, 0) || s.upper(0) > s.avg(ShadowLong, 0))) 100 else 0
    },
    p("CDLDRAGONFLYDOJI", 10) { s =>
      if (s.body(0) <= s.avg(BodyDoji, 0) &&
        s.upper(0) < s.avg(ShadowVeryShort, 0) &&
        s.lower(0) > s.avg(ShadowVeryShort, 0)) 100 else 0
    },
    p("CDLGRAVESTONEDOJI", 10) { s =>
      if (s.body(0) <= s.avg(BodyDoji, 0) &&
        s.lower(0) < s.avg(ShadowVeryShort, 0) &&
        s.upper(0) > s.avg(ShadowVeryShort, 0)) 100 else 0
    },
    p("CDLTAKURI", 10) { s =>
      if (s.body(0) <= s.avg(BodyDoji, 0) &&
        s.upper(0) < s.avg(ShadowVeryShort, 0) &&
        s.lower(0) > s.avg(ShadowVeryLong, 0)) 100 else 0
    },
    p("CDLHIGHWAVE", 10) { s =>
      if (s.body(0) < s.avg(BodyShort, 0) &&
        s.upper(0) > s.avg(ShadowVeryLong, 0) &&
        s.lower(0) > s.avg(ShadowVeryLong, 0)) s.color(0) * 100 else 0
    },
    p("CDLSPINNINGTOP", 10) { s =>
      if (s.body(0) < s.avg(BodyShort, 0) &&
        s.upper(0) > s.body(0) &&
        s.lower(0) > s.body(0)) s.color(0) * 100 else 0
    },
    p("CDLCLOSINGMARUBOZU", 10) { s =>
      if (s.body(0) > s.avg(BodyLong, 0) &&
        ((s.color(0) == 1 && s.upper(0) < s.avg(ShadowVeryShort, 0)) ||
          (s.color(0) == -1 && s.lower(0) < s.avg(ShadowVeryShort, 0))))
        s.color(0) * 100 else 0
    },
    p("CDLBELTHOLD", 10) { s =>
      if (s.body(0) > s.avg(BodyLong, 0) &&
        ((s.color(0) == 1 && s.lower(0) < s.avg(ShadowVeryShort, 0)) ||
          (s.color(0) == -1 && s.upper(0) < s.avg(ShadowVeryShort, 0))))
        s.color(0) * 100 else 0
    },
    p("CDLRICKSHAWMAN", 10) { s =>
      if (s.body(0) <= s.avg(BodyDoji, 0) &&
        s.lower(0) > s.avg(ShadowLong, 0) &&
        s.upper(0) > s.avg(ShadowLong, 0) && {
          val mid = s.low(0) + s.hl(0) / 2
          s.bodyBot(0) <= mid + s.avg(Near, 0) && s.bodyTop(0) >= mid - s.avg(Near, 0)
        }) 100 else 0
    },
    p("CDLSHORTLINE", 10) { s =>
      if (s.body(0) < s.avg(BodyShort, 0) &&
        s.upper(0) < s.avg(ShadowShort, 0) &&
        s.lower(0) < s.avg(ShadowShort, 0)) s.color(0) * 100 else 0
    },
    p("CDLLONGLINE", 10) { s =>
      if (s.body(0) > s.avg(BodyLong, 0) &&
        s.upper(0) < s.avg(ShadowShort, 0) &&
        s.lower(0) < s.avg(ShadowShort, 0)) s.color(0) * 100 else 0
    },
    // ------------------------------------------------- two-candle (19)
    p("CDLHARAMI", 11) { s =>
      if (s.body(1) > s.avg(BodyLong, 1) &&
        s.body(0) <= s.avg(BodyShort, 0) &&
        s.bodyTop(0) < s.bodyTop(1) &&
        s.bodyBot(0) > s.bodyBot(1)) -s.color(1) * 100 else 0
    },
    p("CDLENGULFING", 2) { s =>
      if (s.color(0) == 1 && s.color(1) == -1 &&
        s.close(0) >= s.open(1) && s.open(0) <= s.close(1) &&
        (s.close(0) > s.open(1) || s.open(0) < s.close(1))) 100
      else if (s.color(0) == -1 && s.color(1) == 1 &&
        s.open(0) >= s.close(1) && s.close(0) <= s.open(1) &&
        (s.open(0) > s.close(1) || s.close(0) < s.open(1))) -100
      else 0
    },
    p("CDLPIERCING", 11) { s =>
      if (s.color(1) == -1 && s.body(1) > s.avg(BodyLong, 1) &&
        s.color(0) == 1 && s.body(0) > s.avg(BodyLong, 0) &&
        s.open(0) < s.low(1) &&
        s.close(0) < s.open(1) &&
        s.close(0) > s.close(1) + s.body(1) * 0.5) 100 else 0
    },
    p("CDLDARKCLOUDCOVER", 11) { s =>
      if (s.color(1) == 1 && s.body(1) > s.avg(BodyLong, 1) &&
        s.color(0) == -1 &&
        s.open(0) > s.high(1) &&
        s.close(0) > s.open(1) &&
        s.close(0) < s.close(1) - s.body(1) * 0.5) -100 else 0
    },
    p("CDLKICKING", 11) { s =>
      def marubozu(j: Int) = s.body(j) > s.avg(BodyLong, j) &&
        s.upper(j) < s.avg(ShadowVeryShort, j) && s.lower(j) < s.avg(ShadowVeryShort, j)
      if (s.color(0) == -s.color(1) && marubozu(0) && marubozu(1) &&
        ((s.color(0) == 1 && s.gapUp(0, 1)) || (s.color(0) == -1 && s.gapDown(0, 1))))
        s.color(0) * 100 else 0
    },
    p("CDLKICKINGBYLENGTH", 11) { s =>
      def marubozu(j: Int) = s.body(j) > s.avg(BodyLong, j) &&
        s.upper(j) < s.avg(ShadowVeryShort, j) && s.lower(j) < s.avg(ShadowVeryShort, j)
      if (s.color(0) == -s.color(1) && marubozu(0) && marubozu(1) &&
        ((s.color(0) == 1 && s.gapUp(0, 1)) || (s.color(0) == -1 && s.gapDown(0, 1))))
        s.color(if (s.body(0) > s.body(1)) 0 else 1) * 100 else 0
    },
    p("CDLCOUNTERATTACK", 11) { s =>
      // opposite-color long candles closing at the same level (ta_CDLCOUNTERATTACK.c)
      if (s.color(1) == -s.color(0) &&
        s.body(1) > s.avg(BodyLong, 1) &&
        s.body(0) > s.avg(BodyLong, 0) &&
        s.close(0) <= s.close(1) + s.avg(Equal, 1) &&
        s.close(0) >= s.close(1) - s.avg(Equal, 1)) s.color(0) * 100 else 0
    },
    p("CDLGAPSIDESIDEWHITE", 7) { s =>
      // two same-direction-gapping white candles of near-equal body opening
      // at the same level (ta_CDLGAPSIDESIDEWHITE.c); sign = gap direction
      if (((s.gapUp(1, 2) && s.gapUp(0, 2)) || (s.gapDown(1, 2) && s.gapDown(0, 2))) &&
        s.color(1) == 1 && s.color(0) == 1 &&
        s.body(0) >= s.body(1) - s.avg(Near, 1) &&
        s.body(0) <= s.body(1) + s.avg(Near, 1) &&
        s.open(0) >= s.open(1) - s.avg(Equal, 1) &&
        s.open(0) <= s.open(1) + s.avg(Equal, 1))
        (if (s.gapUp(1, 2)) 100 else -100) else 0
    },
    p("CDLSEPARATINGLINES", 11) { s =>
      if (s.color(1) == -s.color(0) &&
        math.abs(s.open(0) - s.open(1)) <= s.avg(Equal, 1) &&
        s.body(0) > s.avg(BodyLong, 0) &&
        ((s.color(0) == 1 && s.lower(0) < s.avg(ShadowVeryShort, 0)) ||
          (s.color(0) == -1 && s.upper(0) < s.avg(ShadowVeryShort, 0))))
        s.color(0) * 100 else 0
    },
    p("CDLONNECK", 11) { s =>
      // long black, then white opening lower and closing AT the prior low
      // (ta_CDLONNECK.c)
      if (s.color(1) == -1 && s.body(1) > s.avg(BodyLong, 1) &&
        s.color(0) == 1 && s.open(0) < s.low(1) &&
        s.close(0) <= s.low(1) + s.avg(Equal, 1) &&
        s.close(0) >= s.low(1) - s.avg(Equal, 1)) -100 else 0
    },
    p("CDLINNECK", 11) { s =>
      // like on-neck but closing slightly INTO the prior body (ta_CDLINNECK.c)
      if (s.color(1) == -1 && s.body(1) > s.avg(BodyLong, 1) &&
        s.color(0) == 1 && s.open(0) < s.low(1) &&
        s.close(0) <= s.close(1) + s.avg(Equal, 1) &&
        s.close(0) >= s.close(1)) -100 else 0
    },
    p("CDLSTALLEDPATTERN", 12) { s =>
      // three rising whites, 3rd small and riding the 2nd's shoulder
      // (ta_CDLSTALLEDPATTERN.c)
      if (s.color(2) == 1 && s.color(1) == 1 && s.color(0) == 1 &&
        s.close(0) > s.close(1) && s.close(1) > s.close(2) &&
        s.body(2) > s.avg(BodyLong, 2) &&
        s.body(1) > s.avg(BodyLong, 1) &&
        s.upper(1) < s.avg(ShadowVeryShort, 1) &&
        s.open(1) > s.open(2) &&
        s.open(1) <= s.close(2) + s.avg(Near, 2) &&
        s.body(0) < s.avg(BodyShort, 0) &&
        s.open(0) >= s.close(1) - s.body(0) - s.avg(Near, 1)) -100 else 0
    },
    p("CDLMATCHINGLOW", 6) { s =>
      if (s.color(1) == -1 && s.color(0) == -1 &&
        s.close(0) <= s.close(1) + s.avg(Equal, 1) &&
        s.close(0) >= s.close(1) - s.avg(Equal, 1)) 100 else 0
    },
    p("CDLBREAKAWAY", 14) { s =>
      // 5-candle: long 1st, same-color gapping 2nd, drifting 3rd/4th,
      // opposite 5th closing inside the gap (ta_CDLBREAKAWAY.c)
      if (s.body(4) > s.avg(BodyLong, 4) &&
        s.color(4) == s.color(3) && s.color(3) == s.color(1) && s.color(1) == -s.color(0) &&
        ((s.color(4) == -1 && s.gapDown(3, 4) &&
          s.high(2) < s.high(3) && s.low(2) < s.low(3) &&
          s.high(1) < s.high(2) && s.low(1) < s.low(2) &&
          s.close(0) > s.open(3) && s.close(0) < s.close(4)) ||
          (s.color(4) == 1 && s.gapUp(3, 4) &&
            s.high(2) > s.high(3) && s.low(2) > s.low(3) &&
            s.high(1) > s.high(2) && s.low(1) > s.low(2) &&
            s.close(0) < s.open(3) && s.close(0) > s.close(4))))
        s.color(0) * 100 else 0
    },
    p("CDLHARAMICROSS", 11) { s =>
      if (s.body(1) > s.avg(BodyLong, 1) &&
        s.body(0) <= s.avg(BodyDoji, 0) &&
        s.bodyTop(0) < s.bodyTop(1) &&
        s.bodyBot(0) > s.bodyBot(1)) -s.color(1) * 100 else 0
    },
    p("CDLTHRUSTING", 11) { s =>
      // white reclaims under half of a long black body from below
      // (ta_CDLTHRUSTING.c)
      if (s.color(1) == -1 && s.body(1) > s.avg(BodyLong, 1) &&
        s.color(0) == 1 && s.open(0) < s.low(1) &&
        s.close(0) > s.close(1) + s.avg(Equal, 1) &&
        s.close(0) <= s.close(1) + s.body(1) * 0.5) -100 else 0
    },
    p("CDLUNIQUE3RIVER", 12) { s =>
      // long black, black harami with lower low, small white opening above
      // that low (ta_CDLUNIQUE3RIVER.c)
      if (s.body(2) > s.avg(BodyLong, 2) && s.color(2) == -1 &&
        s.color(1) == -1 && s.close(1) > s.close(2) && s.open(1) <= s.open(2) &&
        s.low(1) < s.low(2) &&
        s.body(0) < s.avg(BodyShort, 0) && s.color(0) == 1 &&
        s.open(0) > s.low(1)) 100 else 0
    },
    p("CDLHOMINGPIGEON", 11) { s =>
      if (s.color(1) == -1 && s.color(0) == -1 &&
        s.body(1) > s.avg(BodyLong, 1) &&
        s.body(0) <= s.avg(BodyShort, 0) &&
        s.open(0) < s.open(1) &&
        s.close(0) > s.close(1)) 100 else 0
    },
    p("CDLTASUKIGAP", 7) { s =>
      // gap, continuation candle, then an opposite candle closing within the
      // still-open gap, bodies near-equal (ta_CDLTASUKIGAP.c)
      if ((s.gapUp(1, 2) && s.color(1) == 1 && s.color(0) == -1 &&
        s.open(0) < s.close(1) && s.open(0) > s.open(1) &&
        s.close(0) < s.open(1) && s.close(0) > s.bodyTop(2) &&
        math.abs(s.body(1) - s.body(0)) < s.avg(Near, 1)) ||
        (s.gapDown(1, 2) && s.color(1) == -1 && s.color(0) == 1 &&
          s.open(0) < s.open(1) && s.open(0) > s.close(1) &&
          s.close(0) > s.open(1) && s.close(0) < s.bodyBot(2) &&
          math.abs(s.body(1) - s.body(0)) < s.avg(Near, 1)))
        s.color(1) * 100 else 0
    },
    // ------------------------------------------------- three-candle (16)
    p("CDL3WHITESOLDIERS", 12) { s =>
      // three rising whites with very short upper shadows, each opening
      // within the prior body, not progressively far shorter
      // (ta_CDL3WHITESOLDIERS.c)
      if (s.color(2) == 1 && s.upper(2) < s.avg(ShadowVeryShort, 2) &&
        s.color(1) == 1 && s.upper(1) < s.avg(ShadowVeryShort, 1) &&
        s.color(0) == 1 && s.upper(0) < s.avg(ShadowVeryShort, 0) &&
        s.close(0) > s.close(1) && s.close(1) > s.close(2) &&
        s.open(1) > s.open(2) && s.open(1) <= s.close(2) + s.avg(Near, 2) &&
        s.open(0) > s.open(1) && s.open(0) <= s.close(1) + s.avg(Near, 1) &&
        s.body(1) > s.body(2) - s.avg(Far, 2) &&
        s.body(0) > s.body(1) - s.avg(Far, 1)) 100 else 0
    },
    p("CDL3BLACKCROWS", 13) { s =>
      // three declining blacks with no lower shadow, each opening within the
      // prior body, after a white candle (ta_CDL3BLACKCROWS.c)
      if (s.color(3) == 1 &&
        s.color(2) == -1 && s.lower(2) < s.avg(ShadowVeryShort, 2) &&
        s.color(1) == -1 && s.lower(1) < s.avg(ShadowVeryShort, 1) &&
        s.color(0) == -1 && s.lower(0) < s.avg(ShadowVeryShort, 0) &&
        s.open(1) < s.open(2) && s.open(1) > s.close(2) &&
        s.open(0) < s.open(1) && s.open(0) > s.close(1) &&
        s.high(3) > s.close(2) &&
        s.close(2) > s.close(1) && s.close(1) > s.close(0)) -100 else 0
    },
    p("CDL3INSIDE", 12) { s =>
      // harami at (2,1) confirmed by a third close beyond the first body
      if (s.body(2) > s.avg(BodyLong, 2) &&
        s.body(1) <= s.avg(BodyShort, 1) &&
        s.bodyTop(1) < s.bodyTop(2) && s.bodyBot(1) > s.bodyBot(2) &&
        ((s.color(2) == -1 && s.color(0) == 1 && s.close(0) > s.high(2)) ||
          (s.color(2) == 1 && s.color(0) == -1 && s.close(0) < s.low(2))))
        -s.color(2) * 100 else 0
    },
    p("CDLEVENINGSTAR", 12) { s =>
      if (s.color(2) == 1 && s.body(2) > s.avg(BodyLong, 2) &&
        s.body(1) <= s.avg(BodyShort, 1) && s.gapUp(1, 2) &&
        s.color(0) == -1 && s.body(0) > s.avg(BodyShort, 0) &&
        s.close(0) < s.close(2) - s.body(2) * 0.3) -100 else 0
    },
    p("CDLMORNINGSTAR", 12) { s =>
      if (s.color(2) == -1 && s.body(2) > s.avg(BodyLong, 2) &&
        s.body(1) <= s.avg(BodyShort, 1) && s.gapDown(1, 2) &&
        s.color(0) == 1 && s.body(0) > s.avg(BodyShort, 0) &&
        s.close(0) > s.close(2) + s.body(2) * 0.3) 100 else 0
    },
    p("CDLDOJISTAR", 11) { s =>
      if (s.body(1) > s.avg(BodyLong, 1) &&
        s.body(0) <= s.avg(BodyDoji, 0) &&
        ((s.color(1) == 1 && s.gapUp(0, 1)) || (s.color(1) == -1 && s.gapDown(0, 1))))
        -s.color(1) * 100 else 0
    },
    p("CDLABANDONEDBABY", 12) { s =>
      // long 1st, doji star SHADOW-gapped away from both neighbors, 3rd
      // penetrating ≥30% into the 1st body (ta_CDLABANDONEDBABY.c, 0.3)
      if (s.body(2) > s.avg(BodyLong, 2) &&
        s.body(1) <= s.avg(BodyDoji, 1) &&
        s.body(0) > s.avg(BodyShort, 0) &&
        ((s.color(2) == 1 && s.color(0) == -1 &&
          s.close(0) < s.close(2) - s.body(2) * 0.3 &&
          s.low(1) > s.high(2) && s.high(0) < s.low(1)) ||
          (s.color(2) == -1 && s.color(0) == 1 &&
            s.close(0) > s.close(2) + s.body(2) * 0.3 &&
            s.high(1) < s.low(2) && s.low(0) > s.high(1))))
        s.color(0) * 100 else 0
    },
    p("CDLTRISTAR", 12) { s =>
      def doji(j: Int) = s.body(j) <= s.avg(BodyDoji, 2)
      if (doji(2) && doji(1) && doji(0)) {
        if (s.gapUp(1, 2) && s.bodyTop(0) < s.bodyTop(1)) -100
        else if (s.gapDown(1, 2) && s.bodyBot(0) > s.bodyBot(1)) 100
        else 0
      } else 0
    },
    p("CDLADVANCEBLOCK", 12) { s =>
      // three rising whites showing weakness: shrinking bodies / growing
      // upper shadows (ta_CDLADVANCEBLOCK.c)
      if (s.color(2) == 1 && s.color(1) == 1 && s.color(0) == 1 &&
        s.close(0) > s.close(1) && s.close(1) > s.close(2) &&
        s.open(1) > s.open(2) && s.open(1) <= s.close(2) + s.avg(Near, 2) &&
        s.open(0) > s.open(1) && s.open(0) <= s.close(1) + s.avg(Near, 1) &&
        s.body(2) > s.avg(BodyLong, 2) && s.upper(2) < s.avg(ShadowShort, 2) &&
        ((s.body(1) < s.body(2) - s.avg(Far, 2) && s.body(0) < s.body(1) + s.avg(Near, 1)) ||
          (s.body(0) < s.body(1) - s.avg(Far, 1)) ||
          (s.body(0) < s.body(1) && s.body(1) < s.body(2) &&
            (s.upper(0) > s.avg(ShadowShort, 0) || s.upper(1) > s.avg(ShadowShort, 1))) ||
          (s.body(0) < s.body(1) && s.upper(0) > s.avg(ShadowLong, 0))))
        -100 else 0
    },
    p("CDLSTICKSANDWICH", 7) { s =>
      if (s.color(2) == -1 && s.color(1) == 1 && s.color(0) == -1 &&
        s.low(1) > s.close(2) &&
        s.close(0) <= s.close(2) + s.avg(Equal, 2) &&
        s.close(0) >= s.close(2) - s.avg(Equal, 2)) 100 else 0
    },
    p("CDL3STARSINSOUTH", 12) { s =>
      // long black with long lower shadow, smaller black inside its range
      // with a real lower shadow, tiny black marubozu inside that
      // (ta_CDL3STARSINSOUTH.c)
      if (s.color(2) == -1 && s.color(1) == -1 && s.color(0) == -1 &&
        s.body(2) > s.avg(BodyLong, 2) && s.lower(2) > s.avg(ShadowLong, 2) &&
        s.body(1) < s.body(2) &&
        s.open(1) > s.close(2) && s.open(1) <= s.high(2) &&
        s.low(1) < s.close(2) && s.low(1) >= s.low(2) &&
        s.lower(1) > s.avg(ShadowVeryShort, 1) &&
        s.body(0) < s.avg(BodyShort, 0) &&
        s.lower(0) < s.avg(ShadowVeryShort, 0) &&
        s.upper(0) < s.avg(ShadowVeryShort, 0) &&
        s.low(0) > s.low(1) && s.high(0) < s.high(1)) 100 else 0
    },
    p("CDLMORNINGDOJISTAR", 12) { s =>
      if (s.color(2) == -1 && s.body(2) > s.avg(BodyLong, 2) &&
        s.body(1) <= s.avg(BodyDoji, 1) && s.gapDown(1, 2) &&
        s.color(0) == 1 && s.body(0) > s.avg(BodyShort, 0) &&
        s.close(0) > s.close(2) + s.body(2) * 0.3) 100 else 0
    },
    p("CDLEVENINGDOJISTAR", 12) { s =>
      if (s.color(2) == 1 && s.body(2) > s.avg(BodyLong, 2) &&
        s.body(1) <= s.avg(BodyDoji, 1) && s.gapUp(1, 2) &&
        s.color(0) == -1 && s.body(0) > s.avg(BodyShort, 0) &&
        s.close(0) < s.close(2) - s.body(2) * 0.3) -100 else 0
    },
    p("CDL3LINESTRIKE", 8) { s =>
      // three same-color candles opening near the prior body, struck by an
      // opposite candle engulfing all three closes (ta_CDL3LINESTRIKE.c)
      if (s.color(3) == s.color(2) && s.color(2) == s.color(1) && s.color(0) == -s.color(1) &&
        s.open(2) >= s.bodyBot(3) - s.avg(Near, 3) && s.open(2) <= s.bodyTop(3) + s.avg(Near, 3) &&
        s.open(1) >= s.bodyBot(2) - s.avg(Near, 2) && s.open(1) <= s.bodyTop(2) + s.avg(Near, 2) &&
        ((s.color(1) == 1 &&
          s.close(1) > s.close(2) && s.close(2) > s.close(3) &&
          s.open(0) > s.close(1) && s.close(0) < s.open(3)) ||
          (s.color(1) == -1 &&
            s.close(1) < s.close(2) && s.close(2) < s.close(3) &&
            s.open(0) < s.close(1) && s.close(0) > s.open(3))))
        s.color(1) * 100 else 0
    },
    p("CDL2CROWS", 12) { s =>
      if (s.color(2) == 1 && s.body(2) > s.avg(BodyLong, 2) &&
        s.color(1) == -1 && s.gapUp(1, 2) &&
        s.color(0) == -1 &&
        s.open(0) < s.open(1) && s.open(0) > s.close(1) &&
        s.close(0) > s.open(2) && s.close(0) < s.close(2)) -100 else 0
    },
    p("CDLIDENTICAL3CROWS", 12) { s =>
      // three declining blacks, each opening AT the prior close
      // (ta_CDLIDENTICAL3CROWS.c)
      if (s.color(2) == -1 && s.lower(2) < s.avg(ShadowVeryShort, 2) &&
        s.color(1) == -1 && s.lower(1) < s.avg(ShadowVeryShort, 1) &&
        s.color(0) == -1 && s.lower(0) < s.avg(ShadowVeryShort, 0) &&
        s.close(2) > s.close(1) && s.close(1) > s.close(0) &&
        s.open(1) <= s.close(2) + s.avg(Equal, 2) && s.open(1) >= s.close(2) - s.avg(Equal, 2) &&
        s.open(0) <= s.close(1) + s.avg(Equal, 1) && s.open(0) >= s.close(1) - s.avg(Equal, 1))
        -100 else 0
    },
    // ------------------------------------------------- multi-candle (7)
    p("CDLRISEFALL3METHODS", 14) { s =>
      // long candle, three small counter-trend candles held inside its
      // range, long resumption candle (ta_CDLRISEFALL3METHODS.c)
      val t = s.color(4)
      if (s.body(4) > s.avg(BodyLong, 4) &&
        s.body(3) < s.avg(BodyShort, 3) &&
        s.body(2) < s.avg(BodyShort, 2) &&
        s.body(1) < s.avg(BodyShort, 1) &&
        s.body(0) > s.avg(BodyLong, 0) &&
        s.color(4) == -s.color(3) && s.color(3) == s.color(2) && s.color(2) == s.color(1) &&
        s.color(1) == -s.color(0) &&
        s.bodyBot(3) < s.high(4) && s.bodyTop(3) > s.low(4) &&
        s.bodyBot(2) < s.high(4) && s.bodyTop(2) > s.low(4) &&
        s.bodyBot(1) < s.high(4) && s.bodyTop(1) > s.low(4) &&
        s.close(2) * t < s.close(3) * t &&
        s.close(1) * t < s.close(2) * t &&
        s.open(0) * t > s.close(1) * t &&
        s.close(0) * t > s.close(4) * t) t * 100 else 0
    },
    p("CDLXSIDEGAP3METHODS", 2) { s =>
      // two same-color gapping candles, then an opposite candle opening in
      // the 2nd body and closing in the 1st — filling the gap
      // (ta_CDLXSIDEGAP3METHODS.c)
      if (s.color(2) == s.color(1) && s.color(1) == -s.color(0) &&
        s.open(0) < s.bodyTop(1) && s.open(0) > s.bodyBot(1) &&
        s.close(0) < s.bodyTop(2) && s.close(0) > s.bodyBot(2) &&
        ((s.color(2) == 1 && s.gapUp(1, 2)) || (s.color(2) == -1 && s.gapDown(1, 2))))
        s.color(2) * 100 else 0
    },
    p("CDLUPSIDEGAP2CROWS", 12) { s =>
      // long white, gapping small black, larger black engulfing it but
      // closing above the white close (ta_CDLUPSIDEGAP2CROWS.c)
      if (s.color(2) == 1 && s.body(2) > s.avg(BodyLong, 2) &&
        s.color(1) == -1 && s.body(1) < s.avg(BodyShort, 1) &&
        s.gapUp(1, 2) &&
        s.color(0) == -1 &&
        s.open(0) > s.open(1) && s.close(0) < s.close(1) &&
        s.close(0) > s.close(2)) -100 else 0
    },
    p("CDLLADDERBOTTOM", 14) { s =>
      // three declining blacks, a black with an upper shadow, then a white
      // gapping open that closes above the prior high (ta_CDLLADDERBOTTOM.c)
      if (s.color(4) == -1 && s.color(3) == -1 && s.color(2) == -1 &&
        s.open(4) > s.open(3) && s.open(3) > s.open(2) &&
        s.close(4) > s.close(3) && s.close(3) > s.close(2) &&
        s.color(1) == -1 && s.upper(1) > s.avg(ShadowVeryShort, 1) &&
        s.color(0) == 1 && s.open(0) > s.open(1) && s.close(0) > s.high(1)) 100 else 0
    },
    p("CDLCONCEALBABYSWALL", 13) { s =>
      // two black marubozu, a black gapping down whose upper shadow probes
      // the prior body, then a black engulfing it entirely
      // (ta_CDLCONCEALBABYSWALL.c)
      if (s.color(3) == -1 && s.color(2) == -1 && s.color(1) == -1 && s.color(0) == -1 &&
        s.lower(3) < s.avg(ShadowVeryShort, 3) && s.upper(3) < s.avg(ShadowVeryShort, 3) &&
        s.lower(2) < s.avg(ShadowVeryShort, 2) && s.upper(2) < s.avg(ShadowVeryShort, 2) &&
        s.gapDown(1, 2) && s.upper(1) > s.avg(ShadowVeryShort, 1) &&
        s.high(1) > s.close(2) &&
        s.high(0) > s.high(1) && s.low(0) < s.low(1)) 100 else 0
    },
    {
      // CDLHIKKAKEMOD is stateful across rows: a detected pattern bar emits
      // ±100 and arms a 3-bar confirmation window; a close beyond the 3rd
      // candle's extreme inside that window emits ±200 (ta_CDLHIKKAKEMOD.c).
      // TA-Lib initializes detection on the 3 bars before its lookback (10),
      // so the closure runs detection from index 7 and gates output at 10.
      var patternIdx = Int.MinValue / 2
      var patternResult = 0
      var confHigh = 0.0
      var confLow = 0.0
      p("CDLHIKKAKEMOD", 7) { s =>
        val idx = s.idx
        val detected =
          s.high(2) < s.high(3) && s.low(2) > s.low(3) &&
            s.high(1) < s.high(2) && s.low(1) > s.low(2) &&
            ((s.high(0) < s.high(1) && s.low(0) < s.low(1) &&
              s.close(2) <= s.low(2) + s.avg(Near, 2)) ||
              (s.high(0) > s.high(1) && s.low(0) > s.low(1) &&
                s.close(2) >= s.high(2) - s.avg(Near, 2)))
        if (detected) {
          patternResult = if (s.high(0) < s.high(1)) 100 else -100
          patternIdx = idx
          confHigh = s.high(1); confLow = s.low(1)
          if (idx >= 10) patternResult else 0
        } else if (idx >= 10 && idx <= patternIdx + 3 &&
          ((patternResult > 0 && s.close(0) > confHigh) ||
            (patternResult < 0 && s.close(0) < confLow))) {
          patternIdx = Int.MinValue / 2
          patternResult + (if (patternResult > 0) 100 else -100)
        } else 0
      }
    },
    p("CDLMATHOLD", 14) { s =>
      // long white, upside-gapping small black, two falling small candles
      // held in the upper half of the white body, white resumption closing
      // above the reaction highs (ta_CDLMATHOLD.c, penetration 0.5)
      if (s.body(4) > s.avg(BodyLong, 4) &&
        s.body(3) < s.avg(BodyShort, 3) &&
        s.body(2) < s.avg(BodyShort, 2) &&
        s.body(1) < s.avg(BodyShort, 1) &&
        s.color(4) == 1 && s.color(3) == -1 && s.color(0) == 1 &&
        s.gapUp(3, 4) &&
        s.bodyBot(2) < s.close(4) && s.bodyBot(1) < s.close(4) &&
        s.bodyBot(2) > s.close(4) - s.body(4) * 0.5 &&
        s.bodyBot(1) > s.close(4) - s.body(4) * 0.5 &&
        s.bodyTop(2) < s.open(3) &&
        s.bodyTop(1) < s.bodyTop(2) &&
        s.open(0) > s.close(1) &&
        s.close(0) > math.max(math.max(s.high(3), s.high(2)), s.high(1))) 100 else 0
    }
  )

  private val template = mkPatterns()
  val names: Vector[String] = template.map(_.name)
  val count: Int = template.length

  /** Streaming evaluator: push a candle, get all pattern outputs. */
  final class Evaluator {
    private val pats = mkPatterns()
    private val st = new State
    /** Returns the outputs array (reused — copy if retained). */
    def next(o: Double, h: Double, l: Double, c: Double): Array[Int] = {
      st.push(o, h, l, c)
      st.bump()
      val idx = st.total - 1
      val out = new Array[Int](pats.length)
      var i = 0
      while (i < pats.length) {
        val pt = pats(i)
        out(i) = if (idx >= pt.lookback) pt.eval(st) else 0
        i += 1
      }
      out
    }
  }
}
