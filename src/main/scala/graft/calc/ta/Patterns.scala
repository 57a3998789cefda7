package graft.calc.ta

/** Candlestick-pattern kernels (the reference's CDL* columns,
  * candle_to_calcs.py:454-507) with TA-Lib's candle-setting machinery:
  * every geometric threshold ("long body", "very short shadow", "near",
  * "equal") is a factor times a trailing average of a range type, using
  * TA-Lib's published default settings. Averages for a candle are taken over
  * the `period` candles strictly BEFORE it, and a pattern emits 0 until its
  * TA-Lib lookback index — reproducing the leading-NaN → fillna(0) shape of
  * the reference.
  *
  * Outputs are −100/0/+100. This tranche covers the 17 single-candle
  * patterns plus the two/three-candle patterns whose published semantics are
  * unambiguous (35 of the reference's 59); `names` is the contract —
  * candle_pattern_sum (G7) sums exactly the implemented set.
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

  /** The implemented patterns, reference declaration order
    * (candle_to_calcs.py:458-507 subset).
    */
  private val patterns: Vector[Pattern] = Vector(
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
    // ------------------------------------------------------- two-candle
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
    p("CDLSEPARATINGLINES", 11) { s =>
      if (s.color(1) == -s.color(0) &&
        math.abs(s.open(0) - s.open(1)) <= s.avg(Equal, 1) &&
        s.body(0) > s.avg(BodyLong, 0) &&
        ((s.color(0) == 1 && s.lower(0) < s.avg(ShadowVeryShort, 0)) ||
          (s.color(0) == -1 && s.upper(0) < s.avg(ShadowVeryShort, 0))))
        s.color(0) * 100 else 0
    },
    p("CDLMATCHINGLOW", 6) { s =>
      if (s.color(1) == -1 && s.color(0) == -1 &&
        s.close(0) <= s.close(1) + s.avg(Equal, 1) &&
        s.close(0) >= s.close(1) - s.avg(Equal, 1)) 100 else 0
    },
    p("CDLHARAMICROSS", 11) { s =>
      if (s.body(1) > s.avg(BodyLong, 1) &&
        s.body(0) <= s.avg(BodyDoji, 0) &&
        s.bodyTop(0) < s.bodyTop(1) &&
        s.bodyBot(0) > s.bodyBot(1)) -s.color(1) * 100 else 0
    },
    p("CDLHOMINGPIGEON", 11) { s =>
      if (s.color(1) == -1 && s.color(0) == -1 &&
        s.body(1) > s.avg(BodyLong, 1) &&
        s.body(0) <= s.avg(BodyShort, 0) &&
        s.open(0) < s.open(1) &&
        s.close(0) > s.close(1)) 100 else 0
    },
    // ------------------------------------------------------- three-candle
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
    p("CDLTRISTAR", 12) { s =>
      def doji(j: Int) = s.body(j) <= s.avg(BodyDoji, 2)
      if (doji(2) && doji(1) && doji(0)) {
        if (s.gapUp(1, 2) && s.bodyTop(0) < s.bodyTop(1)) -100
        else if (s.gapDown(1, 2) && s.bodyBot(0) > s.bodyBot(1)) 100
        else 0
      } else 0
    },
    p("CDLSTICKSANDWICH", 7) { s =>
      if (s.color(2) == -1 && s.color(1) == 1 && s.color(0) == -1 &&
        s.low(1) > s.close(2) &&
        s.close(0) <= s.close(2) + s.avg(Equal, 2) &&
        s.close(0) >= s.close(2) - s.avg(Equal, 2)) 100 else 0
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
    p("CDL2CROWS", 12) { s =>
      if (s.color(2) == 1 && s.body(2) > s.avg(BodyLong, 2) &&
        s.color(1) == -1 && s.gapUp(1, 2) &&
        s.color(0) == -1 &&
        s.open(0) < s.open(1) && s.open(0) > s.close(1) &&
        s.close(0) > s.open(2) && s.close(0) < s.close(2)) -100 else 0
    }
  )

  val names: Vector[String] = patterns.map(_.name)
  val count: Int = patterns.length

  /** Streaming evaluator: push a candle, get all pattern outputs. */
  final class Evaluator {
    private val st = new State
    /** Returns the outputs array (reused — copy if retained). */
    def next(o: Double, h: Double, l: Double, c: Double): Array[Int] = {
      st.push(o, h, l, c)
      st.bump()
      val idx = st.total - 1
      val out = new Array[Int](patterns.length)
      var i = 0
      while (i < patterns.length) {
        val pt = patterns(i)
        out(i) = if (idx >= pt.lookback) pt.eval(st) else 0
        i += 1
      }
      out
    }
  }
}
