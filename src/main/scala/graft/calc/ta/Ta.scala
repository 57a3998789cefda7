package graft.calc.ta

/** Streaming technical-analysis kernels with TA-Lib-exact semantics.
  *
  * The reference pipeline computes its H-family indicators through TA-Lib C
  * calls (reference: candle_to_calcs.py:381-452); Catalyst windows cannot
  * express these exponential/stateful recurrences, so they run as a
  * per-symbol sorted pass (see [[graft.calc.IndicatorPass]]). Every kernel
  * here is O(1) state — no per-symbol buffering beyond fixed ring buffers —
  * which is what makes the pass safe on unbounded per-symbol history.
  *
  * Seeding conventions are pinned to TA-Lib's published algorithms
  * (ta-lib.org ta_func C sources) and noted per kernel. Warm-up outputs are
  * Double.NaN, mirroring TA-Lib's unset leading values; the caller applies
  * the reference's pandas fillna collapses.
  */
object Ta {

  /** EMA with TA-Lib seeding: first output after `period` inputs is their
    * SMA; thereafter the TA_INT_EMA recurrence form `e += k*(x - e)`
    * (the floating-point form matters for bit fidelity).
    */
  final class Ema(period: Int) {
    private val k = 2.0 / (period + 1.0)
    private var seedSum = 0.0
    private var n = 0
    private var e = Double.NaN
    def update(x: Double): Double = {
      n += 1
      if (n < period) { seedSum += x; Double.NaN }
      else if (n == period) { seedSum += x; e = seedSum / period; e }
      else { e = ((x - e) * k) + e; e }
    }
    def value: Double = e
  }

  /** MACD(fast=12, slow=26, signal=9) with TA-Lib's alignment: BOTH EMAs
    * emit from index slow-1, so the fast EMA is seeded with the SMA of the
    * `fast` inputs ENDING at index slow-1 (it ignores the first slow-fast
    * inputs) — not an independently-warmed EMA(fast). Signal is an EMA of
    * the macd line; all three outputs are NaN before index slow+signal-2
    * (= 33 for 12/26/9), matching talib.MACD.
    */
  final class Macd(fast: Int = 12, slow: Int = 26, signal: Int = 9) {
    private val fastEma = new Ema(fast)
    private val slowEma = new Ema(slow)
    private val sigEma = new Ema(signal)
    private var idx = -1
    var macd: Double = Double.NaN
    var sig: Double = Double.NaN
    var hist: Double = Double.NaN
    def update(x: Double): Unit = {
      idx += 1
      val s = slowEma.update(x)
      val f = if (idx >= slow - fast) fastEma.update(x) else Double.NaN
      if (idx >= slow - 1) {
        val m = f - s
        val sg = sigEma.update(m)
        if (idx >= slow + signal - 2) { macd = m; sig = sg; hist = m - sg }
      }
    }
  }

  private def trueRange(h: Double, l: Double, prevClose: Double): Double = {
    val hl = h - l
    val hc = math.abs(h - prevClose)
    val lc = math.abs(l - prevClose)
    math.max(hl, math.max(hc, lc))
  }

  /** ATR(period) — Wilder: first value at index `period` is the SMA of the
    * first `period` true ranges (which start at index 1), then
    * atr = (atr*(period-1) + tr) / period. NaN during warm-up.
    */
  final class Atr(period: Int = 14) {
    private var prevClose = Double.NaN
    private var seen = false
    private var trN = 0
    private var sum = 0.0
    private var atr = Double.NaN
    def update(h: Double, l: Double, c: Double): Double = {
      if (!seen) { prevClose = c; seen = true; return Double.NaN }
      val tr = trueRange(h, l, prevClose)
      prevClose = c
      trN += 1
      if (trN < period) { sum += tr; Double.NaN }
      else if (trN == period) { sum += tr; atr = sum / period; atr }
      else { atr = ((atr * (period - 1)) + tr) / period; atr }
    }
    def value: Double = atr
  }

  /** ADX / +DI / −DI (period 14) — Wilder smoothing exactly as TA-Lib:
    * raw +DM/−DM/TR sums over indices 1..period-1, the Wilder transition
    * `s = s - s/period + v` from index `period` on; DI emits from index
    * `period`; ADX seeds as the mean of the first `period` DX values and
    * emits from index `2*period - 1`. Tie DM bars (diffP == diffM) count
    * for neither side; zero-TR and zero-DI-sum guards hold previous ADX.
    */
  final class Adx(period: Int = 14) {
    private var idx = -1
    private var ph, pl, pc = Double.NaN
    private var smPlus, smMinus, smTr = 0.0
    private var dxSum = 0.0
    private var dxN = 0
    var adx: Double = Double.NaN
    var diPlus: Double = Double.NaN
    var diMinus: Double = Double.NaN
    def update(h: Double, l: Double, c: Double): Unit = {
      idx += 1
      if (idx == 0) { ph = h; pl = l; pc = c; return }
      val diffP = h - ph
      val diffM = pl - l
      val tr = trueRange(h, l, pc)
      ph = h; pl = l; pc = c
      if (idx < period) { // raw accumulation, indices 1..period-1
        if (diffM > 0 && diffP < diffM) smMinus += diffM
        else if (diffP > 0 && diffP > diffM) smPlus += diffP
        smTr += tr
        return
      }
      // Wilder update from index `period` on
      smMinus -= smMinus / period
      smPlus -= smPlus / period
      if (diffM > 0 && diffP < diffM) smMinus += diffM
      else if (diffP > 0 && diffP > diffM) smPlus += diffP
      smTr = smTr - smTr / period + tr
      if (smTr != 0.0) {
        diMinus = 100.0 * (smMinus / smTr)
        diPlus = 100.0 * (smPlus / smTr)
        val s = diPlus + diMinus
        if (dxN < period) { // DX accumulation for the ADX seed
          if (s != 0.0) dxSum += 100.0 * (math.abs(diPlus - diMinus) / s)
          dxN += 1
          if (dxN == period) adx = dxSum / period
        } else if (s != 0.0) {
          adx = ((adx * (period - 1)) + 100.0 * (math.abs(diPlus - diMinus) / s)) / period
        }
      } else { diMinus = 0.0; diPlus = 0.0 }
    }
  }

  /** Parabolic SAR(accel=0.02, max=0.2) — the TA-Lib flip algorithm
    * (ta_SAR.c): initial direction from the one-period −DM of the first two
    * bars, SAR clamped to the prior two bars' extremes, EP/AF reset on
    * reversal. Emits from index 1 (index 0 is NaN).
    */
  final class Sar(accelInit: Double = 0.02, accelMax: Double = 0.2) {
    private var idx = -1
    private var isLong = true
    private var af = accelInit
    private var ep = Double.NaN
    private var sar = Double.NaN
    private var prevHigh, prevLow = Double.NaN
    private var h0, l0 = Double.NaN
    def update(h: Double, l: Double): Double = {
      idx += 1
      if (idx == 0) { h0 = h; l0 = l; prevHigh = h; prevLow = l; return Double.NaN }
      if (idx == 1) {
        // direction: one-period -DM between bar0 and bar1
        val diffM = l0 - l
        val diffP = h - h0
        isLong = !(diffM > 0 && diffP < diffM)
        if (isLong) { ep = h; sar = l0 } else { ep = l; sar = h0 }
        // fall through into the regular step so bar 1 emits like TA-Lib
      }
      val pH = prevHigh; val pL = prevLow
      prevHigh = h; prevLow = l
      var out = 0.0
      if (isLong) {
        if (l <= sar) {
          isLong = false
          sar = math.max(math.max(ep, pH), h)
          out = sar
          af = accelInit; ep = l
          sar = sar + af * (ep - sar)
          sar = math.max(math.max(sar, pH), h)
        } else {
          out = sar
          if (h > ep) { ep = h; af = math.min(af + accelInit, accelMax) }
          sar = sar + af * (ep - sar)
          sar = math.min(math.min(sar, pL), l)
        }
      } else {
        if (h >= sar) {
          isLong = true
          sar = math.min(math.min(ep, pL), l)
          out = sar
          af = accelInit; ep = h
          sar = sar + af * (ep - sar)
          sar = math.min(math.min(sar, pL), l)
        } else {
          out = sar
          if (l < ep) { ep = l; af = math.min(af + accelInit, accelMax) }
          sar = sar + af * (ep - sar)
          sar = math.max(math.max(sar, pH), h)
        }
      }
      out
    }
  }

  /** T3(period, vFactor=0.7) — six cascaded generalized-DEMA EMAs with
    * TA-Lib's sequential seeding (ta_T3.c): e1 seeds as the SMA of the first
    * `period` inputs; each deeper EMA seeds as the mean of the previous
    * stage's next `period-1` outputs (plus its seed); first output at index
    * 6*(period-1) comes straight from the seeds. T3's EMA recurrence form
    * is `e = k*x + (1-k)*e` (differs in float from TA_INT_EMA's form).
    */
  final class T3(period: Int = 60, v: Double = 0.7) {
    private val k = 2.0 / (period + 1.0)
    private val oneMinusK = 1.0 - k
    private val c1 = -(v * v * v)
    private val c2 = 3.0 * (v * v) + 3.0 * (v * v * v)
    private val c3 = -6.0 * (v * v) - 3.0 * v - 3.0 * (v * v * v)
    private val c4 = 1.0 + 3.0 * v + (v * v * v) + 3.0 * (v * v)
    private var e1, e2, e3, e4, e5, e6 = Double.NaN
    private var tempSum = 0.0
    private var phase = 0 // 0: seeding e1; 1..5: seeding e2..e6; 6: steady state
    private var n = 0
    def update(x: Double): Double = {
      if (phase == 0) {
        tempSum += x; n += 1
        if (n == period) { e1 = tempSum / period; phase = 1; tempSum = e1; n = 0 }
        return Double.NaN
      }
      if (phase < 6) {
        // advance the already-seeded stages, accumulate the next seed
        e1 = (k * x) + (oneMinusK * e1)
        var stageOut = e1
        if (phase >= 2) { e2 = (k * e1) + (oneMinusK * e2); stageOut = e2 }
        if (phase >= 3) { e3 = (k * e2) + (oneMinusK * e3); stageOut = e3 }
        if (phase >= 4) { e4 = (k * e3) + (oneMinusK * e4); stageOut = e4 }
        if (phase >= 5) { e5 = (k * e4) + (oneMinusK * e5); stageOut = e5 }
        tempSum += stageOut
        n += 1
        if (n == period - 1) {
          val seeded = tempSum / period
          phase match {
            case 1 => e2 = seeded
            case 2 => e3 = seeded
            case 3 => e4 = seeded
            case 4 => e5 = seeded
            case 5 => e6 = seeded
          }
          phase += 1
          n = 0
          tempSum = seeded
          if (phase == 6) return c1 * e6 + c2 * e5 + c3 * e4 + c4 * e3
        }
        return Double.NaN
      }
      e1 = (k * x) + (oneMinusK * e1)
      e2 = (k * e1) + (oneMinusK * e2)
      e3 = (k * e2) + (oneMinusK * e3)
      e4 = (k * e3) + (oneMinusK * e4)
      e5 = (k * e4) + (oneMinusK * e5)
      e6 = (k * e5) + (oneMinusK * e6)
      c1 * e6 + c2 * e5 + c3 * e4 + c4 * e3
    }
  }

  /** Fixed-size ring buffer for rolling means / lagged diffs. */
  final class Ring(size: Int) {
    private val buf = new Array[Double](size)
    private var n = 0
    private var pos = 0
    private var sum = 0.0
    /** Pushes x; returns the evicted value (NaN while filling). */
    def push(x: Double): Double = {
      val evicted = if (n == size) buf(pos) else Double.NaN
      if (n == size) sum -= evicted else n += 1
      buf(pos) = x
      sum += x
      pos = (pos + 1) % size
      evicted
    }
    def isFull: Boolean = n == size
    def mean: Double = if (n == 0) Double.NaN else sum / n
    /** Mean from a fresh oldest-first summation (not the incrementally
      * maintained `sum`, whose float error drifts after evictions). The
      * left-assoc oldest→newest add order is reproducible exactly in SQL as
      * an explicit lag chain — which is what makes high_volatility
      * oracle-checkable bit-for-bit.
      */
    def seqMean: Double = {
      if (n == 0) return Double.NaN
      val start = if (n == size) pos else 0
      var s = 0.0
      var i = 0
      while (i < n) { s += buf((start + i) % size); i += 1 }
      s / n
    }
    def count: Int = n
  }
}
