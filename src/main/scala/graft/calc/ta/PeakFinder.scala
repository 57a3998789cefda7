package graft.calc.ta

import scala.collection.mutable.ArrayBuilder

/** Port of scipy.signal.find_peaks for the subset the reference uses —
  * distance + prominence filters (label_peaks_valleys_multi,
  * candle_to_calcs.py:528-558) — following scipy's published algorithm:
  *
  *  1. local maxima with plateau handling: a flat top's midpoint
  *     (left+right)/2 is the peak; signal edges can never be peaks;
  *  2. distance thinning: peaks visited by descending height (ties: later
  *     index first, matching argsort-stable + reverse iteration); any
  *     not-yet-removed neighbor closer than `distance` samples is removed;
  *  3. prominence: height above the higher of the two lowest points between
  *     the peak and its nearest strictly-higher samples (or signal edges);
  *     keep peaks with prominence >= the threshold.
  */
object PeakFinder {

  /** Indices of local maxima (plateau midpoints). */
  def localMaxima(x: Array[Double]): Array[Int] = {
    val out = new ArrayBuilder.ofInt // primitive — no boxed Integers on the hot path
    val iMax = x.length - 1
    var i = 1
    while (i < iMax) {
      if (x(i - 1) < x(i)) {
        var iAhead = i + 1
        while (iAhead < iMax && x(iAhead) == x(i)) iAhead += 1
        if (x(iAhead) < x(i)) {
          val leftEdge = i
          val rightEdge = iAhead - 1
          out += (leftEdge + rightEdge) / 2
          i = iAhead
        } else i = iAhead
      } else i += 1
    }
    out.result()
  }

  /** Greedy distance thinning by descending priority (peak height). */
  def selectByDistance(peaks: Array[Int], priority: Array[Double], distance: Int): Array[Boolean] = {
    val n = peaks.length
    val keep = Array.fill(n)(true)
    // Ascending argsort by (priority, index) — the composite key is unique,
    // so an unstable primitive heapsort reproduces the old stable-sort order
    // exactly. The previous `indices.sortBy(priority)` boxed every Double
    // and Integer through TimSort; at sf10 (1M+ candidate peaks × 29
    // concurrent kernel tasks) that boxing OOM'd the heap. Double.compare
    // keeps TotalOrdering semantics (-0.0 < 0.0, NaN greatest).
    val order = Array.tabulate(n)(identity)
    @inline def less(a: Int, b: Int): Boolean = {
      val c = java.lang.Double.compare(priority(a), priority(b))
      if (c != 0) c < 0 else a < b
    }
    def siftDown(start: Int, end: Int): Unit = {
      var root = start
      var done = false
      while (!done && 2 * root + 1 <= end) {
        var child = 2 * root + 1
        if (child + 1 <= end && less(order(child), order(child + 1))) child += 1
        if (less(order(root), order(child))) {
          val t = order(root); order(root) = order(child); order(child) = t
          root = child
        } else done = true
      }
    }
    var s = n / 2 - 1
    while (s >= 0) { siftDown(s, n - 1); s -= 1 }
    var e = n - 1
    while (e > 0) {
      val t = order(0); order(0) = order(e); order(e) = t
      e -= 1
      siftDown(0, e)
    }
    var oi = n - 1
    while (oi >= 0) {
      val j = order(oi)
      if (keep(j)) {
        var k = j - 1
        while (k >= 0 && peaks(j) - peaks(k) < distance) { keep(k) = false; k -= 1 }
        k = j + 1
        while (k < n && peaks(k) - peaks(j) < distance) { keep(k) = false; k += 1 }
      }
      oi -= 1
    }
    keep
  }

  /** Prominence of each peak (wlen unset: full-signal scan).
    *
    * Semantics per peak p with h = x(p): scan outward while x ≤ h (a value
    * STRICTLY above h stops the scan), take the min of each scanned side
    * (empty side → h), prominence = h − max(leftMin, rightMin) — scipy's
    * `_peak_prominences`. The naive per-peak rescan is superlinear on
    * random-walk data (a high peak rescans nearly the whole signal; at the
    * sf10 hot chunk's 2.2M candles one find_peaks sweep cost 1.3 s). This
    * computes ALL peaks' scan-minima in one O(n) monotonic-stack pass per
    * direction: popping while top ≤ current makes the residual top the
    * previous STRICTLY-greater element (= the scan stopper), and each
    * entry's `gap` carries the min of x over the open interval between it
    * and the entry below, so leftMin(p) = min(h, gap(p)) exactly — same
    * doubles, same comparisons, bit-identical to the rescan (differential
    * spec pins it, NaN and equal-plateau cases included).
    */
  def prominences(x: Array[Double], peaks: Array[Int]): Array[Double] = {
    val m = peaks.length
    if (m == 0) return new Array[Double](0)
    val n = x.length
    val leftMin = new Array[Double](m)
    val rightMin = new Array[Double](m)
    val stkVal = new Array[Double](n)
    val stkGap = new Array[Double](n)
    var sp = 0
    var pi = 0
    var i = 0
    while (i < n) {
      val v = x(i)
      var acc = Double.PositiveInfinity
      while (sp > 0 && stkVal(sp - 1) <= v) {
        sp -= 1
        if (stkVal(sp) < acc) acc = stkVal(sp)
        if (stkGap(sp) < acc) acc = stkGap(sp)
      }
      stkVal(sp) = v; stkGap(sp) = acc; sp += 1
      if (pi < m && peaks(pi) == i) {
        leftMin(pi) = if (acc < v) acc else v
        pi += 1
      }
      i += 1
    }
    sp = 0
    pi = m - 1
    i = n - 1
    while (i >= 0) {
      val v = x(i)
      var acc = Double.PositiveInfinity
      while (sp > 0 && stkVal(sp - 1) <= v) {
        sp -= 1
        if (stkVal(sp) < acc) acc = stkVal(sp)
        if (stkGap(sp) < acc) acc = stkGap(sp)
      }
      stkVal(sp) = v; stkGap(sp) = acc; sp += 1
      if (pi >= 0 && peaks(pi) == i) {
        rightMin(pi) = if (acc < v) acc else v
        pi -= 1
      }
      i -= 1
    }
    val out = new Array[Double](m)
    var k = 0
    while (k < m) {
      out(k) = x(peaks(k)) - math.max(leftMin(k), rightMin(k))
      k += 1
    }
    out
  }

  /** find_peaks(x, distance=d, prominence=p) → kept peak indices, ascending. */
  def findPeaks(x: Array[Double], distance: Int, prominence: Double): Array[Int] = {
    val peaks = localMaxima(x)
    if (peaks.isEmpty) return peaks
    val keep = selectByDistance(peaks, peaks.map(x), distance)
    val thinned = new ArrayBuilder.ofInt
    var i = 0
    while (i < peaks.length) { if (keep(i)) thinned += peaks(i); i += 1 }
    val kept = thinned.result()
    val proms = prominences(x, kept)
    val out = new ArrayBuilder.ofInt
    i = 0
    while (i < kept.length) { if (proms(i) >= prominence) out += kept(i); i += 1 }
    out.result()
  }
}
