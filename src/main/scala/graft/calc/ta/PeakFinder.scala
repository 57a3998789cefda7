package graft.calc.ta

import scala.collection.mutable.ArrayBuffer

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
    val out = ArrayBuffer.empty[Int]
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
    out.toArray
  }

  /** Greedy distance thinning by descending priority (peak height). */
  def selectByDistance(peaks: Array[Int], priority: Array[Double], distance: Int): Array[Boolean] = {
    val n = peaks.length
    val keep = Array.fill(n)(true)
    // stable ascending argsort, iterated from the end = highest (ties: later index) first
    val order = peaks.indices.sortBy(priority)(Ordering.Double.TotalOrdering)
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

  /** Prominence of each peak (wlen unset: full-signal scan). */
  def prominences(x: Array[Double], peaks: Array[Int]): Array[Double] = {
    peaks.map { p =>
      val h = x(p)
      var leftMin = h
      var i = p - 1
      while (i >= 0 && x(i) <= h) { if (x(i) < leftMin) leftMin = x(i); i -= 1 }
      var rightMin = h
      i = p + 1
      while (i < x.length && x(i) <= h) { if (x(i) < rightMin) rightMin = x(i); i += 1 }
      h - math.max(leftMin, rightMin)
    }
  }

  /** find_peaks(x, distance=d, prominence=p) → kept peak indices, ascending. */
  def findPeaks(x: Array[Double], distance: Int, prominence: Double): Array[Int] = {
    var peaks = localMaxima(x)
    if (peaks.isEmpty) return peaks
    val keep = selectByDistance(peaks, peaks.map(x), distance)
    peaks = peaks.zip(keep).collect { case (pk, true) => pk }
    val proms = prominences(x, peaks)
    peaks.zip(proms).collect { case (pk, pr) if pr >= prominence => pk }
  }
}
