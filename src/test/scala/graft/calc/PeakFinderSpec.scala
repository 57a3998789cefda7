package graft.calc

import org.scalatest.funsuite.AnyFunSuite

import graft.calc.ta.PeakFinder

class PeakFinderSpec extends AnyFunSuite {

  test("simple local maxima with full prominence") {
    val x = Array(0.0, 1.0, 0.0, 2.0, 0.0, 3.0, 0.0)
    assert(PeakFinder.localMaxima(x).toSeq == Seq(1, 3, 5))
    assert(PeakFinder.findPeaks(x, 1, 0.5).toSeq == Seq(1, 3, 5))
  }

  test("plateau peaks report the midpoint; edges are never peaks") {
    val x = Array(0.0, 1.0, 1.0, 1.0, 0.0)
    assert(PeakFinder.localMaxima(x).toSeq == Seq(2))
    assert(PeakFinder.localMaxima(Array(5.0, 1.0, 5.0)).isEmpty)
  }

  test("distance thinning removes the smaller of two close peaks") {
    val x = Array(0.0, 3.0, 0.0, 2.9, 0.0)
    assert(PeakFinder.findPeaks(x, 3, 0.1).toSeq == Seq(1))
    // far enough apart: both survive
    assert(PeakFinder.findPeaks(x, 2, 0.1).toSeq == Seq(1, 3))
  }

  test("prominence measures height above the saddle, not above zero") {
    val x = Array(0.0, 5.0, 4.0, 4.5, 0.0)
    // peak at 3 has prominence 0.5 (saddle at 4.0)
    assert(PeakFinder.findPeaks(x, 1, 0.9).toSeq == Seq(1))
    assert(PeakFinder.findPeaks(x, 1, 0.4).toSeq == Seq(1, 3))
    val proms = PeakFinder.prominences(x, Array(1, 3))
    assert(proms(0) == 5.0 && proms(1) == 0.5)
  }

  test("heapsort thinning matches the stable-sort reference, ties included") {
    // selectByDistance replaced a boxed stable TimSort argsort with a
    // primitive heapsort over the (priority, index) composite key. The key
    // is unique, so the unstable sort must reproduce the stable order
    // bit-for-bit — including on tied priorities, where stability is the
    // only thing that disambiguates which peak wins the greedy pass.
    def referenceSelect(peaks: Array[Int], priority: Array[Double], distance: Int): Array[Boolean] = {
      val n = peaks.length
      val keep = Array.fill(n)(true)
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
    val rnd = new scala.util.Random(42)
    for (trial <- 0 until 50) {
      val n = 1 + rnd.nextInt(200)
      // sorted distinct positions, as localMaxima produces
      val peaks = Array.iterate(rnd.nextInt(3), n)(p => p + 1 + rnd.nextInt(5))
      // quantized priorities force many exact ties; sprinkle ±0.0 and NaN
      val priority = Array.fill(n) {
        rnd.nextInt(10) match {
          case 0 => -0.0
          case 1 => 0.0
          case 2 => Double.NaN
          case _ => rnd.nextInt(4).toDouble
        }
      }
      val distance = 1 + rnd.nextInt(8)
      assert(
        PeakFinder.selectByDistance(peaks, priority, distance).toSeq ==
          referenceSelect(peaks, priority, distance).toSeq,
        s"trial $trial: n=$n distance=$distance")
    }
  }

  test("stack prominences match the per-peak rescan, plateaus and NaN included") {
    // prominences() replaced the per-peak outward rescan (superlinear on
    // random walks) with an O(n) monotonic-stack pass. Same doubles, same
    // comparisons — bit-identical, pinned here against the naive form.
    def referenceProminences(x: Array[Double], peaks: Array[Int]): Array[Double] =
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
    def sameBits(a: Array[Double], b: Array[Double]): Boolean =
      a.length == b.length && a.indices.forall(i =>
        java.lang.Double.doubleToLongBits(a(i)) == java.lang.Double.doubleToLongBits(b(i)))
    val rnd = new scala.util.Random(99)
    for (trial <- 0 until 30) {
      val n = 50 + rnd.nextInt(500)
      val x = new Array[Double](n)
      var v = 10.0
      for (i <- 0 until n) {
        v += (rnd.nextInt(7) - 3) * 0.5 // quantized walk — many exact ties/plateaus
        x(i) = if (rnd.nextInt(50) == 0) Double.NaN else v
      }
      val peaks = PeakFinder.localMaxima(x)
      assert(sameBits(PeakFinder.prominences(x, peaks), referenceProminences(x, peaks)),
        s"trial $trial (localMaxima peaks)")
      // arbitrary query indices, not just true maxima — public-surface contract
      val qs = (0 until n).filter(_ => rnd.nextInt(5) == 0).toArray
      assert(sameBits(PeakFinder.prominences(x, qs), referenceProminences(x, qs)),
        s"trial $trial (arbitrary queries)")
    }
  }

  test("reference parameter sets behave on a sine-like series") {
    val x = (0 until 200).map(i => math.sin(i / 6.0) * (1 + i / 200.0)).toArray
    val major = PeakFinder.findPeaks(x, 10, 0.9)
    val micro = PeakFinder.findPeaks(x, 5, 0.5)
    assert(major.nonEmpty && micro.length >= major.length)
    // every major peak is a true local max
    major.foreach(p => assert(x(p) > x(p - 1) && x(p) > x(p + 1)))
  }
}
