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

  test("reference parameter sets behave on a sine-like series") {
    val x = (0 until 200).map(i => math.sin(i / 6.0) * (1 + i / 200.0)).toArray
    val major = PeakFinder.findPeaks(x, 10, 0.9)
    val micro = PeakFinder.findPeaks(x, 5, 0.5)
    assert(major.nonEmpty && micro.length >= major.length)
    // every major peak is a true local max
    major.foreach(p => assert(x(p) > x(p - 1) && x(p) > x(p + 1)))
  }
}
