package graft.calc

import org.scalatest.funsuite.AnyFunSuite

/** Throwaway timing probe for the sf10 w14 investigation (not an assertion
  * of performance — prints timings; kept green by construction).
  */
class PeakTimingSpec extends AnyFunSuite {
  test("flags() kernel cost on a 2.2M random walk") {
    val n = 2200000
    val rnd = new scala.util.Random(7)
    val high = new Array[Double](n)
    val low = new Array[Double](n)
    var x = 100.0
    var i = 0
    while (i < n) {
      x += rnd.nextGaussian() * 0.1
      high(i) = x + math.abs(rnd.nextGaussian()) * 0.05
      low(i) = x - math.abs(rnd.nextGaussian()) * 0.05
      i += 1
    }
    // warmup
    PeaksPass.flags(high.take(200000), low.take(200000))
    for (rep <- 1 to 2) {
      val t0 = System.nanoTime()
      val fl = PeaksPass.flags(high, low)
      val ms = (System.nanoTime() - t0) / 1e6
      info(f"rep $rep: flags(2.2M) = $ms%.0f ms, peaks=${fl(0).sum}")
    }
    val t1 = System.nanoTime()
    val pk = graft.calc.ta.PeakFinder.findPeaks(high, 10, 0.9)
    info(f"findPeaks(major) alone = ${(System.nanoTime() - t1) / 1e6}%.0f ms, n=${pk.length}")
  }
}
