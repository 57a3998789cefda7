package graft.functions

import org.scalatest.funsuite.AnyFunSuite

/** The two estimator guarantees the sketch queries' oracle rows assert on
  * real data, re-proven on random corpora so future edits to the hash or
  * the estimate math can't silently weaken them.
  */
class SketchPropertySpec extends AnyFunSuite {

  test("CMS never undercounts: estimate >= exact for every key (random multisets)") {
    val rnd = new scala.util.Random(11)
    val w = 64 // deliberately tiny so collisions are dense
    for (_ <- 1 to 5) {
      val keys = Seq.fill(5000)(rnd.nextLong().abs % 300)
      val exact = keys.groupBy(identity).view.mapValues(_.size.toLong).toMap
      val cells = Array.fill(Sketches.CmsParams.size, w)(0L)
      for (k <- keys; ((a, b), i) <- Sketches.CmsParams.zipWithIndex)
        cells(i)((Hash61Kernel.hash(k, a, b) % w).toInt) += 1
      for ((k, n) <- exact) {
        val est = Sketches.CmsParams.zipWithIndex.map { case ((a, b), i) =>
          cells(i)((Hash61Kernel.hash(k, a, b) % w).toInt)
        }.min
        assert(est >= n, s"CMS undercounted key $k: $est < $n")
      }
    }
  }

  test("HLL(m=256) lands within 3 standard errors on 50k random distinct keys") {
    val rnd = new scala.util.Random(23)
    val (a, b) = Sketches.HllParams
    val m = 256
    val n = 50000
    val regs = new Array[Int](m)
    Iterator.continually(rnd.nextLong().abs).distinct.take(n).foreach { x =>
      val h = Hash61Kernel.hash(x, a, b)
      val bucket = (h % m).toInt
      val rest = h >>> 8
      val rho = if (rest == 0L) 54 else 54 - (64 - java.lang.Long.numberOfLeadingZeros(rest))
      if (rho > regs(bucket)) regs(bucket) = rho
    }
    var s = BigInt(0)
    regs.foreach(r => s += BigInt(1) << (60 - r))
    val alpha = 0.7213 / (1.0 + 1.079 / m)
    val est = alpha * m * m * math.pow(2.0, 60.0) / s.toDouble
    val relErr = math.abs(est - n) / n.toDouble
    // stderr ≈ 1.04/sqrt(256) = 6.5%; 3σ ≈ 19.5% (deterministic seed, so
    // this is a fixed-value regression pin, not a flaky statistical test)
    assert(relErr < 0.195, s"HLL estimate $est vs $n: relErr $relErr")
  }
}
