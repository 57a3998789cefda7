package graft.calc

import org.scalatest.funsuite.AnyFunSuite

import graft.calc.ta.Patterns

/** Hand-crafted candle shapes against the TA-Lib candle-setting thresholds.
  * Baseline candles: o=10 c=11 h=11.5 l=9.5 → body 1, each shadow 0.5,
  * high-low 2. Derived thresholds after ≥10 of those: BodyLong/Short avg=1,
  * BodyDoji=0.2, ShadowVeryShort=0.2, ShadowShort=0.5, Near=0.4, Equal=0.1.
  */
class PatternsSpec extends AnyFunSuite {

  private val base = (10.0, 11.5, 9.5, 11.0) // o h l c

  private def run(specials: (Double, Double, Double, Double)*): Map[String, Int] = {
    val ev = new Patterns.Evaluator
    var out: Array[Int] = null
    (1 to 12).foreach(_ => out = ev.next(base._1, base._2, base._3, base._4))
    specials.foreach { case (o, h, l, c) => out = ev.next(o, h, l, c) }
    Patterns.names.zip(out).toMap
  }

  test("warm-up: patterns emit 0 before their lookback") {
    val ev = new Patterns.Evaluator
    val first = ev.next(10, 10.2, 9.0, 10.01) // a doji shape, but index 0
    assert(first.forall(_ == 0))
  }

  test("doji family fires on a tiny body with long shadows") {
    val m = run((10.0, 11.0, 9.0, 10.05))
    assert(m("CDLDOJI") == 100)
    assert(m("CDLLONGLEGGEDDOJI") == 100)
    assert(m("CDLSPINNINGTOP") == 100)
    assert(m("CDLHIGHWAVE") == 100)
    assert(m("CDLRICKSHAWMAN") == 100)
    assert(m("CDLDRAGONFLYDOJI") == 0) // upper shadow too long
    assert(m("CDLMARUBOZU") == 0)
  }

  test("dragonfly vs gravestone are mirror shapes") {
    val dragonfly = run((10.0, 10.05, 9.0, 10.02))
    assert(dragonfly("CDLDRAGONFLYDOJI") == 100)
    assert(dragonfly("CDLGRAVESTONEDOJI") == 0)
    assert(dragonfly("CDLTAKURI") == 100) // lower > 2x body qualifies
    val gravestone = run((10.0, 11.0, 9.98, 10.02))
    assert(gravestone("CDLGRAVESTONEDOJI") == 100)
    assert(gravestone("CDLDRAGONFLYDOJI") == 0)
  }

  test("marubozu family fires on a shadowless long body") {
    val m = run((10.0, 12.0, 10.0, 12.0))
    assert(m("CDLMARUBOZU") == 100)
    assert(m("CDLCLOSINGMARUBOZU") == 100)
    assert(m("CDLBELTHOLD") == 100)
    assert(m("CDLLONGLINE") == 100)
    assert(m("CDLDOJI") == 0)
    val black = run((12.0, 12.0, 10.0, 10.0))
    assert(black("CDLMARUBOZU") == -100)
  }

  test("bullish engulfing after a black candle") {
    val m = run((11.0, 11.1, 10.4, 10.5), (10.4, 11.3, 10.3, 11.1))
    assert(m("CDLENGULFING") == 100)
    val bear = run((10.4, 11.2, 10.3, 11.1), (11.2, 11.3, 10.2, 10.3))
    assert(bear("CDLENGULFING") == -100)
  }

  test("hammer needs the body near the prior low; hanging man near the prior high") {
    val hammer = run((9.8, 9.92, 9.0, 9.9))
    assert(hammer("CDLHAMMER") == 100)
    assert(hammer("CDLHANGINGMAN") == 0)
    val hanging = run((11.3, 11.42, 10.5, 11.4))
    assert(hanging("CDLHANGINGMAN") == -100)
    assert(hanging("CDLHAMMER") == 0)
  }

  test("harami: small body inside a long body, sign from the first candle") {
    // long white (body 2) then tiny inside body
    val m = run((10.0, 12.1, 9.9, 12.0), (11.0, 11.3, 10.7, 11.2))
    assert(m("CDLHARAMI") == -100)
    assert(m("CDLENGULFING") == 0)
  }

  test("piercing: white reclaims more than half of a long black body from below") {
    val m = run((12.0, 12.1, 9.9, 10.0), (9.8, 11.6, 9.7, 11.5))
    assert(m("CDLPIERCING") == 100)
    assert(m("CDLDARKCLOUDCOVER") == 0)
  }

  test("pattern evaluator output is in {-100, 0, 100} on random candles") {
    val ev = new Patterns.Evaluator
    val rnd = new scala.util.Random(3)
    (0 until 500).foreach { _ =>
      val c = 100 + rnd.nextGaussian() * 2
      val o = c + rnd.nextGaussian()
      val h = math.max(o, c) + math.abs(rnd.nextGaussian()) * 0.5
      val l = math.min(o, c) - math.abs(rnd.nextGaussian()) * 0.5
      val out = ev.next(o, h, l, c)
      assert(out.forall(v => v == -100 || v == 0 || v == 100))
    }
  }
}
