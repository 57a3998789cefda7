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
    val hikkake = Patterns.names.indexOf("CDLHIKKAKEMOD")
    (0 until 500).foreach { _ =>
      val c = 100 + rnd.nextGaussian() * 2
      val o = c + rnd.nextGaussian()
      val h = math.max(o, c) + math.abs(rnd.nextGaussian()) * 0.5
      val l = math.min(o, c) - math.abs(rnd.nextGaussian()) * 0.5
      val out = ev.next(o, h, l, c)
      out.zipWithIndex.foreach { case (v, i) =>
        // HIKKAKEMOD confirmation bars emit ±200, exactly as TA-Lib does
        if (i == hikkake) assert(v == -200 || v == -100 || v == 0 || v == 100 || v == 200)
        else assert(v == -100 || v == 0 || v == 100)
      }
    }
  }

  test("the full reference surface: 59 patterns in reference group order") {
    assert(Patterns.count == 59)
    assert(Patterns.names.take(17).forall(n => n.startsWith("CDL")))
    // group boundaries per candle_to_calcs.py:458-507
    assert(Patterns.names(0) == "CDLDOJI")
    assert(Patterns.names(17) == "CDLHARAMI")
    assert(Patterns.names(36) == "CDL3WHITESOLDIERS")
    assert(Patterns.names(52) == "CDLRISEFALL3METHODS")
    assert(Patterns.names.distinct.length == 59)
  }

  test("on-neck / in-neck / thrusting split by how far the white closes into the black") {
    // long black (body 2), then a white opening below its low:
    val black = (11.5, 11.6, 9.4, 9.5)
    val onNeck = run(black, (9.2, 9.5, 9.1, 9.45)) // close ≈ prior low (±0.1)
    assert(onNeck("CDLONNECK") == -100)
    assert(onNeck("CDLINNECK") == 0)
    assert(onNeck("CDLTHRUSTING") == 0)
    val inNeck = run(black, (9.2, 9.6, 9.1, 9.55)) // close just into the body
    assert(inNeck("CDLINNECK") == -100)
    assert(inNeck("CDLONNECK") == 0)
    assert(inNeck("CDLTHRUSTING") == 0)
    val thrust = run(black, (9.2, 10.05, 9.1, 10.0)) // close < mid-body
    assert(thrust("CDLTHRUSTING") == -100)
    assert(thrust("CDLONNECK") == 0)
    assert(thrust("CDLINNECK") == 0)
    assert(thrust("CDLPIERCING") == 0) // not past the midpoint
  }

  test("counterattack: opposite long candles closing at the same level") {
    val m = run((11.5, 11.6, 9.4, 9.5), (8.3, 9.6, 8.2, 9.5))
    assert(m("CDLCOUNTERATTACK") == 100)
  }

  test("tasuki gap: opposite candle closes inside the still-open gap") {
    val m = run((11.2, 11.9, 11.15, 11.8), (11.5, 11.55, 11.05, 11.1))
    assert(m("CDLTASUKIGAP") == 100)
    // closing below the gap (into the pre-gap body) kills it
    val filled = run((11.2, 11.9, 11.15, 11.8), (11.5, 11.55, 10.4, 10.5))
    assert(filled("CDLTASUKIGAP") == 0)
  }

  test("three white soldiers: rising whites opening within the prior body") {
    val m = run(
      (10.8, 12.1, 10.7, 12.0),
      (11.5, 12.85, 11.4, 12.8),
      (12.2, 13.55, 12.1, 13.5))
    assert(m("CDL3WHITESOLDIERS") == 100)
    assert(m("CDLADVANCEBLOCK") == 0) // no weakness shown
  }

  test("three black crows: declining blacks with no lower shadow") {
    val m = run(
      (11.3, 11.35, 10.25, 10.3),
      (11.0, 11.05, 9.75, 9.8),
      (10.5, 10.55, 9.25, 9.3))
    assert(m("CDL3BLACKCROWS") == -100)
    assert(m("CDLIDENTICAL3CROWS") == 0) // opens are inside, not at, prior closes
  }

  test("abandoned baby bullish: doji shadow-gapped below a long black") {
    val m = run(
      (12.0, 12.05, 9.95, 10.0),
      (9.5, 9.6, 9.4, 9.52),
      (9.8, 10.95, 9.75, 10.9))
    assert(m("CDLABANDONEDBABY") == 100)
  }

  test("upside gap two crows") {
    val m = run(
      (10.0, 12.05, 9.95, 12.0),
      (12.5, 12.55, 12.25, 12.3),
      (12.7, 12.75, 12.05, 12.1))
    assert(m("CDLUPSIDEGAP2CROWS") == -100)
  }

  test("ladder bottom: white reversal closing above the shadowed black") {
    val m = run(
      (12.0, 12.05, 10.95, 11.0),
      (11.8, 11.85, 10.45, 10.5),
      (11.2, 11.25, 9.95, 10.0),
      (10.8, 11.3, 10.15, 10.2),
      (11.0, 11.55, 10.95, 11.5))
    assert(m("CDLLADDERBOTTOM") == 100)
  }

  test("upside gap three methods: third candle fills the gap") {
    val m = run(
      (11.3, 12.05, 11.25, 12.0),
      (11.7, 11.75, 10.45, 10.5))
    assert(m("CDLXSIDEGAP3METHODS") == 100)
  }

  test("rising three methods: three small blacks inside a long white's range") {
    val m = run(
      (10.0, 12.05, 9.95, 12.0),
      (11.9, 11.95, 11.55, 11.6),
      (11.5, 11.55, 11.15, 11.2),
      (11.1, 11.15, 10.75, 10.8),
      (11.0, 12.55, 10.95, 12.5))
    assert(m("CDLRISEFALL3METHODS") == 100)
    assert(m("CDLMATHOLD") == 0) // reaction days gap condition not met
  }

  test("modified hikkake: inside-inside fake break, then confirmation at +200") {
    val ev = new Patterns.Evaluator
    var out: Array[Int] = null
    (1 to 12).foreach(_ => out = ev.next(base._1, base._2, base._3, base._4))
    out = ev.next(10.9, 11.0, 9.8, 9.9) // inside base, close near bottom
    out = ev.next(10.7, 10.8, 10.0, 10.1) // inside that
    out = ev.next(10.5, 10.6, 9.7, 9.75) // breaks down → bullish hikkake
    val names = Patterns.names
    val hikkakeIdx = names.indexOf("CDLHIKKAKEMOD")
    assert(out(hikkakeIdx) == 100)
    out = ev.next(10.0, 11.05, 9.95, 11.0) // closes above 10.8 → confirmed
    assert(out(hikkakeIdx) == 200)
  }
}
