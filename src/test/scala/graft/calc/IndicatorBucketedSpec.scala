package graft.calc

import java.sql.Timestamp

import graft.SparkSpec

/** Bucketed (warm-up-overlap) H-pass ≡ unbucketed single pass, on a
  * 2-symbol × 3-bucket frame: the scheme of candle_to_calcs.py:647-691.
  * Doubles agree to the warm-up truncation bound (≤ ~5e-9 relative for
  * T3(60) at 960 warm-up rows — see [[IndicatorPass.BucketSpec]]); flag ints
  * agree exactly.
  */
class IndicatorBucketedSpec extends SparkSpec {

  private def mkCandles(sym: String, seed: Int, n: Int): Seq[(String, Timestamp, Double, Double, Double, Double)] = {
    val rnd = new scala.util.Random(seed)
    var price = 100.0
    val t0 = Timestamp.valueOf("2024-03-04 00:00:00").getTime
    (0 until n).map { i =>
      val drift = rnd.nextGaussian() * 0.8
      val o = price
      val c = price + drift
      val h = math.max(o, c) + rnd.nextDouble() * 0.5
      val l = math.min(o, c) - rnd.nextDouble() * 0.5
      price = c
      (sym, new Timestamp(t0 + i * 1000L), o, h, l, c)
    }
  }

  test("bucketed pass survives empty buckets (cold restart after a gap)") {
    val session = spark
    import session.implicits._
    // 1h of candles, a 5h hole, then 1h more: the post-gap bucket gets no
    // warm-up rows and must restart cold without losing or crashing rows
    val rows = mkCandles("GAP", 3, 3600) ++
      mkCandles("GAP", 4, 3600).map { c =>
        c.copy(_2 = new Timestamp(c._2.getTime + 6 * 3600 * 1000L))
      }
    val df = rows.toDF("symbol", "timestamp", "open", "high", "low", "close")
    val out = IndicatorPass.withIndicators(df,
      bucket = Some(IndicatorPass.BucketSpec(bucketSeconds = 3600, warmupRows = 960)))
    assert(out.count() == 7200)
  }

  test("bucketed indicator pass matches the single-pass result") {
    val session = spark
    import session.implicits._
    val n = 10800 // 3 hours of 1s candles -> 3 one-hour buckets
    val df = (mkCandles("AAA", 1, n) ++ mkCandles("BBB", 2, n))
      .toDF("symbol", "timestamp", "open", "high", "low", "close")

    val flat = IndicatorPass.withIndicators(df, patterns = true)
    val bucketed = IndicatorPass.withIndicators(df, patterns = true,
      bucket = Some(IndicatorPass.BucketSpec(bucketSeconds = 3600, warmupRows = 960)))

    val cols = flat.columns
    def keyed(r: org.apache.spark.sql.Row) = (r.getString(0), r.getTimestamp(1))
    val a = flat.collect().map(r => keyed(r) -> r).toMap
    val b = bucketed.collect().map(r => keyed(r) -> r).toMap
    assert(a.size == 2 * n && b.size == a.size)

    var worst = 0.0
    a.foreach { case (k, ra) =>
      val rb = b(k)
      cols.indices.drop(2).foreach { i =>
        (ra.get(i), rb.get(i)) match {
          case (x: Double, y: Double) =>
            val denom = math.max(1.0, math.abs(x))
            worst = math.max(worst, math.abs(x - y) / denom)
            assert(math.abs(x - y) / denom < 1e-6,
              s"$k ${cols(i)}: $x vs $y")
          case (x, y) => assert(x == y, s"$k ${cols(i)}: $x vs $y")
        }
      }
    }
    info(f"worst relative divergence: $worst%.3e")
  }
}
