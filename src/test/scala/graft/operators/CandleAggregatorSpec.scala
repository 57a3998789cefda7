package graft.operators

import java.sql.Timestamp

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._

import graft.SparkSpec

class CandleAggregatorSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)

  private def ticks(rows: (String, String, Double, Double, Long)*) =
    rows.toDF("symbol", "tsStr", "price", "volume", "seq")
      .withColumn("timestamp", to_timestamp(col("tsStr"))).drop("tsStr")

  test("G1: open/close pinned by time, not row order; OHLCV and trade count") {
    // rows deliberately out of time order inside the bucket
    val df = ticks(
      ("A", "2024-01-01 00:00:00.500000", 11.0, 2.0, 2L),
      ("A", "2024-01-01 00:00:00.100000", 10.0, 1.0, 1L),
      ("A", "2024-01-01 00:00:00.900000", 9.0, 3.0, 3L))
    val c = CandleAggregator.aggregate(df).collect().head
    assert(c.getAs[Double]("open") == 10.0)
    assert(c.getAs[Double]("close") == 9.0)
    assert(c.getAs[Double]("high") == 11.0)
    assert(c.getAs[Double]("low") == 9.0)
    assert(c.getAs[Double]("volume") == 6.0)
    assert(c.getAs[Long]("number_of_trades") == 3L)
    // candle ts = FIRST TICK's ts, not the bucket start (reference quirk)
    assert(c.getAs[Timestamp]("timestamp") == ts("2024-01-01 00:00:00.1"))
    // vwap = (10*1 + 11*2 + 9*3) / 6
    assert(math.abs(c.getAs[Double]("vwap") - 59.0 / 6.0) < 1e-12)
  }

  test("G1: zero total volume yields null vwap (aggregator_candles.py:212)") {
    val df = ticks(
      ("A", "2024-01-01 00:00:01.000000", 10.0, 0.0, 1L),
      ("A", "2024-01-01 00:00:01.200000", 11.0, 0.0, 2L))
    val c = CandleAggregator.aggregate(df).collect().head
    assert(c.isNullAt(c.fieldIndex("vwap")))
    assert(c.getAs[Double]("volume") == 0.0)
  }

  test("G1: buckets split on the second boundary; symbols aggregate separately") {
    val df = ticks(
      ("A", "2024-01-01 00:00:00.999999", 1.0, 1.0, 1L),
      ("A", "2024-01-01 00:00:01.000000", 2.0, 1.0, 2L),
      ("B", "2024-01-01 00:00:00.500000", 3.0, 1.0, 3L))
    val out = CandleAggregator.aggregate(df).collect()
    assert(out.length == 3)
  }

  test("P3/P4: validity split diverts each rule; stage-2 check flags zero trades unconditionally") {
    val candles = Seq(
      ("A", ts("2024-01-01 00:00:00"), 1.0, 2.0, 1.0, 1.5, 5.0, 2L), // valid
      ("A", ts("2024-01-01 00:00:01"), 1.0, 0.5, 1.0, 1.5, 5.0, 2L), // high < low
      ("A", ts("2024-01-01 00:00:02"), -1.0, 2.0, 1.0, 1.5, 5.0, 2L), // open <= 0
      ("A", ts("2024-01-01 00:00:03"), 1.0, 2.0, 1.0, 1.5, -5.0, 2L), // volume < 0
      ("A", ts("2024-01-01 00:00:04"), 1.0, 2.0, 1.0, 1.5, 5.0, 0L) // 0 trades + volume
    ).toDF("symbol", "timestamp", "open", "high", "low", "close", "volume", "number_of_trades")
    val vf = CandleAggregator.validateCandles(candles)
    assert(vf.valid.count() == 1)
    val reasons = vf.invalid.select("reject_reason").as[String].collect().sorted
    assert(reasons.toSeq == Seq("high_lt_low", "negative_volume", "nonpositive_price", "trades_volume_mismatch"))
    // stage-2 variant: zero-trades is a violation even with zero volume
    val zeroTradesNoVol = Seq(("A", ts("2024-01-01 00:00:05"), 1.0, 2.0, 1.0, 1.5, 0.0, 0L))
      .toDF("symbol", "timestamp", "open", "high", "low", "close", "volume", "number_of_trades")
    assert(CandleAggregator.validateCandles(zeroTradesNoVol).valid.count() == 1)
    assert(CandleAggregator.invariantViolations(zeroTradesNoVol).count() == 1)
  }

  test("G2: 60s rollup over closes reproduces candle-of-candles semantics") {
    val df = ticks(
      ("A", "2024-01-01 00:00:10.000000", 10.0, 1.0, 1L),
      ("A", "2024-01-01 00:00:50.000000", 20.0, 1.0, 2L),
      ("A", "2024-01-01 00:01:10.000000", 30.0, 1.0, 3L))
    val c1 = CandleAggregator.aggregate(df)
    val c60 = CandleAggregator.aggregate(c1, seconds = 60, priceCol = "close")
      .orderBy("timestamp").collect()
    assert(c60.length == 2)
    assert(c60.head.getAs[Double]("open") == 10.0)
    assert(c60.head.getAs[Double]("close") == 20.0)
    assert(c60.head.getAs[Long]("number_of_trades") == 2L)
  }
}
