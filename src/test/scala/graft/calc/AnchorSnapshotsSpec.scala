package graft.calc

import java.sql.Timestamp

import org.apache.spark.sql.functions._

import graft.SparkSpec

class AnchorSnapshotsSpec extends SparkSpec {
  import spark.implicits._

  // one NY trading day (2024-01-16, EST = UTC-5), one symbol, minute candles
  private def candle(hhmm: String, h: Double, l: Double, c: Double) = {
    val ts = Timestamp.valueOf(s"2024-01-16 $hhmm:00")
    ("A", ts, c, h, l, c, 1.0, 1L, c)
  }

  private lazy val out = {
    val rows = Seq(
      candle("08:55", 10.0, 9.0, 9.5), // 03:55 NY — day's first row
      candle("09:00", 10.5, 9.2, 9.8), // 04:00 NY → daily_4am trigger + new high
      candle("09:01", 12.0, 9.5, 11.0), // new daily high
      candle("09:02", 11.0, 8.5, 9.0), // new daily low
      candle("14:30", 11.5, 9.6, 10.0), // 09:30 NY → daily_930 trigger
      candle("21:00", 11.8, 9.7, 10.2) // 16:00 NY → daily_4pm; last row
    ).toDF("symbol", "timestamp", "open", "high", "low", "close",
      "volume", "number_of_trades", "vwap")
    AnchorSnapshots.anchoredVwapPoints(rows).collect()
  }

  test("produces the reference schema with anchored_vwap always null") {
    assert(out.nonEmpty)
    val cols = Seq("symbol", "timeframe", "anchor_type", "anchor_timestamp",
      "anchor_idx", "price_at_anchor", "current_snapshot_timestamp",
      "current_idx", "anchored_vwap")
    assert(out.head.schema.fieldNames.toSeq == cols)
    out.foreach(r => assert(r.isNullAt(r.fieldIndex("anchored_vwap"))))
    out.foreach(r => assert(r.getAs[String]("timeframe") == "1s"))
  }

  test("triggers anchor at the trigger row's close; peak/extreme collisions resolve by priority") {
    val byType = out.map(r => r.getAs[String]("anchor_type") -> r).toMap
    assert(byType("daily_4am").getAs[Double]("price_at_anchor") == 9.8)
    assert(byType("daily_930").getAs[Double]("price_at_anchor") == 10.0)
    assert(byType("daily_4pm").getAs[Double]("price_at_anchor") == 10.2)
    // the 09:01 row is the daily high AND a major peak; major_peak wins the
    // anchor_timestamp collision by the pinned priority
    assert(!byType.contains("daily_high"))
    assert(byType("major_peak").getAs[Double]("price_at_anchor") == 12.0)
    assert(byType("major_peak").getAs[Timestamp]("anchor_timestamp") ==
      Timestamp.valueOf("2024-01-16 09:01:00"))
    assert(byType("major_valley").getAs[Double]("price_at_anchor") == 8.5)
  }

  test("snapshot joins every anchor to the chunk's last row") {
    out.foreach { r =>
      assert(r.getAs[Timestamp]("current_snapshot_timestamp") ==
        Timestamp.valueOf("2024-01-16 21:00:00"))
      assert(r.getAs[Long]("current_idx") == 5L) // 6 rows, 0-based
    }
    // anchor_idx matches each anchor row's position
    val m = out.map(r => r.getAs[String]("anchor_type") -> r.getAs[Long]("anchor_idx")).toMap
    assert(m("daily_4am") == 1L && m("major_peak") == 2L && m("major_valley") == 3L)
  }

  test("dedup keeps one row per (symbol, timeframe, anchor_timestamp)") {
    val keys = out.map(r => (r.getAs[String]("symbol"), r.getAs[Timestamp]("anchor_timestamp")))
    assert(keys.distinct.length == keys.length)
  }
}
