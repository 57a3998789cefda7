package graft.calc

import java.sql.Timestamp

import org.apache.spark.sql.functions._

import graft.SparkSpec

class SessionLabelsSpec extends SparkSpec {
  import spark.implicits._

  private def labeledRow(utc: String) = {
    val df = Seq(("A", Timestamp.valueOf(utc))).toDF("symbol", "timestamp")
    SessionLabels.withSessionLabels(df).collect().head
  }

  private def hot(utc: String): Seq[String] = {
    val r = labeledRow(utc)
    SessionLabels.labelNames.filter(n => r.getAs[Int](n) == 1)
  }

  test("exactly one session flag fires per row, with reference boundaries") {
    // EST (UTC-5): 14:30 UTC = 09:30 NY → is_morning's inclusive lower bound
    assert(hot("2024-01-16 14:30:00") == Seq("is_morning"))
    assert(hot("2024-01-16 14:29:59") == Seq("is_premarket_morn"))
    // closing is 16:30–17:00 INCLUSIVE (candle_to_calcs.py:376)
    assert(hot("2024-01-16 22:00:00") == Seq("is_closing")) // 17:00 NY
    assert(hot("2024-01-16 22:01:00") == Seq("is_afterhours")) // 17:01 NY
    assert(hot("2024-01-16 09:00:00") == Seq("is_early_morning")) // 04:00 NY
  }

  test("DST-aware conversion: EDT days shift the same UTC instant by an hour") {
    // 2023-03-12 is the spring-forward day; 07:00 UTC = 02:00 EST pre-shift...
    // after 2023-03-12 02:00 EST, NY is UTC-4: 14:30 UTC = 10:30 EDT
    assert(hot("2023-03-13 14:30:00") == Seq("is_morning")) // 10:30 EDT
    assert(hot("2023-11-06 14:30:00") == Seq("is_morning")) // 09:30 EST after fall-back
    assert(hot("2023-11-03 13:30:00") == Seq("is_morning")) // 09:30 EDT before fall-back
    // local_date crosses midnight correctly: 2024-01-17 03:00 UTC = Jan 16 22:00 NY
    val r = labeledRow("2024-01-17 03:00:00")
    assert(r.getAs[java.sql.Date]("local_date").toString == "2024-01-16")
  }

  test("every minute of a day maps to exactly one bucket") {
    val rows = (0 until 1440).map { m =>
      ("A", Timestamp.valueOf(f"2024-01-16 ${m / 60}%02d:${m % 60}%02d:00"))
    }.toDF("symbol", "timestamp")
    // interpret the timestamps as NY-local by shifting: use a fixed EST day (UTC-5)
    val labeled = SessionLabels.withSessionLabels(
      rows.withColumn("timestamp", col("timestamp") + expr("INTERVAL 5 HOURS")))
    val sumExpr = SessionLabels.labelNames.map(n => sum(col(n))).reduce(_ + _)
    assert(labeled.agg(sumExpr).as[Long].head() == 1440L)
  }
}
