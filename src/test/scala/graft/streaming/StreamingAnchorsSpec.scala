package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.calc.{SessionLabels, WindowCalcs}

/** Streaming W13 ≡ batch W13: time-trigger anchors from a candle stream must
  * match the batch extraction on the same input, including the minute-exact
  * quirk (a day with no candle at the trigger minute gets no anchor).
  */
class StreamingAnchorsSpec extends SparkSpec {

  test("streaming time-trigger anchors equal the batch form") {
    val session = spark
    import session.implicits._
    implicit val ctx: org.apache.spark.sql.SQLContext = session.sqlContext

    // Eastern 4am = 09:00 UTC (EST, January). Two days × two symbols; day 2
    // deliberately missing the 4am trigger minute for one symbol.
    def c(sym: String, ts: String, close: Double) =
      (sym, Timestamp.valueOf(ts), close, close + 1, close - 1, close)
    val rows = Seq(
      c("AAA", "2024-01-08 09:00:02", 10), c("AAA", "2024-01-08 09:00:30", 11),
      c("AAA", "2024-01-08 14:30:00", 12), // 9:30 Eastern
      c("AAA", "2024-01-09 14:30:05", 13),
      c("BBB", "2024-01-08 09:00:59", 20),
      c("BBB", "2024-01-08 21:00:00", 21), // 4pm Eastern
      c("BBB", "2024-01-09 09:00:01", 22)
    )
    val df = rows.toDF("symbol", "timestamp", "open", "high", "low", "close")

    val input = MemoryStream[(String, Timestamp, Double, Double, Double, Double)]
    val stream = input.toDF().toDF("symbol", "timestamp", "open", "high", "low", "close")
    val q = StreamingAnchors.timeTriggerAnchors(stream, "5 seconds")
      .writeStream.format("memory").queryName("anchor_stream")
      .outputMode("append").start()
    try {
      // in-order arrival (the stream-mode contract): batches sliced by time
      rows.sortBy(_._2.getTime).grouped(3).foreach { slice =>
        input.addData(slice); q.processAllAvailable()
      }
      // two sentinel batches: the first advances the watermark past every
      // real window, the second gives the stateful operator the follow-up
      // micro-batch in which that watermark actually flushes
      input.addData(Seq(c("ZZZ", "2024-01-10 00:00:00", 1)))
      q.processAllAvailable()
      input.addData(Seq(c("ZZZ", "2024-01-10 01:00:00", 1)))
      q.processAllAvailable()

      val streamed = session.table("anchor_stream")
        .select("symbol", "anchor_type", "anchor_timestamp", "price_at_anchor")
        .orderBy("symbol", "anchor_timestamp").collect()
      val batch = WindowCalcs.timeTriggerAnchors(SessionLabels.withSessionLabels(df))
        .select("symbol", "anchor_type", "anchor_timestamp", "price_at_anchor")
        .orderBy("symbol", "anchor_timestamp").collect()
      assert(batch.length == 6) // AAA 4am+930 d1, 930 d2; BBB 4am+4pm d1, 4am d2
      assert(streamed.sameElements(batch))
    } finally q.stop()
  }
}
