package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.operators.CandleAggregator

/** Batch ≡ stream equivalence for the G1 candle aggregation, replicating the
  * reference's 1-minute micro-batch slicing (candle_to_calcs.py:750-755): the
  * same ticks fed as per-minute MemoryStream batches must produce exactly the
  * batch result. The reference implicitly promises this by sharing
  * apply_all_calculations between batch and stream modes (SURVEY §5.5).
  */
class StreamingCandlesSpec extends SparkSpec {

  private def ts(s: String): Timestamp = Timestamp.valueOf(s)

  /** 2 symbols × 3 minutes of deterministic ticks, multiple per second,
    * deliberately including a zero-volume second for the VWAP-null guard.
    */
  private def mkTicks(): Seq[(String, Timestamp, Double, Double, Long)] =
    (0 until 180).flatMap { i =>
      val mm = i / 60
      val ss = i % 60
      Seq("AAA", "BBB").flatMap { sym =>
        val base = if (sym == "AAA") 100.0 else 50.0
        (0 until (i % 3 + 1)).map { k =>
          val t = ts(f"2024-03-01 10:$mm%02d:$ss%02d.${k * 250000}%06d")
          val vol = if (ss == 30) 0.0 else (i % 7 + k).toDouble
          (sym, t, base + math.sin(i * 0.1 + k) * 5, vol, (i * 10 + k).toLong)
        }
      }
    }

  test("streaming candles1s over 1-minute slices equals batch G1") {
    val session = spark
    import session.implicits._
    implicit val ctx: org.apache.spark.sql.SQLContext = session.sqlContext

    val all = mkTicks()
    val input = MemoryStream[(String, Timestamp, Double, Double, Long)]
    val stream = input.toDF().toDF("symbol", "timestamp", "price", "volume", "seq")

    val q = StreamingCandles.candles1s(stream, watermarkDelay = "5 seconds")
      .writeStream.format("memory").queryName("candles_stream")
      .outputMode("append").start()
    try {
      // 1-minute event-time slices, in order — the reference's stream loop
      all.groupBy(_._2.getTime / 60000).toSeq.sortBy(_._1).foreach { case (_, slice) =>
        input.addData(slice.sortBy(t => (t._2.getTime, t._5)))
        q.processAllAvailable()
      }
      // sentinel far past the end pushes the watermark over every real window
      input.addData(Seq(("ZZZ", ts("2024-03-01 11:00:00.0"), 1.0, 1.0, 99999L)))
      q.processAllAvailable()

      val streamed = session.table("candles_stream").filter(col("symbol") =!= "ZZZ")
      val batch = CandleAggregator.aggregate(
        all.toDF("symbol", "timestamp", "price", "volume", "seq"))

      val cols = batch.columns.sorted.map(col).toSeq
      val s = streamed.select(cols: _*).orderBy("symbol", "timestamp").collect()
      val b = batch.select(cols: _*).orderBy("symbol", "timestamp").collect()
      assert(s.length == b.length && s.length > 300)
      assert(s.sameElements(b))
    } finally q.stop()
  }

  test("dropDuplicatesWithinWatermark drops replayed ticks across micro-batches") {
    val session = spark
    import session.implicits._
    implicit val ctx: org.apache.spark.sql.SQLContext = session.sqlContext

    val input = MemoryStream[(String, Timestamp, Double, Double, Long)]
    val stream = input.toDF().toDF("symbol", "timestamp", "price", "volume", "seq")
    val q = StreamingCandles.dedupWithinWatermark(stream, "1 minute")
      .writeStream.format("memory").queryName("dedup_stream")
      .outputMode("append").start()
    try {
      val a = ("AAA", ts("2024-03-01 10:00:00.0"), 100.0, 1.0, 1L)
      val b = ("AAA", ts("2024-03-01 10:00:01.0"), 101.0, 1.0, 2L)
      input.addData(Seq(a, b, a)) // in-batch replay
      q.processAllAvailable()
      input.addData(Seq(a, b)) // cross-batch replay within the watermark
      q.processAllAvailable()
      assert(session.table("dedup_stream").count() == 2)
    } finally q.stop()
  }
}
