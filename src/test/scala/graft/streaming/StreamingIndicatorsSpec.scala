package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.calc.IndicatorPass

/** Batch ≡ stream for the stateful H-family pass: the same candles fed as
  * 1-minute micro-batches (the reference's stream slicing,
  * candle_to_calcs.py:750-755) through flatMapGroupsWithState must produce
  * bit-identical indicator columns — the kernel state is carried across
  * batches through kryo serialization, so this also proves the state
  * round-trips losslessly.
  */
class StreamingIndicatorsSpec extends SparkSpec {

  private def mkCandles(sym: String, seed: Int, n: Int): Seq[(String, Timestamp, Double, Double, Double, Double)] = {
    val rnd = new scala.util.Random(seed)
    var price = 100.0
    val t0 = Timestamp.valueOf("2024-03-04 00:00:00").getTime
    (0 until n).map { i =>
      val o = price
      val c = price + rnd.nextGaussian() * 0.8
      val h = math.max(o, c) + rnd.nextDouble() * 0.5
      val l = math.min(o, c) - rnd.nextDouble() * 0.5
      price = c
      (sym, new Timestamp(t0 + i * 1000L), o, h, l, c)
    }
  }

  test("streaming indicator pass with patterns equals the batch pass") {
    val session = spark
    import session.implicits._
    implicit val ctx: org.apache.spark.sql.SQLContext = session.sqlContext

    val all = mkCandles("AAA", 1, 600) ++ mkCandles("BBB", 2, 600)
    val input = MemoryStream[(String, Timestamp, Double, Double, Double, Double)]
    val stream = input.toDF().toDF("symbol", "timestamp", "open", "high", "low", "close")

    val q = StreamingIndicators.indicatorStream(stream, patterns = true)
      .writeStream.format("memory").queryName("ind_stream")
      .outputMode("append").start()
    try {
      all.groupBy(_._2.getTime / 60000).toSeq.sortBy(_._1).foreach { case (_, slice) =>
        input.addData(slice)
        q.processAllAvailable()
      }
      val batch = IndicatorPass.withIndicators(
        all.toDF("symbol", "timestamp", "open", "high", "low", "close"), patterns = true)
      val cols = batch.columns.map(c => col(s"`$c`")).toSeq
      val s = session.table("ind_stream").select(cols: _*)
        .orderBy("symbol", "timestamp").collect()
      val b = batch.select(cols: _*).orderBy("symbol", "timestamp").collect()
      assert(s.length == 1200 && b.length == 1200)
      s.zip(b).foreach { case (x, y) => assert(x == y) }
    } finally q.stop()
  }
}
