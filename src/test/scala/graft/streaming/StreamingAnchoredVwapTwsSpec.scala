package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.SparkSpec

/** The capability the timer-flush TWS pass adds over the sentinel-based
  * fMGWS pass: a symbol that goes QUIET still flushes its chunk's anchors
  * once OTHER symbols' data pushes the global watermark past the chunk-end
  * boundary — no per-symbol sentinel row ever enters its state.
  */
class StreamingAnchoredVwapTwsSpec extends SparkSpec {

  test("quiet symbol flushes via event-time timer, no sentinel in its state") {
    val session = spark
    import session.implicits._
    implicit val ctx: org.apache.spark.sql.SQLContext = session.sqlContext

    // Eastern 4am = 09:00 UTC in January. Symbol QUIET anchors at its 4am
    // trigger then goes silent; symbol LOUD keeps trading into the NEXT
    // 30-day chunk, dragging the watermark past QUIET's chunk end.
    def c(sym: String, ts: String, close: Double) =
      (sym, Timestamp.valueOf(ts), close, 100.0)
    val chunk1 = Seq(
      c("QUIET", "2024-01-08 09:00:01", 10.0),
      c("QUIET", "2024-01-08 09:30:00", 11.0),
      c("LOUD", "2024-01-08 09:00:02", 20.0),
      c("LOUD", "2024-01-08 12:00:00", 21.0))
    // chunk boundary for origin-0 30-day chunks nearest these dates:
    // floor(2024-01-08/30d) chunk ends 2024-01-25T00:00Z (verified below)
    val chunkUs = graft.calc.AnchorSnapshots.chunkUs()
    val t0Us = Timestamp.valueOf("2024-01-08 09:00:01").getTime * 1000L
    val chunkEndUs = (Math.floorDiv(t0Us, chunkUs) + 1) * chunkUs
    val nextChunkTs = new Timestamp(chunkEndUs / 1000L + 86400L * 1000L)
    val later = Seq(("LOUD", nextChunkTs, 22.0, 100.0))

    val providerKey = "spark.sql.streaming.stateStore.providerClass"
    val prev = session.conf.getOption(providerKey)
    session.conf.set(providerKey,
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    val in = MemoryStream[(String, Timestamp, Double, Double)]
    val q = StreamingAnchoredVwapTws.anchoredVwapStream(
        in.toDF().toDF("symbol", "timestamp", "close", "volume")
          .withWatermark("timestamp", "5 seconds"))
      .writeStream.format("memory").queryName("tws_quiet")
      .outputMode("append").start()
    try {
      in.addData(chunk1); q.processAllAvailable()
      // QUIET sends nothing more; LOUD's next-chunk row advances the
      // watermark past the chunk end -> QUIET's timer fires
      in.addData(later); q.processAllAvailable()
      val out = session.table("tws_quiet")
      val quiet = out.filter(col("symbol") === "QUIET").collect()
      assert(quiet.length === 1, s"expected QUIET's 4am anchor, got ${quiet.toSeq}")
      val r = quiet.head
      assert(r.getString(2) === "daily_4am")
      assert(r.getDouble(5) === 10.0) // price at anchor
      // snapshot row = QUIET's LAST row (09:30), proving the flush state
      // was closed by the timer, not by any QUIET-side sentinel
      assert(r.getTimestamp(6) === Timestamp.valueOf("2024-01-08 09:30:00"))
      // anchored VWAP over both QUIET rows: (10*100 + 11*100) / 200 = 10.5
      assert(math.abs(r.getDouble(8) - 10.5) < 1e-12)
      // LOUD's chunk-1 anchor flushes too (via its own arrival rollover)
      val loud = out.filter(col("symbol") === "LOUD").collect()
      assert(loud.length === 1 && loud.head.getString(2) === "daily_4am")
    } finally {
      q.stop()
      prev match {
        case Some(v) => session.conf.set(providerKey, v)
        case None => session.conf.unset(providerKey)
      }
    }
  }
}
