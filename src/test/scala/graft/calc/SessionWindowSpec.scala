package graft.calc

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Session-window extension: gap semantics (incl. the exactly-at-gap tie),
  * batch/streaming equivalence, and watermark-closed emission.
  */
class SessionWindowSpec extends SparkSpec {

  private def ts(s: String) = Timestamp.valueOf(s)

  private val gap = "5 minutes"

  test("a tick at exactly prev + gap MERGES; one microsecond past it splits") {
    val session = spark
    import session.implicits._
    // Spark extends a session when the next event lands exactly ON its end
    // (closed-on-touch), so the oracle's gaps-and-islands break must be
    // strictly-greater — this pins the engine behavior the oracle mirrors.
    val rows = Seq(
      ("A", ts("2024-01-01 10:00:00"), 1.0),
      ("A", ts("2024-01-01 10:04:59"), 2.0),
      ("A", ts("2024-01-01 10:09:59"), 3.0), // exactly gap after prev: merges
      ("A", Timestamp.valueOf("2024-01-01 10:14:59.000001"), 4.0)) // 1 µs past: splits
    val out = rows.toDF("symbol", "timestamp", "price")
      .groupBy(col("symbol"), session_window(col("timestamp"), gap).as("sw"))
      .agg(count(lit(1)).as("n"))
      .select(col("sw.start").as("s"), col("sw.end").as("e"), col("n"))
      .orderBy("s").collect()
    assert(out.length == 2, s"expected 2 sessions, got ${out.toSeq}")
    assert(out(0).getTimestamp(0) == ts("2024-01-01 10:00:00"))
    assert(out(0).getTimestamp(1) == ts("2024-01-01 10:14:59"))
    assert(out(0).getLong(2) == 3)
    assert(out(1).getTimestamp(0) == Timestamp.valueOf("2024-01-01 10:14:59.000001"))
    assert(out(1).getLong(2) == 1)
  }

  test("sessions are per-symbol: interleaved symbols never merge") {
    val session = spark
    import session.implicits._
    val rows = Seq(
      ("A", ts("2024-01-01 10:00:00"), 1.0),
      ("B", ts("2024-01-01 10:01:00"), 1.0),
      ("A", ts("2024-01-01 10:02:00"), 1.0))
    val out = rows.toDF("symbol", "timestamp", "price")
      .groupBy(col("symbol"), session_window(col("timestamp"), gap))
      .agg(count(lit(1)).as("n"))
      .select(col("symbol"), col("n")).collect()
    assert(out.map(r => (r.getString(0), r.getLong(1))).toSet == Set(("A", 2L), ("B", 1L)))
  }

  test("streaming session_window with watermark emits closed sessions equal to batch") {
    val session = spark
    import session.implicits._
    implicit val ctx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val rows = Seq(
      ("A", ts("2024-01-01 10:00:00"), 2.0),
      ("A", ts("2024-01-01 10:01:00"), 4.0),
      ("B", ts("2024-01-01 10:00:30"), 1.0),
      ("A", ts("2024-01-01 10:30:00"), 8.0), // new session, advances watermark
      ("A", ts("2024-01-01 12:00:00"), 9.0)) // far future: closes everything prior
    val in = MemoryStream[(String, Timestamp, Double)]
    val name = s"sessw_spec_${System.nanoTime}"
    val q = in.toDF().toDF("symbol", "timestamp", "price")
      .withWatermark("timestamp", "0 seconds")
      .groupBy(col("symbol"), session_window(col("timestamp"), gap).as("sw"))
      .agg(count(lit(1)).as("n"), sum(col("price")).as("p"))
      .select(col("symbol"), col("sw.start").as("s"), col("sw.end").as("e"),
        col("n"), col("p"))
      .writeStream.format("memory").queryName(name).outputMode("append").start()
    try {
      rows.grouped(2).foreach { sl => in.addData(sl); q.processAllAvailable() }
    } finally q.stop()
    val streamed = spark.table(name)
      .select(col("symbol"), col("s"), col("e"), col("n"), col("p"))
      .collect().map(r => (r.getString(0), r.getTimestamp(1), r.getTimestamp(2),
        r.getLong(3), r.getDouble(4))).toSet
    val batch = rows.toDF("symbol", "timestamp", "price")
      .groupBy(col("symbol"), session_window(col("timestamp"), gap).as("sw"))
      .agg(count(lit(1)).as("n"), sum(col("price")).as("p"))
      .select(col("symbol"), col("sw.start"), col("sw.end"), col("n"), col("p"))
      .collect().map(r => (r.getString(0), r.getTimestamp(1), r.getTimestamp(2),
        r.getLong(3), r.getDouble(4))).toSet
    // every closed streaming session matches a batch session exactly; only
    // the still-open tail session (the 12:00 singleton) may be missing
    assert(streamed.subsetOf(batch), s"streamed=$streamed batch=$batch")
    val open = batch -- streamed
    assert(open.forall(_._2 == ts("2024-01-01 12:00:00")),
      s"unexpected unclosed sessions: $open")
  }
}
