package graft.streaming

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Pins the streaming HLL to the batch sketch query bit-for-bit: same
  * registers, same estimate doubles, same integer rounding — the in-sync
  * guarantee the shared oracle SQL relies on.
  */
class StreamingSketchSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  test("stream registers + estimate ≡ batch query rows, bit-for-bit") {
    import spark.implicits._
    implicit val ctx: org.apache.spark.sql.SQLContext = spark.sqlContext

    val batch = graft.queries.Registry.queries("sk_hll_distinct")(spark, dir)
      .select(col("event_type"), col("v_zero"), col("hll_raw"), col("hll_est"))

    val ev = graft.core.Tables.events(spark, dir)
      .select(col("event_type"), col("user_id").cast("long").as("user_id"))
    val types = ev.select(col("event_type")).distinct().collect().map(_.getString(0)).toSeq

    val name = s"hll_spec_${System.nanoTime}"
    val in = MemoryStream[(String, Long, Boolean)]
    val q = StreamingSketch.hllDistinctStream(
        in.toDF().toDF("event_type", "user_id", "is_sentinel"))
      .writeStream.format("memory").queryName(name).outputMode("append").start()
    try {
      // two slices so registers round-trip the state store between batches
      val rows = ev.as[(String, Long)].collect().toSeq.map { case (t, u) => (t, u, false) }
      val (first, second) = rows.splitAt(rows.size / 2)
      in.addData(first); q.processAllAvailable()
      in.addData(second); q.processAllAvailable()
      in.addData(types.map(t => (t, 0L, true))); q.processAllAvailable()
    } finally q.stop()

    val stream = spark.table(name)
    assert(stream.count() === types.size.toLong, "exactly one emission per group")
    assert(batch.except(stream).isEmpty && stream.except(batch).isEmpty,
      "stream rows must equal batch rows exactly")
  }

  test("sentinel rows do not disturb the registers; negative ids are DATA") {
    import spark.implicits._
    implicit val ctx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val name = s"hll_sentinel_${System.nanoTime}"
    val in = MemoryStream[(String, Long, Boolean)]
    val q = StreamingSketch.hllDistinctStream(
        in.toDF().toDF("event_type", "user_id", "is_sentinel"))
      .writeStream.format("memory").queryName(name).outputMode("append").start()
    try {
      // a negative id is a legitimate key (flag carries the sentinel role)
      in.addData(Seq(("a", 5L, false), ("a", -6L, false))); q.processAllAvailable()
      in.addData(Seq(("a", 0L, true))); q.processAllAvailable()
      // emitting again after more sentinels yields the same registers
      in.addData(Seq(("a", 0L, true))); q.processAllAvailable()
    } finally q.stop()
    val rows = spark.table(name).select("v_zero", "hll_raw", "hll_est").collect()
    assert(rows.length === 2 && rows(0) === rows(1),
      "sentinels must be no-ops on state")
    assert(rows(0).getLong(0) === 254L,
      "both the positive AND the negative id must have populated a register")
  }

  test("hist quantiles: empty-state flush emits nothing; negatives bin by floor") {
    import spark.implicits._
    implicit val ctx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val name = s"hist_empty_${System.nanoTime}"
    val in = MemoryStream[(String, Long, Boolean)]
    val q = StreamingSketch.histQuantileStream(
        in.toDF().toDF("event_type", "cents", "is_sentinel"), Seq(500))
      .writeStream.format("memory").queryName(name).outputMode("append").start()
    try {
      // group "empty" gets ONLY a sentinel — must emit zero rows, not NaN
      in.addData(Seq(("empty", 0L, true))); q.processAllAvailable()
      // group "neg": cents -150 must land in bin -2 (floor), not -1
      // (truncation) — four rows all in bin -2 make p50 interpolate inside
      // it: est = -2 + rank/cnt = -2 + 2/4 = -1.5
      in.addData(Seq(("neg", -150L, false), ("neg", -140L, false),
        ("neg", -130L, false), ("neg", -120L, false)))
      q.processAllAvailable()
      in.addData(Seq(("neg", 0L, true))); q.processAllAvailable()
    } finally q.stop()
    val rows = spark.table(name).collect()
    assert(!rows.exists(_.getString(0) == "empty"), "empty-state flush must be silent")
    val negP50 = rows.find(_.getString(0) == "neg").get
    assert(negP50.getDouble(4) === -1.5, "floor binning: all four in bin -2")
  }
}
