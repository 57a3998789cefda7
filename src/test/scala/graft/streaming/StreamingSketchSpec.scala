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
    val in = MemoryStream[(String, Long)]
    val q = StreamingSketch.hllDistinctStream(in.toDF().toDF("event_type", "user_id"))
      .writeStream.format("memory").queryName(name).outputMode("append").start()
    try {
      // two slices so registers round-trip the state store between batches
      val rows = ev.as[(String, Long)].collect().toSeq
      val (first, second) = rows.splitAt(rows.size / 2)
      in.addData(first); q.processAllAvailable()
      in.addData(second); q.processAllAvailable()
      in.addData(types.map(t => (t, -1L))); q.processAllAvailable()
    } finally q.stop()

    val stream = spark.table(name)
    assert(stream.count() === types.size.toLong, "exactly one emission per group")
    assert(batch.except(stream).isEmpty && stream.except(batch).isEmpty,
      "stream rows must equal batch rows exactly")
  }

  test("sentinel rows do not disturb the registers") {
    import spark.implicits._
    implicit val ctx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val name = s"hll_sentinel_${System.nanoTime}"
    val in = MemoryStream[(String, Long)]
    val q = StreamingSketch.hllDistinctStream(in.toDF().toDF("event_type", "user_id"))
      .writeStream.format("memory").queryName(name).outputMode("append").start()
    try {
      in.addData(Seq(("a", 5L), ("a", 6L))); q.processAllAvailable()
      in.addData(Seq(("a", -1L))); q.processAllAvailable()
      // emitting again after more sentinels yields the same registers
      in.addData(Seq(("a", -1L))); q.processAllAvailable()
    } finally q.stop()
    val rows = spark.table(name).select("v_zero", "hll_raw", "hll_est").collect()
    assert(rows.length === 2 && rows(0) === rows(1),
      "sentinels must be no-ops on state")
  }
}
