package graft.queries

import java.sql.Timestamp

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Micro-fixture semantics for the round-9 analytics additions: the ordered
  * funnel's strict-ordering rule and the linear-interpolation gap fill.
  * (The full queries are oracle-checked end-to-end; these pin the tricky
  * per-row rules on hand-written cases.)
  */
class FunnelInterpSpec extends SparkSpec {

  import spark.implicits._

  private def ts(s: String): Timestamp = Timestamp.valueOf(s)

  test("funnel strict ordering: clicks before the first view never count") {
    val e = Seq(
      // u1: view -> click -> purchase, fully ordered
      (1L, "view", ts("2024-01-01 10:00:00")),
      (1L, "click", ts("2024-01-01 10:05:00")),
      (1L, "purchase", ts("2024-01-01 10:10:00")),
      // u2: click BEFORE first view -> click step not reached
      (2L, "click", ts("2024-01-01 09:00:00")),
      (2L, "view", ts("2024-01-01 10:00:00")),
      (2L, "purchase", ts("2024-01-01 11:00:00")),
      // u3: view only
      (3L, "view", ts("2024-01-01 10:00:00")),
      // u4: purchase between view and click -> purchase-after-click missing
      (4L, "view", ts("2024-01-01 10:00:00")),
      (4L, "purchase", ts("2024-01-01 10:01:00")),
      (4L, "click", ts("2024-01-01 10:02:00")))
      .toDF("user_id", "event_type", "ts")

    val t1 = e.filter(col("event_type") === "view")
      .groupBy(col("user_id")).agg(min(col("ts")).as("t1"))
    val t2 = e.filter(col("event_type") === "click")
      .join(t1, "user_id").filter(col("ts") > col("t1"))
      .groupBy(col("user_id")).agg(min(col("ts")).as("t2"))
    val t3 = e.filter(col("event_type") === "purchase")
      .join(t2, "user_id").filter(col("ts") > col("t2"))
      .groupBy(col("user_id")).agg(min(col("ts")).as("t3"))
    val r = t1.join(t2, Seq("user_id"), "left").join(t3, Seq("user_id"), "left")
      .agg(count(col("t1")).as("n1"), count(col("t2")).as("n2"), count(col("t3")).as("n3"))
      .head()
    assert(r.getLong(0) === 4L) // all four viewed
    assert(r.getLong(1) === 2L) // u1 and u4 clicked after viewing
    assert(r.getLong(2) === 1L) // only u1 purchased after the click
  }

  test("TWAP clips intervals at the hour boundary and extends the last tick") {
    // one symbol, hour 0: ticks at t=0s (price 10) and t=1800s (price 20);
    // next tick is in hour 1 at t=3600+1800 (price 30, extends to hour end).
    // hour 0: 10*1800 + 20*1800 over 3600 -> 15.0 (second interval CLIPPED
    // at the boundary); hour 1: single tick from 1800 to hour end -> 30.0
    val us = (s: Long) => s * 1000000L
    val t = Seq((us(0), 10.0), (us(1800), 20.0), (us(3600 + 1800), 30.0))
      .toDF("us", "price").withColumn("symbol", lit("A")).withColumn("seq", col("us"))
    val w = Window.partitionBy(col("symbol")).orderBy(col("us"), col("seq"))
    val base = t.withColumn("next_us", lead(col("us"), 1).over(w))
      .withColumn("hour", expr("us div 3600000000"))
      .withColumn("hend", (col("hour") + 1) * lit(3600000000L))
      .withColumn("dt_us",
        least(coalesce(col("next_us"), col("hend")), col("hend")) - col("us"))
    val out = base.groupBy(col("hour"))
      .agg((sum(col("price") * col("dt_us")) / sum(col("dt_us"))).as("twap"))
      .orderBy("hour").as[(Long, Double)].collect().toSeq
    assert(out === Seq((0L, 15.0), (1L, 30.0)))
  }

  test("linear interpolation fills interior gaps exactly") {
    // closes at buckets 0 and 4: 10.0 -> 20.0; gaps at 1,2,3 interpolate
    // to 12.5, 15.0, 17.5
    val c = Seq(("A", 0L, Some(10.0)), ("A", 1L, None), ("A", 2L, None),
      ("A", 3L, None), ("A", 4L, Some(20.0)))
      .toDF("symbol", "bucket", "close")
    val back = Window.partitionBy(col("symbol")).orderBy(col("bucket"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val fwd = Window.partitionBy(col("symbol")).orderBy(col("bucket"))
      .rowsBetween(Window.currentRow, Window.unboundedFollowing)
    val j = c.select(col("symbol"), col("bucket"), col("close"),
      last(col("close"), ignoreNulls = true).over(back).as("pc"),
      last(when(col("close").isNotNull, col("bucket")), ignoreNulls = true)
        .over(back).as("pb"),
      first(col("close"), ignoreNulls = true).over(fwd).as("nc"),
      first(when(col("close").isNotNull, col("bucket")), ignoreNulls = true)
        .over(fwd).as("nb"))
    val frac = (col("bucket") - col("pb")).cast("double") /
      (col("nb") - col("pb")).cast("double")
    val out = j.select(col("bucket"),
      when(col("close").isNotNull, col("close"))
        .otherwise(col("pc") + (col("nc") - col("pc")) * frac).as("v"))
      .orderBy("bucket").as[(Long, Double)].collect().toSeq
    assert(out === Seq((0L, 10.0), (1L, 12.5), (2L, 15.0), (3L, 17.5), (4L, 20.0)))
  }
}
