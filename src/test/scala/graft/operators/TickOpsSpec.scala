package graft.operators

import java.sql.Timestamp

import org.apache.spark.sql.functions._

import graft.SparkSpec

class TickOpsSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)

  test("G5: keep-last dedup keeps the highest-priority row and is idempotent") {
    val df = Seq(
      ("A", ts("2024-01-01 00:00:00"), 1.0, 1.0, 1L),
      ("A", ts("2024-01-01 00:00:00"), 2.0, 1.0, 2L), // same key, later seq wins
      ("B", ts("2024-01-01 00:00:00"), 3.0, 1.0, 3L)
    ).toDF("symbol", "timestamp", "price", "volume", "seq")
    val out = TickOps.dedupKeepLast(df, Seq("symbol", "timestamp"), Seq(col("seq")))
    assert(out.count() == 2)
    assert(out.filter($"symbol" === "A").select("price").as[Double].head() == 2.0)
    val again = TickOps.dedupKeepLast(out, Seq("symbol", "timestamp"), Seq(col("seq")))
    assert(again.count() == 2)
  }

  test("J2: mergeKeepNew upserts — new rows win on key collisions, old survive otherwise") {
    val old = Seq(
      ("A", ts("2024-01-01 00:00:00"), 1.0),
      ("A", ts("2024-01-01 00:00:01"), 2.0)).toDF("symbol", "timestamp", "price")
    val fresh = Seq(
      ("A", ts("2024-01-01 00:00:01"), 20.0),
      ("A", ts("2024-01-01 00:00:02"), 30.0)).toDF("symbol", "timestamp", "price")
    val merged = TickOps.mergeKeepNew(old, fresh, Seq("symbol", "timestamp"))
      .orderBy("timestamp").select("price").as[Double].collect()
    assert(merged.toSeq == Seq(1.0, 20.0, 30.0))
  }

  test("P1: validity split diverts nulls, nonpositive price, negative volume with reasons") {
    val df = Seq(
      ("A", ts("2024-01-01 00:00:00"), Some(1.0), Some(1.0)),
      ("A", ts("2024-01-01 00:00:01"), None, Some(1.0)),
      ("A", ts("2024-01-01 00:00:02"), Some(0.0), Some(1.0)),
      ("A", ts("2024-01-01 00:00:03"), Some(1.0), Some(-1.0))
    ).toDF("symbol", "timestamp", "price", "volume")
    val vf = TickOps.validate(df)
    assert(vf.valid.count() == 1)
    val reasons = vf.invalid.select("reject_reason").as[String].collect().sorted
    assert(reasons.toSeq == Seq("negative_volume", "nonpositive_price", "null_field"))
  }

  test("G3: audit aggregates count rows, invalids, distinct timestamps and span") {
    val df = Seq(
      ("A", ts("2024-01-01 00:00:00"), 1.0, 1.0),
      ("A", ts("2024-01-01 00:00:00"), 2.0, 1.0),
      ("A", ts("2024-01-01 00:00:05"), -2.0, 1.0)
    ).toDF("symbol", "timestamp", "price", "volume")
    val a = TickOps.audit(df).collect().head
    assert(a.getAs[Long]("total_rows") == 3L)
    assert(a.getAs[Long]("invalid_price_volume") == 1L)
    assert(a.getAs[Long]("distinct_timestamps") == 2L)
    assert(a.getAs[Timestamp]("max_ts") == ts("2024-01-01 00:00:05"))
  }
}
