package graft.operators

import java.sql.Timestamp

import graft.SparkSpec

/** Bucketed as-of join ≡ plain as-of join, including events in buckets with
  * no reference rows (the carry must propagate across empty buckets) and
  * events before any reference row (null payload).
  */
class AsOfJoinSpec extends SparkSpec {

  test("asOfBucketed equals asOf across empty buckets") {
    val session = spark
    import session.implicits._
    val rnd = new scala.util.Random(7)
    val t0 = Timestamp.valueOf("2024-03-04 00:00:00").getTime

    // right: sparse quotes — none in hours 2-3 (empty buckets at 1h grain)
    val right = (0 until 400).flatMap { i =>
      val h = i % 8
      if (h == 2 || h == 3) None
      else Some(("S" + i % 3, new Timestamp(t0 + h * 3600000L + (i / 8) * 60000L),
        100.0 + rnd.nextInt(1000) / 10.0))
    }.toDF("symbol", "timestamp", "quote")

    // left: events spread over all 8 hours, incl. before the first quote
    val left = (0 until 1000).map { i =>
      ("S" + i % 3, new Timestamp(t0 - 1800000L + i * 27000L), i.toLong)
    }.toDF("symbol", "timestamp", "event_id")

    val plain = AsOfJoin.asOf(left, right, "symbol", "timestamp", Seq("quote"))
      .orderBy("symbol", "timestamp").collect()
    val bucketed = AsOfJoin.asOfBucketed(left, right, "symbol", "timestamp",
      Seq("quote"), bucketSeconds = 3600)
      .orderBy("symbol", "timestamp").collect()

    assert(plain.length == 1000 && bucketed.length == 1000)
    assert(plain.exists(_.isNullAt(3)), "events before any quote keep null payload")
    assert(plain.sameElements(bucketed))
  }
}
