package graft.sources

import scala.collection.mutable.ArrayBuffer

import graft.SparkSpec
import graft.sources.RestIngest._

/** S1–S3 driver-side ingest semantics at unit grain: skip pagination until a
  * short page, sliding-window rate limiting with an injected clock,
  * exponential 1→10 s retry backoff with per-cell failure records, and the
  * typed hand-off into Spark.
  */
class RestIngestSpec extends SparkSpec {

  private def tick(i: Int): RawTick = RawTick("NVDA", 1700000000000L + i, 100.0 + i, 1.0)

  test("fetchDay paginates by skip until an empty page and concatenates in order") {
    val total = 2 * 24000 + 137
    val calls = ArrayBuffer.empty[Int]
    val fetch = (_: String, skip: Int, limit: Int) => {
      calls += skip
      (skip until math.min(skip + limit, total)).map(tick)
    }
    val (rows, failure) = fetchDay("NVDA", "2024-01-02", fetch, new RateLimiter())
    assert(failure.isEmpty)
    // reference termination (empty page, not short page) with received-size
    // advance: the short page at 48000 (137 rows) resumes at 48137, and the
    // empty page there ends the loop
    assert(calls.toSeq == Seq(0, 24000, 48000, 48137))
    assert(rows.size == total)
    assert(rows.map(_.epochMs) == (0 until total).map(i => 1700000000000L + i))
  }

  test("a short-but-nonempty page resumes at the true offset — no silent gap") {
    val calls = ArrayBuffer.empty[Int]
    // server truncates the first response to 10k rows of a 30k-row day
    val total = 30000
    val fetch = (_: String, skip: Int, limit: Int) => {
      calls += skip
      val cap = if (skip == 0) 10000 else limit
      (skip until math.min(skip + math.min(cap, limit), total)).map(tick)
    }
    val (rows, failure) = fetchDay("NVDA", "2024-01-02", fetch, new RateLimiter())
    assert(failure.isEmpty)
    assert(rows.size == total, "every row must be fetched despite the truncated page")
    assert(rows.map(_.epochMs).distinct.size == total, "and none duplicated")
  }

  test("rate limiter sleeps exactly until the oldest call leaves the window") {
    var clock = 0L
    val sleeps = ArrayBuffer.empty[Long]
    val rl = new RateLimiter(maxCalls = 3, windowMs = 1000L,
      now = () => clock, sleep = ms => { sleeps += ms; clock += ms })
    rl.acquire(); clock += 10 // t=0
    rl.acquire(); clock += 10 // t=10
    rl.acquire(); clock += 10 // t=20
    rl.acquire() // window full: oldest at 0 ages out at 1000, now=30 → sleep 970
    assert(sleeps.toSeq == Seq(970L))
    clock += 10
    rl.acquire() // now=1010: the call at t=10 has aged out — no sleep
    assert(sleeps.size == 1)
  }

  test("retry backs off 1,2,4,8s (capped 10) and reports the last error") {
    val sleeps = ArrayBuffer.empty[Long]
    var n = 0
    val r = withRetry(sleep = sleeps += _) { () =>
      n += 1; throw new RuntimeException(s"boom $n")
    }
    assert(r == Left("boom 5"))
    assert(sleeps.toSeq == Seq(1000L, 2000L, 4000L, 8000L)) // none after the final attempt
    // success on attempt 3 stops retrying
    sleeps.clear(); n = 0
    val ok = withRetry(sleep = sleeps += _) { () =>
      n += 1; if (n < 3) throw new RuntimeException("x") else 42
    }
    assert(ok == Right(42) && sleeps.toSeq == Seq(1000L, 2000L))
  }

  test("a page that exhausts retries records a failure and keeps earlier pages") {
    val fetch = (_: String, skip: Int, limit: Int) =>
      if (skip == 0) (0 until limit).map(tick)
      else throw new RuntimeException("503")
    val (rows, failure) = fetchDay("NVDA", "2024-01-02", fetch, new RateLimiter(),
      retrySleep = _ => ())
    assert(rows.size == 24000)
    assert(failure.contains(FetchFailure("NVDA", "2024-01-02", "503")))
  }

  test("toDataFrame applies the S4 projection with millisecond timestamps") {
    val df = toDataFrame(spark, Seq(tick(0), tick(1500)))
    assert(df.columns.toSeq == Seq("symbol", "timestamp", "price", "volume"))
    val ts = df.orderBy("timestamp").collect().map(_.getTimestamp(1).getTime)
    assert(ts.toSeq == Seq(1700000000000L, 1700000001500L))
  }
}
