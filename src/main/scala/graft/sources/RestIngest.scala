package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Driver-side REST tick ingest (S1–S3): skip-paginated page fetch, a
  * sliding-window rate limiter, and retry-with-backoff, feeding Spark via
  * `createDataset` + the S4 columnar→row projection.
  *
  * These stages are deliberately NOT distributed operators: a rate-limited
  * REST crawl is a driver/ingestion-job concern (one coordinated budget
  * against one API), and Spark's own task retries cover executor-side
  * failures. What belongs to the engine is the hand-off — a typed local
  * Dataset with the same projection the parquet path uses. The transport is
  * injected (`fetchPage`) so pagination, limiting, and retry semantics are
  * fully testable without a network.
  *
  * Reference semantics pinned here: pages of 24 000 rows advanced by `skip`
  * until a short page (fetch_historical_trades_nvda.py:345-353), a sliding
  * 130-calls/min window (:84-94, :38), 5 attempts with exponential 1→10 s
  * backoff and per-(symbol, date) failure records instead of aborts
  * (:141-183, :42-44).
  */
object RestIngest {

  /** One wire-format tick: epoch-millis timestamp, price/volume doubles. */
  final case class RawTick(symbol: String, epochMs: Long, price: Double, volume: Double)

  /** A recorded fetch failure — the crawl continues past it. */
  final case class FetchFailure(symbol: String, date: String, error: String)

  /** Sliding-window rate limiter: at most `maxCalls` acquisitions in any
    * trailing `windowMs` span; an over-budget acquire sleeps until the
    * oldest call ages out. Clock and sleep are injected for tests.
    */
  final class RateLimiter(maxCalls: Int = 130, windowMs: Long = 60000L,
                          now: () => Long = () => System.currentTimeMillis(),
                          sleep: Long => Unit = Thread.sleep) {
    private val calls = scala.collection.mutable.Queue.empty[Long]
    def acquire(): Unit = synchronized {
      var t = now()
      calls.dequeueWhile(_ <= t - windowMs)
      if (calls.size >= maxCalls) {
        val wait = calls.head + windowMs - t
        if (wait > 0) sleep(wait)
        t = now()
        calls.dequeueWhile(_ <= t - windowMs)
      }
      calls.enqueue(t)
    }
  }

  /** Retry with exponential backoff (base<<attempt, capped): Right on the
    * first success, Left(last error) after `attempts` failures. No sleep
    * after the final attempt.
    */
  def withRetry[T](attempts: Int = 5, baseDelayMs: Long = 1000L, maxDelayMs: Long = 10000L,
                   sleep: Long => Unit = Thread.sleep)(f: () => T): Either[String, T] = {
    var last = ""
    var i = 0
    while (i < attempts) {
      try return Right(f())
      catch {
        case scala.util.control.NonFatal(e) =>
          last = String.valueOf(e.getMessage)
          if (i < attempts - 1) sleep(math.min(baseDelayMs << i, maxDelayMs))
      }
      i += 1
    }
    Left(last)
  }

  /** Fetch one (symbol, date): pages advanced by `skip += page.size` until
    * an EMPTY page. Termination matches the reference's loop
    * (fetch_historical_trades_nvda.py:345-353 — stop on empty, not on
    * short); advancing by the RECEIVED size rather than the reference's
    * fixed BATCH_SIZE is a deliberate strict improvement: when every page
    * is full the call pattern is identical, and a short-but-nonempty page
    * (server-side truncation, live appends) resumes at the true offset
    * instead of skipping the unfetched remainder. Each page is rate-limited
    * and retried. A page that exhausts its retries records a failure and
    * returns what was fetched so far — the crawl over other (symbol, date)
    * cells continues.
    */
  def fetchDay(symbol: String, date: String,
               fetchPage: (String, Int, Int) => Seq[RawTick],
               limiter: RateLimiter,
               limit: Int = 24000,
               retrySleep: Long => Unit = Thread.sleep): (Seq[RawTick], Option[FetchFailure]) = {
    val out = scala.collection.mutable.ArrayBuffer.empty[RawTick]
    var skip = 0
    var done = false
    while (!done) {
      limiter.acquire()
      withRetry(sleep = retrySleep)(() => fetchPage(symbol, skip, limit)) match {
        case Right(page) =>
          out ++= page
          skip += page.size
          done = page.isEmpty
        case Left(err) =>
          return (out.toSeq, Some(FetchFailure(symbol, date, err)))
      }
    }
    (out.toSeq, None)
  }

  /** Hand fetched batches to Spark: the S4 projection (epoch-ms → UTC
    * timestamp, double casts) over a local typed Dataset, aligned with the
    * parquet tick schema so downstream operators are source-agnostic.
    */
  def toDataFrame(spark: SparkSession, ticks: Seq[RawTick]): DataFrame = {
    import spark.implicits._
    ticks.toDS().select(
      col("symbol"),
      timestamp_millis(col("epochMs")).as("timestamp"),
      col("price").cast("double").as("price"),
      col("volume").cast("double").as("volume"))
  }
}
