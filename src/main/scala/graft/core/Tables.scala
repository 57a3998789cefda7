package graft.core

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Readers for the driver-generated testdata tables (TESTDATA.md).
  *
  * All readers take the scale-factor directory so the same query code runs at
  * sf0.001 (smoke), sf0.01 (oracle) and sf0.1 (bench). At production scale the
  * same calls point at a partitioned-by-date lake; nothing here materializes
  * on the driver.
  */
object Tables {

  def table(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  def lineitem(spark: SparkSession, dir: String): DataFrame = table(spark, dir, "lineitem")
  def orders(spark: SparkSession, dir: String): DataFrame = table(spark, dir, "orders")
  def customer(spark: SparkSession, dir: String): DataFrame = table(spark, dir, "customer")
  def supplier(spark: SparkSession, dir: String): DataFrame = table(spark, dir, "supplier")
  def part(spark: SparkSession, dir: String): DataFrame = table(spark, dir, "part")
  def nation(spark: SparkSession, dir: String): DataFrame = table(spark, dir, "nation")
  def region(spark: SparkSession, dir: String): DataFrame = table(spark, dir, "region")
  def documents(spark: SparkSession, dir: String): DataFrame = table(spark, dir, "documents")
  def embeddings(spark: SparkSession, dir: String): DataFrame = table(spark, dir, "embeddings")

  /** Raw events table, normalized so `ts` is always a session-zone
    * (UTC) TimestampType regardless of how the generator encoded it:
    *
    *  - INT64 TIMESTAMP(NANOS) — Spark reads it as Long under
    *    `spark.sql.legacy.parquet.nanosAsLong`; integer-divide to µs
    *    (`div`, not `/`: a double division would lose precision above
    *    2^53 ns). DuckDB's `ts::TIMESTAMP` truncates ns→µs identically.
    *  - TIMESTAMP(MICROS) isAdjustedToUTC=false — Spark reads
    *    TIMESTAMP_NTZ; cast to TimestampType (identity on the stored
    *    micros since the session zone is UTC, GraftSession.scala:26).
    *    DuckDB reads the same column as naive TIMESTAMP, so both
    *    engines see the same wall-clock micros.
    */
  def events(spark: SparkSession, dir: String): DataFrame = {
    // SQL conf, settable at runtime: tolerate sessions built without
    // GraftSession (e.g. a driver-owned smoke session).
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val raw = table(spark, dir, "events")
    val tsNorm = raw.schema("ts").dataType match {
      case org.apache.spark.sql.types.LongType =>
        timestamp_micros(expr("ts div 1000"))
      case _ =>
        col("ts").cast(org.apache.spark.sql.types.TimestampType)
    }
    raw.withColumn("ts", tsNorm)
  }

  /** Registers every testdata table — plus the derived `ticks` and
    * `candles_1s` views — as temp views, giving the engine a plain
    * `spark.sql` surface over the same data the typed API serves.
    */
  def registerViews(spark: SparkSession, dir: String): Unit = {
    Seq("lineitem", "orders", "customer", "supplier", "part", "nation",
      "region", "documents", "embeddings").foreach { n =>
      table(spark, dir, n).createOrReplaceTempView(n)
    }
    events(spark, dir).createOrReplaceTempView("events")
    ticks(spark, dir).createOrReplaceTempView("ticks")
    graft.operators.CandleAggregator.aggregate(ticks(spark, dir))
      .createOrReplaceTempView("candles_1s")
  }

  /** The tick table of the reference pipeline, projected out of `events`.
    *
    * The reference's tick schema is (symbol, timestamp, price, volume)
    * (reference: src/fetch_historical_trades_nvda.py:155-160). The testdata
    * has no tick table, so the declared tick/candle operators run over this
    * deterministic mapping: symbol=event_type, price=value,
    * volume=user_id+1 (always > 0, so G1's zero-volume VWAP guard is
    * exercised separately in unit tests).
    */
  def ticks(spark: SparkSession, dir: String): DataFrame =
    events(spark, dir).select(
      col("event_type").as("symbol"),
      col("ts").as("timestamp"),
      col("value").as("price"),
      (col("user_id") + lit(1)).cast("double").as("volume"),
      col("event_id").as("seq")
    )
}
