package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Valid/invalid split: the reference diverts rejected rows to a side file
  * instead of dropping them (reference: fetch_historical_trades_nvda.py:127-132,
  * candle_to_calcs.py:130-133). In Spark we return both frames; callers cache
  * the parent before writing both.
  */
final case class ValidatedFrame(valid: DataFrame, invalid: DataFrame)

/** Stage-1 tick operators: validation (P1/P2), keep-last dedup merge (G5),
  * audit aggregates (G3). All pure DataFrame transforms — Catalyst pushes the
  * predicates into the scan and plans one shuffle for the dedup window.
  */
object TickOps {

  /** Timestamp text format accepted at ingest
    * (reference: fetch_historical_trades_nvda.py:48).
    */
  val TimestampRegex = "^\\d{4}-\\d{2}-\\d{2} \\d{2}:\\d{2}:\\d{2}\\.\\d{6} UTC$"

  /** P1/P2 validity over typed ticks: non-null, price > 0, volume >= 0
    * (reference: fetch_historical_trades_nvda.py:102-138, 216-234).
    */
  def tickValidity: Column =
    col("price").isNotNull && col("volume").isNotNull &&
      col("timestamp").isNotNull &&
      col("price") > 0 && col("volume") >= 0

  /** Additional rule for string-typed ingest timestamps (the reference's CSV
    * surface): the exact `%Y-%m-%d %H:%M:%S.%f UTC` shape.
    */
  def rawTimestampValidity(tsCol: Column): Column = tsCol.rlike(TimestampRegex)

  def validate(ticks: DataFrame): ValidatedFrame = {
    val v = tickValidity
    ValidatedFrame(
      valid = ticks.filter(v),
      invalid = ticks.filter(!coalesce(v, lit(false)))
        .withColumn("reject_reason",
          when(col("price").isNull || col("volume").isNull || col("timestamp").isNull, "null_field")
            .when(col("price") <= 0, "nonpositive_price")
            .otherwise("negative_volume"))
    )
  }

  /** G5 keep-last dedup. `ordering` columns break ties inside a key group; the
    * reference's `drop_duplicates(keep="last")` keeps the row that appears
    * later in concat order (new file after old file), which we reproduce with
    * an explicit priority/ordering column instead of physical row order
    * (reference: fetch_historical_trades_nvda.py:239-245,
    * aggregator_candles.py:120-124).
    *
    * One shuffle (hash by keys) + in-partition sort; no driver materialization.
    */
  def dedupKeepLast(df: DataFrame, keys: Seq[String], ordering: Seq[Column]): DataFrame = {
    val w = Window.partitionBy(keys.map(col): _*).orderBy(ordering.map(_.desc): _*)
    df.withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1)
      .drop("__rn")
  }

  /** Upsert-merge: old ∪ new, keep the new side on key collisions
    * (reference: merge_temp_to_final_csv fetch_historical_trades_nvda.py:203-258).
    */
  def mergeKeepNew(old: DataFrame, fresh: DataFrame, keys: Seq[String]): DataFrame = {
    val tagged = old.withColumn("__src", lit(0)).unionByName(fresh.withColumn("__src", lit(1)))
    dedupKeepLast(tagged, keys, Seq(col("__src"))).drop("__src")
  }

  /** S4 — columnar→row projection
    * (reference: fetch_historical_trades_nvda.py:155-160): the wire response
    * arrives as parallel arrays (epoch-ms times `t`, prices `p`, volumes `v`)
    * per symbol batch; zip + explode + cast projects tick rows. A null array
    * slot becomes a null field (the reference's missing-index guard), caught
    * downstream by P1.
    */
  def fromColumnarBatches(batches: DataFrame): DataFrame =
    batches
      .select(col("symbol"), explode(arrays_zip(col("t"), col("p"), col("v"))).as("z"))
      .select(
        col("symbol"),
        timestamp_millis(col("z.t")).as("timestamp"),
        col("z.p").cast("double").as("price"),
        col("z.v").cast("double").as("volume"))

  /** P6 — weekend filter: drop rows whose US/Eastern wall-clock day is
    * Saturday/Sunday (reference: is_weekend
    * fetch_historical_trades_nvda.py:97-99, applied per fetch date :333-335).
    * Eastern (not UTC) on purpose: the trading calendar is a wall-clock
    * concept, and the predicate is codegen'd + partition-prunable when the
    * lake is date-partitioned.
    */
  def filterWeekdays(df: DataFrame, tsCol: String = "timestamp"): DataFrame =
    df.filter(!dayofweek(from_utc_timestamp(col(tsCol), "US/Eastern")).isin(1, 7))

  /** G3 audit scan: the final-output validation aggregates
    * (reference: validate_final_csv fetch_historical_trades_nvda.py:286-325).
    * Single pass, map-side partials.
    */
  def audit(ticks: DataFrame): DataFrame =
    ticks.agg(
      count(lit(1)).as("total_rows"),
      sum(when(col("price").isNull || col("volume").isNull, 1L).otherwise(0L)).as("null_price_volume"),
      sum(when(col("price") <= 0 || col("volume") < 0, 1L).otherwise(0L)).as("invalid_price_volume"),
      countDistinct(col("timestamp")).as("distinct_timestamps"),
      min(col("timestamp")).as("min_ts"),
      max(col("timestamp")).as("max_ts")
    )
}
