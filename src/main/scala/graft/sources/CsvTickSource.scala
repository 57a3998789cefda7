package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DoubleType, StringType, StructField, StructType}

import graft.operators.{TickOps, ValidatedFrame}

/** S5 — the reference's CSV ingest surface
  * (read_and_filter_csv, aggregator_candles.py:61-98): explicit schema with a
  * fail-fast column assert, the `%Y-%m-%d %H:%M:%S.%f UTC` string-timestamp
  * parse (F1), and the format-regex validity rule (F4). Completes the ingest
  * path the parquet readers skip.
  */
object CsvTickSource {

  /** The tick CSV schema: all strings at the wire, exactly the four columns
    * the reference asserts (aggregator_candles.py:73-77).
    */
  val wireSchema: StructType = StructType(Seq(
    StructField("symbol", StringType),
    StructField("timestamp", StringType),
    StructField("price", DoubleType),
    StructField("volume", DoubleType)))

  /** Timestamp parse of the reference's wire format; null on mismatch
    * (= pandas errors="coerce").
    */
  def parseWireTs(tsCol: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    to_timestamp(regexp_replace(tsCol, " UTC$", ""), "yyyy-MM-dd HH:mm:ss.SSSSSS")

  /** Reads a tick CSV directory/file:
    *  1. schema assert — fail fast if the header does not carry exactly the
    *     expected columns (analyzer-level, before any execution);
    *  2. F4 regex + F1 parse — rows whose timestamp string fails the format
    *     regex or the parse divert to `invalid` with a reason (the
    *     reference's divert-not-drop rule; its stricter whole-file reject on
    *     any NaT is [[assertAllParsed]]);
    *  3. P1 numeric validity on the survivors.
    */
  def read(spark: SparkSession, path: String): ValidatedFrame = {
    val raw = spark.read.option("header", "true").schema(wireSchema).csv(path)
    val header = spark.read.option("header", "true").csv(path).schema.fieldNames.toSeq
    val expected = wireSchema.fieldNames.toSeq
    require(header == expected, s"CSV schema mismatch: expected $expected, got $header")

    val formatOk = TickOps.rawTimestampValidity(col("timestamp"))
    val parsed = raw
      .withColumn("__ts", parseWireTs(col("timestamp")))
      .withColumn("__format_ok", coalesce(formatOk, lit(false)))
    val good = parsed.filter(col("__format_ok") && col("__ts").isNotNull)
      .select(col("symbol"), col("__ts").as("timestamp"), col("price"), col("volume"))
    val badTs = parsed.filter(!col("__format_ok") || col("__ts").isNull)
      .select(col("symbol"), col("timestamp"), col("price"), col("volume"))
      .withColumn("reject_reason", lit("bad_timestamp_format"))

    val v = TickOps.validate(good)
    ValidatedFrame(v.valid, badTs.unionByName(v.invalid.withColumn("timestamp",
      graft.queries.Det.tsMicros(col("timestamp")))))
  }

  /** The reference's whole-file reject: any unparseable timestamp fails the
    * read (aggregator_candles.py:78-83). Call when stage-2 semantics (abort)
    * are wanted instead of stage-1 divert.
    */
  def assertAllParsed(vf: ValidatedFrame): Unit = {
    val bad = vf.invalid.filter(col("reject_reason") === "bad_timestamp_format").count()
    require(bad == 0, s"$bad unparseable timestamps — rejecting file (reference behavior)")
  }
}
