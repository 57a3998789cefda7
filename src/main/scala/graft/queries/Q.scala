package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** One declared query: the Spark implementation plus (when SQL-expressible)
  * the equivalent DuckDB oracle SQL over the same parquet tables. `oracle =
  * None` → the driver records a weaker rows-only check.
  */
final case class Q(
    name: String,
    run: (SparkSession, String) => DataFrame,
    oracle: Option[String],
    headline: Boolean = false)

/** Cross-engine determinism helpers.
  *
  * Double sums are order-dependent; Spark shuffles and DuckDB's parallel
  * aggregation would disagree in the last ulps, and the driver hash-compares
  * values. We therefore do exact arithmetic in decimal and only cast to double
  * at the end: identical inputs → identical bits, regardless of partitioning.
  * Timestamps are emitted as formatted UTC strings — parquet tz-schema and
  * ns/µs mismatches disappear.
  */
object Det {

  /** Exact sum of a column that carries at most `scale` decimals. */
  def dsum(c: Column, scale: Int = 2): Column =
    sum(c.cast(DecimalType(18, scale))).cast("double")

  /** Exact sum of a derived double expression: pin it to `scale` decimals
    * first (both engines round identically — verified on the harness), then
    * sum exactly.
    */
  def dsumr(c: Column, scale: Int = 4): Column =
    sum(round(c, scale).cast(DecimalType(28, scale))).cast("double")

  /** Microsecond-precision UTC string, matching DuckDB strftime '%f'. */
  def tsMicros(c: Column): Column = date_format(c, "yyyy-MM-dd HH:mm:ss.SSSSSS")

  /** Second-precision UTC string. */
  def tsSec(c: Column): Column = date_format(c, "yyyy-MM-dd HH:mm:ss")
}
