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
    headline: Boolean = false,
    /** Production-path variant for the bench: same query with codegen'd
      * double arithmetic where `run` uses exact-decimal oracle math (what a
      * user would actually execute). None → bench runs `run`.
      */
    benchRun: Option[(SparkSession, String) => DataFrame] = None)

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

  /** Narrow decimal cast for exact products. Values with ≤2 real decimals
    * (prices, 1±discount/tax factors) cast identically from double in both
    * engines; keeping precision small lets a 3-factor product stay inside
    * DECIMAL(38) so neither engine overflows or rounds.
    */
  def dec(c: Column, prec: Int, scale: Int = 2): Column = c.cast(DecimalType(prec, scale))

  /** Exact revenue term: price × (1 − discount), all-decimal. */
  def revTerm(price: Column, discount: Column): Column =
    dec(price, 12) * dec(lit(1.0) - discount, 4)

  /** Deep-scale decimal aggregate → double via a cents rounding. A scale-6
    * money sum above ~9e9 has a scaled numerator past 2^53; DuckDB casts
    * decimal→double as numerator-to-double THEN divide-by-10^scale (two
    * roundings) where Spark's BigDecimal cast rounds once — observed one
    * ulp apart on q01's sum_charge at sf1. Rounding to scale 2 first keeps
    * value×100 exactly representable up to ~9e13, making both engines'
    * casts exact. Mirror in oracle SQL as
    * `CAST(CAST(SUM(...) AS DECIMAL(38,2)) AS DOUBLE)` (DuckDB's
    * scale-down rounds half-away-from-zero = Spark's HALF_UP for the
    * positive money totals this is for).
    */
  def centsDouble(c: Column): Column = c.cast(DecimalType(38, 2)).cast("double")

  /** Microsecond-precision UTC string, matching DuckDB strftime '%f'. */
  def tsMicros(c: Column): Column = date_format(c, "yyyy-MM-dd HH:mm:ss.SSSSSS")

  /** Second-precision UTC string. */
  def tsSec(c: Column): Column = date_format(c, "yyyy-MM-dd HH:mm:ss")
}
