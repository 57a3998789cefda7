package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.core.Tables

/** Data-quality constraint suite (the deequ/dbt-test shape): declarative
  * checks — uniqueness, referential integrity, accepted ranges, null-ness —
  * evaluated in bulk and reported as one (constraint, checked, violations,
  * pass) row each.
  *
  * Distributed shape: ALL column-local constraints on a table fold into a
  * SINGLE full scan (one partial+final aggregate of conditional sums — no
  * shuffle beyond the 1-row merge, no per-constraint pass), which is the
  * only shape that survives a 100 TB fact table; the referential check is
  * the one join (anti against the dimension, broadcast when the dimension
  * is dim-sized). Uniqueness rides count − countDistinct inside the same
  * scan. The report unpivots driver-free via an inline array→explode.
  */
object QueriesQuality {

  private def dqReport(s: SparkSession, dir: String): DataFrame = {
    val li = Tables.lineitem(s, dir)
    val o = Tables.orders(s, dir)
    val c = Tables.customer(s, dir)

    // lineitem: one scan, all range constraints
    val liAgg = li.agg(
      count(lit(1)).as("n"),
      sum(when(col("l_quantity") < 1 || col("l_quantity") > 50, 1L).otherwise(0L))
        .as("v_qty"),
      sum(when(col("l_discount") < 0.0 || col("l_discount") > 0.10, 1L).otherwise(0L))
        .as("v_disc"),
      sum(when(col("l_extendedprice") <= 0.0, 1L).otherwise(0L)).as("v_price"),
      sum(when(col("l_shipdate").isNull, 1L).otherwise(0L)).as("v_ship"))

    // orders: one scan — uniqueness via count − countDistinct
    val oAgg = o.agg(
      count(lit(1)).as("n"),
      (count(lit(1)) - countDistinct(col("o_orderkey"))).as("v_uniq"),
      sum(when(col("o_totalprice") <= 0.0, 1L).otherwise(0L)).as("v_total"),
      sum(when(col("o_orderdate").isNull, 1L).otherwise(0L)).as("v_date"))

    // referential: orders whose customer is missing (anti join; the
    // dimension side broadcasts at dim scale)
    val refAgg = o.join(broadcast(c), col("o_custkey") === col("c_custkey"), "left_anti")
      .agg(count(lit(1)).as("v_ref"))
      .crossJoin(o.agg(count(lit(1)).as("n")))

    def rows(agg: DataFrame, table: String, checks: Seq[(String, String)]): DataFrame =
      agg.select(explode(array(checks.map { case (name, vcol) =>
        struct(
          lit(s"$table.$name").as("constraint_name"),
          col("n").cast("long").as("n_checked"),
          col(vcol).cast("long").as("n_violations"))
      }: _*)).as("r")).select(col("r.*"))

    rows(liAgg, "lineitem", Seq(
        "quantity_in_1_50" -> "v_qty",
        "discount_in_0_0.1" -> "v_disc",
        "extendedprice_positive" -> "v_price",
        "shipdate_not_null" -> "v_ship"))
      .unionAll(rows(oAgg, "orders", Seq(
        "orderkey_unique" -> "v_uniq",
        "totalprice_positive" -> "v_total",
        "orderdate_not_null" -> "v_date")))
      .unionAll(rows(refAgg, "orders", Seq(
        "custkey_references_customer" -> "v_ref")))
      .withColumn("pass", col("n_violations") === 0L)
  }

  private val dqReportSql =
    """WITH li AS (SELECT CAST(COUNT(*) AS BIGINT) AS n,
      |    CAST(SUM(CASE WHEN l_quantity < 1 OR l_quantity > 50 THEN 1 ELSE 0 END) AS BIGINT) AS v_qty,
      |    CAST(SUM(CASE WHEN l_discount < 0.0 OR l_discount > 0.10 THEN 1 ELSE 0 END) AS BIGINT) AS v_disc,
      |    CAST(SUM(CASE WHEN l_extendedprice <= 0.0 THEN 1 ELSE 0 END) AS BIGINT) AS v_price,
      |    CAST(SUM(CASE WHEN l_shipdate IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS v_ship
      |  FROM lineitem),
      |o AS (SELECT CAST(COUNT(*) AS BIGINT) AS n,
      |    CAST(COUNT(*) - COUNT(DISTINCT o_orderkey) AS BIGINT) AS v_uniq,
      |    CAST(SUM(CASE WHEN o_totalprice <= 0.0 THEN 1 ELSE 0 END) AS BIGINT) AS v_total,
      |    CAST(SUM(CASE WHEN o_orderdate IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS v_date
      |  FROM orders),
      |r AS (SELECT
      |    (SELECT CAST(COUNT(*) AS BIGINT) FROM orders) AS n,
      |    (SELECT CAST(COUNT(*) AS BIGINT) FROM orders
      |      WHERE o_custkey NOT IN (SELECT c_custkey FROM customer)) AS v_ref),
      |u AS (
      |  SELECT 'lineitem.quantity_in_1_50' AS constraint_name, n AS n_checked, v_qty AS n_violations FROM li
      |  UNION ALL SELECT 'lineitem.discount_in_0_0.1', n, v_disc FROM li
      |  UNION ALL SELECT 'lineitem.extendedprice_positive', n, v_price FROM li
      |  UNION ALL SELECT 'lineitem.shipdate_not_null', n, v_ship FROM li
      |  UNION ALL SELECT 'orders.orderkey_unique', n, v_uniq FROM o
      |  UNION ALL SELECT 'orders.totalprice_positive', n, v_total FROM o
      |  UNION ALL SELECT 'orders.orderdate_not_null', n, v_date FROM o
      |  UNION ALL SELECT 'orders.custkey_references_customer', n, v_ref FROM r)
      |SELECT constraint_name, n_checked, n_violations,
      |  n_violations = 0 AS pass
      |FROM u""".stripMargin

  def all: Seq[Q] = Seq(
    Q("dq_constraint_report", dqReport, Some(dqReportSql)))
}
