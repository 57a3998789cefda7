package graft.queries

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Fixture semantics for the dq_constraint_report building blocks: the
  * single-scan conditional-sum fold and the anti-join referential count,
  * on data with KNOWN violations (the oracle-checked query runs on clean
  * generated data, so the violation paths need a dirty fixture).
  */
class QualitySpec extends SparkSpec {

  import spark.implicits._

  test("single-scan fold counts range and null violations") {
    val li = Seq(
      (1L, 10.0, 0.05, 100.0, Some("2024-01-01")),
      (2L, 0.0, 0.05, 100.0, Some("2024-01-01")),   // qty out of range
      (3L, 60.0, 0.20, 100.0, Some("2024-01-01")),  // qty + discount
      (4L, 10.0, 0.05, -1.0, None))                 // price + null date
      .toDF("id", "l_quantity", "l_discount", "l_extendedprice", "l_shipdate")
    val r = li.agg(
      count(lit(1)).as("n"),
      sum(when(col("l_quantity") < 1 || col("l_quantity") > 50, 1L).otherwise(0L)).as("v_qty"),
      sum(when(col("l_discount") < 0.0 || col("l_discount") > 0.10, 1L).otherwise(0L)).as("v_disc"),
      sum(when(col("l_extendedprice") <= 0.0, 1L).otherwise(0L)).as("v_price"),
      sum(when(col("l_shipdate").isNull, 1L).otherwise(0L)).as("v_ship"))
      .head()
    assert((r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))
      === ((4L, 2L, 1L, 1L, 1L)))
  }

  test("uniqueness = count minus countDistinct; referential = anti-join count") {
    val o = Seq((1L, 10L), (2L, 10L), (2L, 11L), (3L, 99L))
      .toDF("o_orderkey", "o_custkey")
    val c = Seq(10L, 11L).toDF("c_custkey")
    val uniq = o.agg((count(lit(1)) - countDistinct(col("o_orderkey"))).as("v")).head().getLong(0)
    assert(uniq === 1L) // orderkey 2 duplicated once
    val ref = o.join(broadcast(c), col("o_custkey") === col("c_custkey"), "left_anti")
      .count()
    assert(ref === 1L) // custkey 99 dangling
  }
}
