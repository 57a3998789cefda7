package graft.core

import graft.SparkSpec

/** The spark.sql surface over registered views: the same candle semantics
  * reachable through plain SQL.
  */
class SqlSurfaceSpec extends SparkSpec {

  test("registered views answer SQL, candles view matches the operator") {
    Tables.registerViews(spark, "/root/testdata/sf0.001")
    val viaSql = spark.sql(
      """SELECT symbol, count(*) AS n, sum(number_of_trades) AS trades
        |FROM candles_1s GROUP BY symbol ORDER BY symbol""".stripMargin).collect()
    val viaApi = graft.operators.CandleAggregator
      .aggregate(Tables.ticks(spark, "/root/testdata/sf0.001"))
      .groupBy("symbol").count().orderBy("symbol").collect()
    assert(viaSql.length == viaApi.length && viaSql.nonEmpty)
    viaSql.zip(viaApi).foreach { case (a, b) =>
      assert(a.getString(0) == b.getString(0) && a.getLong(1) == b.getLong(1))
    }
    // joins across registered views work through SQL too
    val j = spark.sql(
      """SELECT n_name, count(*) AS c FROM customer
        |JOIN nation ON c_nationkey = n_nationkey GROUP BY n_name""".stripMargin)
    assert(j.count() > 0)
  }
}
