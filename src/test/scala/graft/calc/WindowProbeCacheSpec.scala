package graft.calc

import graft.SparkSpec
import graft.core.Tables

/** The skew-probe statistics cache must hit across RE-INSTANTIATED probe
  * frames — each query invocation builds a fresh DataFrame over the same
  * source, and only canonicalized-plan keying makes the probe one scan per
  * session instead of one per call (the bench reps re-invoke the query
  * function five times).
  */
class WindowProbeCacheSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  test("re-instantiated probes of the same source share one cache entry") {
    val before = WindowCalcs.skewStatsCacheSize
    val r1 = WindowCalcs.fewSymbolSkew(Tables.ticks(spark, dir))
    val afterFirst = WindowCalcs.skewStatsCacheSize
    val r2 = WindowCalcs.fewSymbolSkew(Tables.ticks(spark, dir))
    assert(r1 === r2)
    assert(afterFirst === before + 1, "first probe populates one entry")
    assert(WindowCalcs.skewStatsCacheSize === afterFirst,
      "second probe over a FRESH DataFrame of the same source must hit, not re-scan")
  }

  test("a different source is a different entry") {
    WindowCalcs.fewSymbolSkew(Tables.ticks(spark, dir))
    val n = WindowCalcs.skewStatsCacheSize
    WindowCalcs.fewSymbolSkew(
      Tables.ticks(spark, dir).filter(org.apache.spark.sql.functions.col("volume") > 1))
    assert(WindowCalcs.skewStatsCacheSize === n + 1)
  }
}
