package graft.calc

import graft.SparkSpec
import graft.core.Tables

/** The skew-probe statistics cache must hit across RE-INSTANTIATED probe
  * frames — each query invocation builds a fresh DataFrame over the same
  * source, and only canonicalized-plan keying makes the probe one scan per
  * session instead of one per call (the bench reps re-invoke the query
  * function five times). Assertions are membership-by-key, not global size
  * deltas, so concurrent suites touching the JVM-global cache cannot flake
  * these tests.
  */
class WindowProbeCacheSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  test("re-instantiated probes of the same source share one cache entry") {
    WindowCalcs.skewStatsCacheClear()
    val probe1 = Tables.ticks(spark, dir)
    assert(!WindowCalcs.skewStatsCached(probe1), "clear leaves the probe unkeyed")
    val r1 = WindowCalcs.fewSymbolSkew(probe1)
    assert(WindowCalcs.skewStatsCached(probe1), "first probe populates its entry")
    val probe2 = Tables.ticks(spark, dir) // FRESH DataFrame, same source
    assert(WindowCalcs.skewStatsCached(probe2),
      "a re-instantiated probe of the same source keys to the SAME entry (canonicalized plan)")
    val r2 = WindowCalcs.fewSymbolSkew(probe2)
    assert(r1 === r2)
  }

  test("a different source is a different entry") {
    WindowCalcs.skewStatsCacheClear()
    val base = Tables.ticks(spark, dir)
    val filtered = base.filter(org.apache.spark.sql.functions.col("volume") > 1)
    WindowCalcs.fewSymbolSkew(base)
    assert(WindowCalcs.skewStatsCached(base))
    assert(!WindowCalcs.skewStatsCached(filtered),
      "the filtered probe must NOT alias the base probe's statistic")
    WindowCalcs.fewSymbolSkew(filtered)
    assert(WindowCalcs.skewStatsCached(filtered))
  }
}
