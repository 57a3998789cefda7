package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.core.Tables
import graft.operators.{CandleAggregator, TickOps}

/** SURVEY §4's plan sanity checks, encoded: the physical plans the engine
  * relies on at 100 TB must actually be the plans Catalyst produces. These
  * assert structure (pushdown, pruning, partial aggregation, broadcast,
  * top-k, rank-limit pushdown, kernel placement) — not timings.
  */
class PlanSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  private def plan(df: DataFrame): String = df.queryExecution.sparkPlan.toString

  test("q01: filter pushed to parquet, columns pruned, partial+final aggregate") {
    val p = plan(graft.queries.Registry.queries("q01_pricing_summary")(spark, dir))
    assert(p.contains("LessThanOrEqual(l_shipdate"), "shipdate filter must reach PushedFilters")
    assert(p.contains("partial_sum"), "map-side partial aggregation expected")
    assert(!p.contains("l_comment"), "unused columns must be pruned from the scan")
  }

  test("q02: tiny dimension joins broadcast, no fact-side broadcast") {
    val p = plan(graft.queries.Registry.queries("q02_revenue_by_nation")(spark, dir))
    assert(p.contains("BroadcastHashJoin"), "nation join must broadcast")
  }

  test("g1: partial+final hash aggregate over (symbol, bucket), no sort") {
    val df = CandleAggregator.aggregate(Tables.ticks(spark, dir))
    val p = plan(df)
    assert("HashAggregate".r.findAllIn(p).size >= 2, "partial+final hash aggregate")
    assert(!p.contains("SortAggregate"),
      "candle agg must stay hash-based (a struct min_by ordering key would sort)")
    // exchanges are inserted by EnsureRequirements — check the executed plan
    val ep = df.queryExecution.executedPlan.toString
    assert(ep.contains("Exchange hashpartitioning(symbol"), "one shuffle on the group keys")
  }

  test("g5 dedup: rank-limit pushdown (WindowGroupLimit) before the shuffle") {
    val p = plan(TickOps.dedupKeepLast(
      Tables.ticks(spark, dir), Seq("symbol"), Seq(col("timestamp"))))
    assert(p.contains("WindowGroupLimit"), "row_number()=1 must push a partial top-1 below the exchange")
    assert(p.contains("Window "), "window exec present")
  }

  test("g6: distinct+sort+limit plans as TakeOrderedAndProject") {
    val p = plan(graft.queries.Registry.queries("g6_distinct_symbols")(spark, dir))
    assert(p.contains("TakeOrderedAndProject"), "no global sort for a head-N")
  }

  test("minhash signatures: the fold runs as a mapPartitions kernel, pruned scan") {
    val p = plan(graft.functions.MinHash.withSignatures(Tables.documents(spark, dir)))
    assert(p.contains("MapPartitions"), "signature fold must be the plain-Scala kernel")
    assert(p.contains("struct<doc_id:bigint,text:string>"), "scan reads only id + text")
  }

  test("lsh bucket frame caches scalars only — arrays never ride the self-join") {
    val e = Tables.embeddings(spark, dir)
    val df = graft.functions.Similarity.lshTopK(e, k = 1, bits = 8, tables = 2)
    val cached = df.queryExecution.optimizedPlan.collect {
      case m: org.apache.spark.sql.execution.columnar.InMemoryRelation =>
        m.output.map(_.name)
    }
    assert(cached.nonEmpty, "the bucketed frame must hit a cache boundary")
    cached.foreach { cols =>
      assert(cols.sorted == Seq("bucket", "table", "vec_id"),
        s"bucket frame must be scalar-only, got $cols — columnar-encoding the " +
          "embedding arrays costs more than the downstream join")
    }
  }

  test("w1 production path: one exchange, one window, codegen'd avg") {
    val p = plan(graft.calc.WindowCalcs.withVolumeSpikes(
      CandleAggregator.aggregate(Tables.ticks(spark, dir)), exact = false))
    assert("Exchange hashpartitioning".r.findAllIn(p).size <= 2,
      "candle agg + window should not add extra shuffles")
    assert(p.contains("Window "), "window exec present")
    assert(!p.contains("decimal(18,4)) ") || !p.contains("avg(cast"),
      "production path must not carry the oracle's decimal window sums")
  }
}
