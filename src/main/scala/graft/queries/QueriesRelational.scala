package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.core.Tables
import graft.queries.Det._

/** Relational core over the TPC-H-ish tables: aggregation, broadcast /
  * semi / anti joins, top-k, distinct, running/rolling/lag windows, union.
  * Each query is written the way it should run at 100 TB: filters first
  * (pushed to parquet), small dimensions broadcast, aggregates partial+final.
  */
object QueriesRelational {

  /** TPC-H Q1-style pricing summary: full-scan aggregate with decimal-exact
    * sums. Plan: Scan(PushedFilters shipdate) → partial HashAggregate →
    * Exchange(2 groups) → final HashAggregate.
    */
  private def q01(s: SparkSession, dir: String): DataFrame = {
    val li = Tables.lineitem(s, dir)
    li.filter(col("l_shipdate") <= lit(java.sql.Timestamp.valueOf("1998-09-02 00:00:00")))
      .groupBy(col("l_returnflag"), col("l_linestatus"))
      .agg(
        dsum(col("l_quantity")).as("sum_qty"),
        dsum(col("l_extendedprice")).as("sum_base_price"),
        centsDouble(sum(revTerm(col("l_extendedprice"), col("l_discount")))).as("sum_disc_price"),
        centsDouble(sum(revTerm(col("l_extendedprice"), col("l_discount")) *
          dec(lit(1.0) + col("l_tax"), 4))).as("sum_charge"),
        (dsum(col("l_quantity")) / count(lit(1))).as("avg_qty"),
        (dsum(col("l_extendedprice")) / count(lit(1))).as("avg_price"),
        count(lit(1)).as("count_order"))
  }

  /** Production-path q01: plain double sums (what a user writes; the decimal
    * forms above exist for bit-exact oracle parity only).
    */
  private def q01Bench(s: SparkSession, dir: String): DataFrame = {
    val li = Tables.lineitem(s, dir)
    val rev = col("l_extendedprice") * (lit(1.0) - col("l_discount"))
    li.filter(col("l_shipdate") <= lit(java.sql.Timestamp.valueOf("1998-09-02 00:00:00")))
      .groupBy(col("l_returnflag"), col("l_linestatus"))
      .agg(
        sum(col("l_quantity")).as("sum_qty"),
        sum(col("l_extendedprice")).as("sum_base_price"),
        sum(rev).as("sum_disc_price"),
        sum(rev * (lit(1.0) + col("l_tax"))).as("sum_charge"),
        avg(col("l_quantity")).as("avg_qty"),
        avg(col("l_extendedprice")).as("avg_price"),
        count(lit(1)).as("count_order"))
  }

  private val q01Sql =
    """SELECT l_returnflag, l_linestatus,
      |  CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
      |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_base_price,
      |  CAST(ROUND(SUM(CAST(l_extendedprice AS DECIMAL(12,2)) * CAST(1.0 - l_discount AS DECIMAL(4,2))), 2) AS DOUBLE) AS sum_disc_price,
      |  CAST(ROUND(SUM(CAST(l_extendedprice AS DECIMAL(12,2)) * CAST(1.0 - l_discount AS DECIMAL(4,2)) * CAST(1.0 + l_tax AS DECIMAL(4,2))), 2) AS DOUBLE) AS sum_charge,
      |  CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) / COUNT(*) AS avg_qty,
      |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) / COUNT(*) AS avg_price,
      |  COUNT(*) AS count_order
      |FROM lineitem WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
      |GROUP BY l_returnflag, l_linestatus""".stripMargin

  /** Revenue per nation: 4-way join; region/nation broadcast (tiny dims),
    * customer⋈orders⋈lineitem shuffle-hash on keys.
    */
  private def q02x(exact: Boolean)(s: SparkSession, dir: String): DataFrame = {
    val li = Tables.lineitem(s, dir)
    val o = Tables.orders(s, dir)
    val c = Tables.customer(s, dir)
    val n = Tables.nation(s, dir)
    val rev =
      if (exact) centsDouble(sum(revTerm(col("l_extendedprice"), col("l_discount"))))
      else sum(col("l_extendedprice") * (lit(1.0) - col("l_discount")))
    li.join(o, li("l_orderkey") === o("o_orderkey"))
      .join(c, o("o_custkey") === c("c_custkey"))
      .join(broadcast(n), c("c_nationkey") === n("n_nationkey"))
      .groupBy(col("n_name"))
      .agg(rev.as("revenue"), count(lit(1)).as("n_lines"))
  }

  private def q02(s: SparkSession, dir: String): DataFrame = q02x(exact = true)(s, dir)

  private val q02Sql =
    """SELECT n_name,
      |  CAST(ROUND(SUM(CAST(l_extendedprice AS DECIMAL(12,2)) * CAST(1.0 - l_discount AS DECIMAL(4,2))), 2) AS DOUBLE) AS revenue,
      |  COUNT(*) AS n_lines
      |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
      |JOIN customer ON o_custkey = c_custkey
      |JOIN nation ON c_nationkey = n_nationkey
      |GROUP BY n_name""".stripMargin

  /** Top-k: TakeOrderedAndProject — no global sort at scale. No broadcast
    * hint on customer: it is fact-sized at high SF (~1.5B rows at sf10k), so
    * we let AQE pick the join strategy (it broadcasts at small SF anyway).
    */
  private def q03(s: SparkSession, dir: String): DataFrame = {
    val o = Tables.orders(s, dir)
    val c = Tables.customer(s, dir)
    o.join(c, o("o_custkey") === c("c_custkey"))
      .select(col("o_orderkey"), col("c_name"), col("o_totalprice"))
      .orderBy(col("o_totalprice").desc, col("o_orderkey"))
      .limit(10)
  }

  private val q03Sql =
    """SELECT o_orderkey, c_name, o_totalprice
      |FROM orders JOIN customer ON o_custkey = c_custkey
      |ORDER BY o_totalprice DESC, o_orderkey LIMIT 10""".stripMargin

  /** Semi join (J1): customers that have at least one order. */
  private def q04(s: SparkSession, dir: String): DataFrame = {
    val c = Tables.customer(s, dir)
    val o = Tables.orders(s, dir).select(col("o_custkey").as("c_custkey"))
    c.join(o, Seq("c_custkey"), "left_semi")
      .groupBy(col("c_mktsegment"))
      .agg(count(lit(1)).as("n_customers"), dsum(col("c_acctbal")).as("sum_acctbal"))
  }

  private val q04Sql =
    """SELECT c_mktsegment, COUNT(*) AS n_customers,
      |  CAST(SUM(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE) AS sum_acctbal
      |FROM customer WHERE c_custkey IN (SELECT o_custkey FROM orders)
      |GROUP BY c_mktsegment""".stripMargin

  /** Anti join (J2 embryo): customers with no large (>$400k) order, counted
    * per nation. The price filter keeps the result non-vacuous — at sf0.01
    * every customer has at least one order.
    */
  private def q05(s: SparkSession, dir: String): DataFrame = {
    val c = Tables.customer(s, dir)
    val o = Tables.orders(s, dir).filter(col("o_totalprice") > 400000)
      .select(col("o_custkey").as("c_custkey"))
    val n = Tables.nation(s, dir)
    c.join(o, Seq("c_custkey"), "left_anti")
      .join(broadcast(n), c("c_nationkey") === n("n_nationkey"))
      .groupBy(col("n_name"))
      .agg(count(lit(1)).as("n_customers"))
  }

  private val q05Sql =
    """SELECT n_name, COUNT(*) AS n_customers
      |FROM customer JOIN nation ON c_nationkey = n_nationkey
      |WHERE NOT EXISTS (
      |  SELECT 1 FROM orders WHERE o_custkey = c_custkey AND o_totalprice > 400000)
      |GROUP BY n_name""".stripMargin

  /** Running (unbounded-preceding) per-user sum — exact decimal window.
    * event_id is the deterministic tiebreaker for duplicate (user_id, ts).
    */
  private def q06x(exact: Boolean)(s: SparkSession, dir: String): DataFrame = {
    val e = Tables.events(s, dir)
    val w = Window.partitionBy("user_id").orderBy("ts", "event_id")
      .rowsBetween(Window.unboundedPreceding, 0)
    val running =
      if (exact) sum(col("value").cast("decimal(18,2)")).over(w).cast("double")
      else sum(col("value")).over(w)
    e.select(col("event_id"), col("user_id"), running.as("running_value"))
  }

  private def q06(s: SparkSession, dir: String): DataFrame = q06x(exact = true)(s, dir)

  private val q06Sql =
    """SELECT event_id, user_id,
      |  CAST(SUM(CAST(value AS DECIMAL(18,2))) OVER (
      |    PARTITION BY user_id ORDER BY ts::TIMESTAMP, event_id
      |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE) AS running_value
      |FROM events""".stripMargin

  /** W1-shaped rolling mean (60 rows, min_periods=1) via exact decimal sums. */
  private def q07(s: SparkSession, dir: String): DataFrame = {
    val e = Tables.events(s, dir)
    val w = Window.partitionBy("event_type").orderBy("ts", "event_id").rowsBetween(-59, 0)
    e.select(
      col("event_id"), col("event_type"),
      (sum(col("value").cast("decimal(18,2)")).over(w).cast("double") /
        count(lit(1)).over(w)).as("rolling_avg_value"))
  }

  private val q07Sql =
    """SELECT event_id, event_type,
      |  CAST(SUM(CAST(value AS DECIMAL(18,2))) OVER w AS DOUBLE) / COUNT(*) OVER w AS rolling_avg_value
      |FROM events
      |WINDOW w AS (PARTITION BY event_type ORDER BY ts::TIMESTAMP, event_id ROWS BETWEEN 59 PRECEDING AND CURRENT ROW)""".stripMargin

  /** W2 lag-diff with the reference's nulls→0 collapse. */
  private def q08(s: SparkSession, dir: String): DataFrame = {
    val e = Tables.events(s, dir)
    val w = Window.partitionBy("event_type").orderBy("ts", "event_id")
    e.select(
      col("event_id"), col("event_type"),
      coalesce(col("value") - lag(col("value"), 1).over(w), lit(0.0)).as("value_diff"))
  }

  private val q08Sql =
    """SELECT event_id, event_type,
      |  COALESCE(value - LAG(value, 1) OVER (PARTITION BY event_type ORDER BY ts::TIMESTAMP, event_id), 0.0) AS value_diff
      |FROM events""".stripMargin

  /** Scan-side aggregate pushover on part (brand stats). */
  private def q09(s: SparkSession, dir: String): DataFrame =
    Tables.part(s, dir)
      .groupBy(col("p_brand"))
      .agg(
        count(lit(1)).as("n_parts"),
        dsum(col("p_retailprice")).as("sum_retail"),
        min(col("p_size")).as("min_size"),
        max(col("p_size")).as("max_size"))

  private val q09Sql =
    """SELECT p_brand, COUNT(*) AS n_parts,
      |  CAST(SUM(CAST(p_retailprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_retail,
      |  MIN(p_size) AS min_size, MAX(p_size) AS max_size
      |FROM part GROUP BY p_brand""".stripMargin

  /** UNION ALL (U1) then aggregate: high-value purchases ∪ errors. */
  private def q10(s: SparkSession, dir: String): DataFrame = {
    val e = Tables.events(s, dir)
    val a = e.filter(col("event_type") === "purchase" && col("value") > 100)
    val b = e.filter(col("event_type") === "error")
    a.unionByName(b)
      .groupBy(col("event_type"))
      .agg(count(lit(1)).as("n"), dsum(col("value")).as("sum_value"))
  }

  private val q10Sql =
    """SELECT event_type, COUNT(*) AS n,
      |  CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value
      |FROM (
      |  SELECT * FROM events WHERE event_type = 'purchase' AND value > 100
      |  UNION ALL
      |  SELECT * FROM events WHERE event_type = 'error'
      |) GROUP BY event_type""".stripMargin

  /** J4 — the salted skew join on the driver scoreboard: ticks (symbol is
    * the classic low-cardinality hot key) join a tiny per-symbol dimension
    * through [[graft.operators.SkewJoin.saltedInner]]; the DuckDB oracle
    * replays the PLAIN join, so hash-green proves salting changed the
    * distribution and nothing else. Payload is exact-integer arithmetic
    * (seq offsets) — no float boundary to flake on.
    */
  private def j4(s: SparkSession, dir: String): DataFrame = {
    val t = Tables.ticks(s, dir)
    val dim = t.groupBy(col("symbol")).agg(min(col("seq")).as("sym_min"))
    graft.operators.SkewJoin.saltedInner(t, dim, "symbol", salts = 8, saltBy = Seq("seq"))
      .groupBy(col("symbol"))
      .agg(count(lit(1)).as("n_rows"), sum(col("seq")).as("sum_seq"),
        sum(col("seq") - col("sym_min")).as("sum_rel_seq"))
  }

  private val j4Sql =
    s"""${QueriesDomain.withTicks},
       |d AS (SELECT symbol, MIN(seq) AS sym_min FROM ticks GROUP BY symbol)
       |SELECT t.symbol, COUNT(*) AS n_rows, CAST(SUM(t.seq) AS BIGINT) AS sum_seq,
       |  CAST(SUM(t.seq - d.sym_min) AS BIGINT) AS sum_rel_seq
       |FROM ticks t JOIN d ON t.symbol = d.symbol
       |GROUP BY t.symbol""".stripMargin

  /** The skew-join bench pair: the SAME join + agg, salted vs plain, with
    * the dimension side hinted shuffle_hash so neither path can hide the
    * skew behind a broadcast (the 100 TB regime this operator exists for is
    * "too big to broadcast"). Both rows share j4's oracle — the plain
    * replay — so both are hash-green; the BENCH delta between them is the
    * measured value of salting on a hot-keyed input (the sf1 generator
    * gives 'click' ~50% of all rows; at the uniform driver SFs the delta
    * reads ~0, which is itself the honest control).
    */
  private def j4Hot(salted: Boolean)(s: SparkSession, dir: String): DataFrame = {
    val t = Tables.ticks(s, dir)
    val dim = t.groupBy(col("symbol")).agg(min(col("seq")).as("sym_min"))
      .hint("shuffle_hash")
    val joined =
      if (salted)
        graft.operators.SkewJoin.saltedInner(t, dim, "symbol", salts = 32, saltBy = Seq("seq"))
      else t.join(dim, Seq("symbol"))
    joined.groupBy(col("symbol"))
      .agg(count(lit(1)).as("n_rows"), sum(col("seq")).as("sum_seq"),
        sum(col("seq") - col("sym_min")).as("sum_rel_seq"))
  }

  /** Multi-granularity revenue via ROLLUP(region, nation): Spark's Expand
    * operator computes all three grouping levels in ONE scan + one
    * shuffle — at 100 TB that replaces N repeated full-table aggregations
    * with a ×levels row expansion that partial-aggregates map-side
    * immediately. `grouping()` flags disambiguate rollup NULLs from data
    * NULLs, matching DuckDB's GROUPING().
    */
  private def q11(s: SparkSession, dir: String): DataFrame = {
    val o = Tables.orders(s, dir)
    val joined = o
      .join(broadcast(Tables.customer(s, dir)), col("o_custkey") === col("c_custkey"))
      .join(broadcast(Tables.nation(s, dir)), col("c_nationkey") === col("n_nationkey"))
      .join(broadcast(Tables.region(s, dir)), col("n_regionkey") === col("r_regionkey"))
    joined.rollup(col("r_name"), col("n_name"))
      .agg(
        grouping(col("r_name")).cast("int").as("g_reg"),
        grouping(col("n_name")).cast("int").as("g_nat"),
        dsum(col("o_totalprice")).as("revenue"), count(lit(1)).as("n_orders"))
      .select(col("r_name"), col("n_name"), col("g_reg"), col("g_nat"),
        col("revenue"), col("n_orders"))
  }

  private val q11Sql =
    """SELECT r_name, n_name,
      |  CAST(GROUPING(r_name) AS INTEGER) AS g_reg,
      |  CAST(GROUPING(n_name) AS INTEGER) AS g_nat,
      |  CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS revenue,
      |  CAST(COUNT(*) AS BIGINT) AS n_orders
      |FROM orders
      |JOIN customer ON o_custkey = c_custkey
      |JOIN nation ON c_nationkey = n_nationkey
      |JOIN region ON n_regionkey = r_regionkey
      |GROUP BY ROLLUP (r_name, n_name)""".stripMargin

  /** q18 (extension) — full CUBE over (returnflag, linestatus) with
    * per-column GROUPING flags: q11 covers the ROLLUP lattice; CUBE is the
    * remaining grouping-set shape (all 2² subsets, one Expand + one
    * aggregate — no per-subset re-scan). GROUPING flags disambiguate real
    * NULL keys from aggregated-out levels, the standard reporting contract.
    */
  private def q18(s: SparkSession, dir: String): DataFrame =
    Tables.lineitem(s, dir)
      .cube(col("l_returnflag"), col("l_linestatus"))
      .agg(
        grouping(col("l_returnflag")).cast("int").as("g_rf"),
        grouping(col("l_linestatus")).cast("int").as("g_ls"),
        dsum(col("l_quantity")).as("sum_qty"),
        dsum(col("l_extendedprice")).as("sum_price"),
        count(lit(1)).as("n_rows"))
      .select(col("l_returnflag"), col("l_linestatus"), col("g_rf"),
        col("g_ls"), col("sum_qty"), col("sum_price"), col("n_rows"))

  private val q18Sql =
    """SELECT l_returnflag, l_linestatus,
      |  CAST(GROUPING(l_returnflag) AS INTEGER) AS g_rf,
      |  CAST(GROUPING(l_linestatus) AS INTEGER) AS g_ls,
      |  CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
      |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_price,
      |  CAST(COUNT(*) AS BIGINT) AS n_rows
      |FROM lineitem
      |GROUP BY CUBE (l_returnflag, l_linestatus)""".stripMargin

  /** Daily × event-type pivot via explicit conditional aggregation — one
    * count(when(type=v,1)) column per type. Same single partial+final
    * aggregate Spark plans for an explicit-list pivot() (no distinct-values
    * pre-scan, fixed schema — the only scale-safe pivot shape at 100 TB),
    * but a day with zero rows of some type yields 0, not the NULL that
    * pivot's PivotFirst rewrite leaves in missing cells — matching the
    * COUNT(*) FILTER oracle on sparse days too.
    */
  private def q12(s: SparkSession, dir: String): DataFrame = {
    val types = Seq("click", "view", "purchase", "signup", "error")
    val cells = types.map(t => count(when(col("event_type") === t, 1)).as(t))
    Tables.events(s, dir)
      .groupBy(to_date(col("ts")).as("day"))
      .agg(cells.head, cells.tail: _*)
  }

  private val q12Sql =
    """SELECT CAST(ts::TIMESTAMP AS DATE) AS day,
      |  CAST(COUNT(*) FILTER (event_type = 'click') AS BIGINT) AS click,
      |  CAST(COUNT(*) FILTER (event_type = 'view') AS BIGINT) AS view,
      |  CAST(COUNT(*) FILTER (event_type = 'purchase') AS BIGINT) AS purchase,
      |  CAST(COUNT(*) FILTER (event_type = 'signup') AS BIGINT) AS signup,
      |  CAST(COUNT(*) FILTER (event_type = 'error') AS BIGINT) AS error
      |FROM events GROUP BY 1""".stripMargin

  /** Exact distributed quantiles by rank selection: one sort per group
    * (row_number + count over the same window partitioning → a single
    * shuffle+sort), pick values at rank ⌈q·n⌉. Deterministic across
    * engines because ties break on event_id and both engines compute the
    * identical IEEE q·n product. Exact quantiles at 100 TB are feasible
    * exactly this way (range-partition + sort); when one pass over
    * unsorted data is required instead, that is the sketch family's job
    * (see QueriesSketch).
    */
  private def q13(s: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("event_type"))
      .orderBy(col("value").asc, col("event_id").asc)
    val ranked = Tables.events(s, dir)
      .select(col("event_type"), col("value"), col("event_id"))
      .withColumn("rn", row_number().over(w))
      .withColumn("n", count(lit(1)).over(Window.partitionBy(col("event_type"))))
    def at(q: Double): org.apache.spark.sql.Column =
      max(when(col("rn") === ceil(col("n") * lit(q)), col("value")))
    ranked.groupBy(col("event_type"))
      .agg(at(0.5).as("p50"), at(0.9).as("p90"), at(0.99).as("p99"),
        max(col("n")).as("n_rows"))
  }

  private val q13Sql =
    """WITH r AS (
      |  SELECT event_type, value,
      |    ROW_NUMBER() OVER (PARTITION BY event_type ORDER BY value ASC, event_id ASC) AS rn,
      |    COUNT(*) OVER (PARTITION BY event_type) AS n
      |  FROM events)
      |SELECT event_type,
      |  MAX(CASE WHEN rn = CEIL(n * 0.5) THEN value END) AS p50,
      |  MAX(CASE WHEN rn = CEIL(n * 0.9) THEN value END) AS p90,
      |  MAX(CASE WHEN rn = CEIL(n * 0.99) THEN value END) AS p99,
      |  CAST(MAX(n) AS BIGINT) AS n_rows
      |FROM r GROUP BY 1""".stripMargin

  /** Per-group top-k through the typed [[graft.operators.TopKAggregator]]
    * (§2.10's reserved typed-Aggregator slot): partial aggregation ships ≤
    * k pairs per group per map task to the shuffle — O(groups × k) — where
    * the window form (`row_number() ≤ k`, q03) sorts every row through the
    * exchange. The oracle replays with exactly that window form, proving
    * the two top-k shapes equivalent on the same deterministic total order
    * (value DESC, event_id ASC).
    */
  private def q14(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val ev = Tables.events(s, dir)
      .select(col("event_type"), col("value"), col("event_id"))
      .as[(String, Double, Long)]
    ev.groupByKey(_._1)
      .mapValues(r => (r._2, r._3))
      .agg(graft.operators.TopKAggregator(3).toColumn.name("topk"))
      .toDF("event_type", "topk")
      .select(col("event_type"), posexplode(col("topk")))
      .select(col("event_type"), (col("pos") + 1).as("rank"),
        col("col._1").as("value"), col("col._2").as("event_id"))
  }

  /** Shared with `stream_topk`: the streaming top-k emits rows that
    * hash-match this same oracle (batch ≡ stream ≡ oracle).
    */
  val q14Sql: String =
    """WITH r AS (
      |  SELECT event_type, value, event_id,
      |    ROW_NUMBER() OVER (PARTITION BY event_type
      |      ORDER BY value DESC, event_id ASC) AS rn
      |  FROM events)
      |SELECT event_type, CAST(rn AS INTEGER) AS rank, value, event_id
      |FROM r WHERE rn <= 3""".stripMargin

  /** J5 — large-large range join via bucket replication
    * ([[graft.operators.RangeJoin]]): per-user 4-hour activity windows
    * (users in the `% 10` stratum, so the interval side SCALES with the
    * data instead of broadcasting away) matched against every event whose
    * ts falls inside the window. A naive `BETWEEN` join here is a
    * BroadcastNestedLoopJoin; the rewrite is an equi-join on the time
    * bucket, with the width PROBED from the interval-span distribution
    * ([[graft.operators.RangeJoin.adaptiveBucketSeconds]]: p75 span
    * rounded up to a power of two — here 4-hour spans → 16384 s buckets,
    * ≤ 2 copies per window) instead of a hardcoded constant that only
    * suits one span shape. All-integer aggregates per window pin exact
    * match membership; the bucket width never changes the result.
    */
  private def j5(s: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(s, dir)
    val wins = ev.filter(col("user_id") % 10 === 0)
      .groupBy(col("user_id").as("win_id"))
      .agg(min(col("ts")).as("win_start"))
      .withColumn("win_end", col("win_start") + expr("INTERVAL 4 HOURS"))
    graft.operators.RangeJoin.pointInIntervalAuto(
      ev.select(col("ts"), col("event_id"), col("user_id")),
      wins, "ts", "win_start", "win_end")
      .groupBy(col("win_id"))
      .agg(
        count(lit(1)).as("n_events"),
        sum(col("event_id")).as("sum_event_ids"),
        countDistinct(col("user_id")).as("n_users"))
  }

  /** Bench variant of j5 — the `n_users` countDistinct is Verify-only
    * membership pinning: its distinct EXPAND keys the partial aggregation
    * by (win_id, user_id), a key space that grows with MATCH volume
    * (~750M pairs at sf10 on the fixed 30-day range), and the agg hash map
    * thrash-spills for ~30 min per task while the join itself streams
    * (measured via jstack: FastHashMap findOrInsert +
    * destructAndCreateExternalSorter loop). count+sum still CONSUME every
    * matched row — the bench keeps the operator's full output volume and
    * drops only the distinct expand, so sf-scaling measures the range
    * join, not the oracle's membership pin.
    */
  private def j5Bench(s: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(s, dir)
    val wins = ev.filter(col("user_id") % 10 === 0)
      .groupBy(col("user_id").as("win_id"))
      .agg(min(col("ts")).as("win_start"))
      .withColumn("win_end", col("win_start") + expr("INTERVAL 4 HOURS"))
    graft.operators.RangeJoin.pointInIntervalAuto(
      ev.select(col("ts"), col("event_id"), col("user_id")),
      wins, "ts", "win_start", "win_end")
      .groupBy(col("win_id"))
      .agg(
        count(lit(1)).as("n_events"),
        sum(col("event_id")).as("sum_event_ids"))
  }

  private val j5Sql =
    """WITH e AS (SELECT event_id, user_id, ts::TIMESTAMP AS ts FROM events),
      |w AS (SELECT user_id AS win_id, MIN(ts) AS ws, MIN(ts) + INTERVAL 4 HOUR AS we
      |      FROM e WHERE user_id % 10 = 0 GROUP BY 1)
      |SELECT win_id, COUNT(*) AS n_events,
      |  CAST(SUM(e.event_id) AS BIGINT) AS sum_event_ids,
      |  COUNT(DISTINCT e.user_id) AS n_users
      |FROM w JOIN e ON e.ts >= w.ws AND e.ts < w.we
      |GROUP BY win_id""".stripMargin

  /** J5-hot — the range join under deliberate time skew (the J4 treatment
    * applied to J5, closing the operator's own scaladoc concession that
    * bucket keys inherit the time distribution): every event timestamp is
    * folded into ONE hot hour (`hot0 + us % 1h` — a flash-crash shape), so
    * with an hour-wide bucket the equi-join collapses to a single bucket
    * key and one reducer drags the stage. Windows are six staggered 10-min
    * slots keyed by `win_id % 6`. Windows come from a FIXED stratum
    * (`user_id % 29` — ≤ 29 windows at ANY scale factor), so total match
    * volume is `n_events × ~29/6` — LINEAR in the data, where a
    * per-user window set would grow matches quadratically with SF and the
    * fixture would stop measuring skew and start measuring its own output.
    * The `salted` variant replicates each window across 8 salt lanes while
    * points hash-pick one
    * ([[graft.operators.RangeJoin.pointInIntervalSalted]]) — 8× the key
    * space at 8× a SMALL interval side, the right trade in exactly this
    * shape. Both variants are bit-identical and replay against the one
    * oracle; the bench rows make the skew cost visible the way
    * `j4_hot_plain`/`j4_hot_salted` do.
    */
  private val hot0Us = 1705320000000000L // 2024-01-15T12:00:00Z, µs

  private def j5Hot(salted: Boolean)(s: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(s, dir)
      .select(col("event_id"), col("user_id"),
        timestamp_micros(lit(hot0Us) +
          pmod(unix_micros(col("ts")), lit(3600000000L))).as("hts"))
    val wins = Tables.events(s, dir)
      .select((col("user_id") % 29).as("win_id")).distinct()
      .withColumn("win_start",
        timestamp_micros(lit(hot0Us) + (col("win_id") % 6) * lit(600000000L)))
      .withColumn("win_end",
        timestamp_micros(lit(hot0Us) + (col("win_id") % 6 + 1) * lit(600000000L)))
    val joined =
      if (salted)
        graft.operators.RangeJoin.pointInIntervalSalted(
          ev, wins, "hts", "win_start", "win_end",
          bucketSeconds = 3600L, salt = 8)
      else
        graft.operators.RangeJoin.pointInInterval(
          ev, wins, "hts", "win_start", "win_end", bucketSeconds = 3600L)
    joined.groupBy(col("win_id"))
      .agg(
        count(lit(1)).as("n_events"),
        sum(col("event_id")).as("sum_event_ids"),
        countDistinct(col("user_id")).as("n_users"))
  }

  private val j5HotSql =
    """WITH e AS (SELECT event_id, user_id,
      |    1705320000000000 + (epoch_us(ts::TIMESTAMP) % 3600000000) AS hus
      |  FROM events),
      |u AS (SELECT DISTINCT user_id % 29 AS win_id FROM events),
      |w AS (SELECT win_id,
      |    1705320000000000 + (win_id % 6) * 600000000 AS ws,
      |    1705320000000000 + (win_id % 6 + 1) * 600000000 AS we
      |  FROM u)
      |SELECT win_id, COUNT(*) AS n_events,
      |  CAST(SUM(e.event_id) AS BIGINT) AS sum_event_ids,
      |  COUNT(DISTINCT e.user_id) AS n_users
      |FROM w JOIN e ON e.hus >= w.ws AND e.hus < w.we
      |GROUP BY win_id""".stripMargin

  /** Cohort retention matrix: users bucketed by the epoch-week of their
    * FIRST event (the cohort), then per (cohort, week-offset) the count of
    * users still active and its share of the cohort's size. Weeks are
    * epoch-based (`unix_micros div 7-day-µs`) — a pure integer bucket both
    * engines compute identically, with no week-of-year/locale semantics.
    *
    * Distributed shape: (user, week) pairs dedupe in a partial-aggregating
    * groupBy (map-side combine absorbs each user's intra-week events before
    * the exchange), the per-user first week is a window min over the user
    * partition, and everything after operates on ≤ users × weeks rows —
    * at 100 TB the heavy exchange is the first dedupe, carrying one row
    * per (user, active-week), never the raw events. The cohort-size
    * denominator is a second tiny window over the cohort partition
    * (offset 0 is the cohort size by construction: every user is active
    * in their first week).
    */
  private def q15(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val weekUs = 7L * 86400L * 1000000L
    val uw = Tables.events(s, dir)
      .select(col("user_id"), (unix_micros(col("ts")) / weekUs).cast("long").as("week"))
      .groupBy(col("user_id"), col("week")).agg(count(lit(1)).as("_n")).drop("_n")
    val withCohort = uw.withColumn("cohort_week",
      min(col("week")).over(Window.partitionBy(col("user_id"))))
    val cells = withCohort
      .groupBy(col("cohort_week"), (col("week") - col("cohort_week")).as("offset_weeks"))
      .agg(count(lit(1)).as("n_users"))
    cells
      .withColumn("cohort_size",
        sum(when(col("offset_weeks") === 0, col("n_users")).otherwise(0L))
          .over(Window.partitionBy(col("cohort_week"))))
      .withColumn("retention_pct",
        col("n_users").cast("double") * lit(100.0) / col("cohort_size").cast("double"))
      .select(col("cohort_week"), col("offset_weeks"), col("n_users"),
        col("cohort_size"), col("retention_pct"))
  }

  private val q15Sql = {
    val weekUs = 7L * 86400L * 1000000L
    s"""WITH uw AS (
       |  SELECT DISTINCT user_id, epoch_us(ts::TIMESTAMP) // $weekUs AS week
       |  FROM events),
       |c AS (SELECT user_id, week,
       |    MIN(week) OVER (PARTITION BY user_id) AS cohort_week FROM uw),
       |cells AS (SELECT cohort_week, week - cohort_week AS offset_weeks,
       |    CAST(COUNT(*) AS BIGINT) AS n_users
       |  FROM c GROUP BY 1, 2),
       |sized AS (SELECT *,
       |    SUM(CASE WHEN offset_weeks = 0 THEN n_users ELSE 0 END)
       |      OVER (PARTITION BY cohort_week) AS cohort_size
       |  FROM cells)
       |SELECT cohort_week, offset_weeks, n_users,
       |  CAST(cohort_size AS BIGINT) AS cohort_size,
       |  CAST(n_users AS DOUBLE) * 100.0 / CAST(cohort_size AS DOUBLE) AS retention_pct
       |FROM sized""".stripMargin
  }

  /** Ordered 3-step funnel (view → click → purchase): per user, the first
    * view, the first click strictly after it, the first purchase strictly
    * after that; reported as per-step reached-user counts and conversion
    * shares. The classic product-analytics query, Spark-first:
    *
    * Distributed shape: three conditional-min aggregations chained by
    * co-partitioned joins — every groupBy and join keys on `user_id`, so
    * after the first exchange the chain reuses the same hash
    * partitioning; each pass scans only its step's events (the
    * `event_type` equality is pushed to the parquet scan). Per-user state
    * is one timestamp per step — never an event list — so the shape holds
    * when one user has millions of events. The final count is a single
    * partial+final aggregate to one row.
    */
  private def q16(s: SparkSession, dir: String): DataFrame = {
    val e = Tables.events(s, dir).select(col("user_id"), col("event_type"), col("ts"))
    val t1 = e.filter(col("event_type") === "view")
      .groupBy(col("user_id")).agg(min(col("ts")).as("t1"))
    val t2 = e.filter(col("event_type") === "click")
      .join(t1, "user_id").filter(col("ts") > col("t1"))
      .groupBy(col("user_id")).agg(min(col("ts")).as("t2"))
    val t3 = e.filter(col("event_type") === "purchase")
      .join(t2, "user_id").filter(col("ts") > col("t2"))
      .groupBy(col("user_id")).agg(min(col("ts")).as("t3"))
    t1.join(t2, Seq("user_id"), "left").join(t3, Seq("user_id"), "left")
      .agg(
        count(col("t1")).as("n_view"),
        count(col("t2")).as("n_click_after"),
        count(col("t3")).as("n_purchase_after"))
      .withColumn("pct_click",
        col("n_click_after").cast("double") * lit(100.0) / col("n_view").cast("double"))
      .withColumn("pct_purchase",
        col("n_purchase_after").cast("double") * lit(100.0) / col("n_view").cast("double"))
  }

  private val q16Sql =
    """WITH t1 AS (
      |  SELECT user_id, MIN(ts::TIMESTAMP) AS t1 FROM events
      |  WHERE event_type = 'view' GROUP BY 1),
      |t2 AS (
      |  SELECT e.user_id, MIN(e.ts::TIMESTAMP) AS t2 FROM events e
      |  JOIN t1 ON e.user_id = t1.user_id AND e.ts::TIMESTAMP > t1.t1
      |  WHERE e.event_type = 'click' GROUP BY 1),
      |t3 AS (
      |  SELECT e.user_id, MIN(e.ts::TIMESTAMP) AS t3 FROM events e
      |  JOIN t2 ON e.user_id = t2.user_id AND e.ts::TIMESTAMP > t2.t2
      |  WHERE e.event_type = 'purchase' GROUP BY 1),
      |f AS (SELECT
      |    CAST(COUNT(t1.t1) AS BIGINT) AS n_view,
      |    CAST(COUNT(t2.t2) AS BIGINT) AS n_click_after,
      |    CAST(COUNT(t3.t3) AS BIGINT) AS n_purchase_after
      |  FROM t1
      |  LEFT JOIN t2 ON t1.user_id = t2.user_id
      |  LEFT JOIN t3 ON t1.user_id = t3.user_id)
      |SELECT n_view, n_click_after, n_purchase_after,
      |  CAST(n_click_after AS DOUBLE) * 100.0 / CAST(n_view AS DOUBLE) AS pct_click,
      |  CAST(n_purchase_after AS DOUBLE) * 100.0 / CAST(n_view AS DOUBLE) AS pct_purchase
      |FROM f""".stripMargin

  /** Gap-based sessionization (30-minute inactivity timeout): the batch
    * twin of the streaming `session_window_agg` row. Classic two-window
    * construction — lag over (user, ts) marks session starts, a running
    * sum of the start flags numbers sessions, then one groupBy emits per-
    * session stats. Ordering ties are pinned by event_id (unique), so both
    * engines see identical session boundaries.
    *
    * Distributed shape: both windows and the final groupBy key on
    * `user_id` — ONE exchange, reused by every step (the session groupBy
    * is (user, session) — a refinement of the user partitioning, no second
    * shuffle of the events). Per-user partitions are bounded by that
    * user's event count; no global sort anywhere. Money sums are
    * exact-decimal ([[Det.dsum]]) so hashes match DuckDB bit-for-bit.
    */
  private def q17(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val gapUs = 30L * 60L * 1000000L
    val w = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
    val wCum = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    Tables.events(s, dir)
      .select(col("user_id"), col("ts"), col("event_id"), col("value"))
      .withColumn("__prev", lag(col("ts"), 1).over(w))
      .withColumn("__new",
        (col("__prev").isNull ||
          unix_micros(col("ts")) - unix_micros(col("__prev")) > gapUs).cast("int"))
      .withColumn("session_id", sum(col("__new")).over(wCum))
      .groupBy(col("user_id"), col("session_id"))
      .agg(
        count(lit(1)).as("n_events"),
        tsMicros(min(col("ts"))).as("session_start"),
        expr("(unix_micros(max(ts)) - unix_micros(min(ts))) div 1000000")
          .as("duration_sec"),
        dsum(col("value")).as("sum_value"))
  }

  private val q17Sql = {
    val gapUs = 30L * 60L * 1000000L
    s"""WITH e AS (
       |  SELECT user_id, ts::TIMESTAMP AS ts, event_id, value,
       |    lag(ts::TIMESTAMP) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev
       |  FROM events),
       |m AS (SELECT *,
       |    CASE WHEN prev IS NULL
       |              OR epoch_us(ts) - epoch_us(prev) > $gapUs THEN 1 ELSE 0 END AS new_s
       |  FROM e),
       |s AS (SELECT *,
       |    SUM(new_s) OVER (PARTITION BY user_id ORDER BY ts, event_id
       |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS session_id
       |  FROM m)
       |SELECT user_id, CAST(session_id AS BIGINT) AS session_id,
       |  COUNT(*) AS n_events,
       |  strftime(MIN(ts), '%Y-%m-%d %H:%M:%S.%f') AS session_start,
       |  CAST((epoch_us(MAX(ts)) - epoch_us(MIN(ts))) // 1000000 AS BIGINT) AS duration_sec,
       |  CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value
       |FROM s GROUP BY user_id, session_id""".stripMargin
  }

  val all: Seq[Q] = Seq(
    Q("q01_pricing_summary", q01, Some(q01Sql), headline = true, benchRun = Some(q01Bench)),
    Q("q17_sessionize", q17, Some(q17Sql)),
    Q("j4_salted_join", j4, Some(j4Sql)),
    Q("j4_hot_salted", j4Hot(salted = true), Some(j4Sql), headline = true),
    Q("j4_hot_plain", j4Hot(salted = false), Some(j4Sql), headline = true),
    Q("q02_revenue_by_nation", q02, Some(q02Sql), headline = true, benchRun = Some(q02x(exact = false))),
    Q("q03_top_orders", q03, Some(q03Sql)),
    Q("q04_segment_with_orders", q04, Some(q04Sql)),
    Q("q05_customers_no_orders", q05, Some(q05Sql)),
    Q("q06_running_user_value", q06, Some(q06Sql), headline = true, benchRun = Some(q06x(exact = false))),
    Q("q07_rolling_avg_value", q07, Some(q07Sql)),
    Q("q08_lag_diff_value", q08, Some(q08Sql)),
    Q("q09_part_brand_stats", q09, Some(q09Sql)),
    Q("q10_union_filtered", q10, Some(q10Sql)),
    Q("q11_rollup_revenue", q11, Some(q11Sql)),
    Q("q12_pivot_daily", q12, Some(q12Sql)),
    Q("q13_exact_quantiles", q13, Some(q13Sql)),
    Q("q18_cube_grouping", q18, Some(q18Sql)),
    Q("q14_topk_per_group", q14, Some(q14Sql)),
    Q("j5_range_join", j5, Some(j5Sql), headline = true, benchRun = Some(j5Bench)),
    Q("j5_hot_plain", j5Hot(salted = false), Some(j5HotSql), headline = true),
    Q("j5_hot_salted", j5Hot(salted = true), Some(j5HotSql), headline = true),
    Q("q15_retention_cohorts", q15, Some(q15Sql)),
    Q("q16_funnel_steps", q16, Some(q16Sql))
  )
}
