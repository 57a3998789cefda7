package graft.queries

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType
import org.apache.spark.sql.{Column, DataFrame, SparkSession}

import graft.core.Tables
import graft.functions.Sketches

/** Sketch operators as oracle-checked queries: HyperLogLog distinct counts,
  * count-min heavy hitters, Bloom-filter join pruning — all on the
  * [[graft.functions.Sketches]] 61-bit universal hash, so the DuckDB oracle
  * replays every register, cell, and bit EXACTLY and the gate hash-checks
  * estimate values, not just error bounds. Each query also carries the
  * exact answer alongside the sketch's, making the estimate error itself an
  * oracle-checked column.
  *
  * Scale shapes (the reason sketches exist at 100 TB):
  *  - HLL: per-group state is 256 bytes regardless of cardinality; the
  *    groupBy(max) register pass partial-aggregates map-side, so the
  *    shuffle carries ≤ groups × 256 cells, never the data.
  *  - CMS: the d×w cell grid partial-aggregates the same way (shuffle ≤
  *    d·w cells/partition); the per-key probe is a broadcast join.
  *  - Bloom: the bitmask is bounded by m bits whatever the build-side
  *    cardinality (the driver collects ≤ m DISTINCT positions, exactly
  *    like Spark's own runtime-filter blooms merge on the driver), and the
  *    probe is a map-side filter — zero shuffle ahead of the pruned join.
  */
object QueriesSketch {

  private val M61s = "2305843009213693951"

  /** DuckDB replay of [[graft.functions.Hash61Kernel]]: exact in HUGEINT.
    * The inner reduction mirrors the kernel's floorMod: DuckDB's % is
    * sign-preserving, so negative keys need the ((x % M) + M) % M form to
    * land in [0, M61) like the engine does — total over the long range.
    */
  private def hSql(x: String, ab: (Long, Long)): String =
    s"CAST(((CAST(${ab._1} AS HUGEINT) * ((($x % $M61s) + $M61s) % $M61s) + ${ab._2}) % $M61s) AS BIGINT)"

  // ---------------------------------------------------------------- HLL --

  private val HllM = 256
  /** α·m² · 2^60 precomputed once and inlined into BOTH engines as the same
    * double literal, so the estimate is a single correctly-rounded division
    * per group (`K / S`) — bit-identical across engines by IEEE 754.
    */
  private val HllK: Double = {
    val alpha = 0.7213 / (1.0 + 1.079 / HllM)
    alpha * HllM * HllM * math.pow(2.0, 60.0)
  }
  private val Pow60 = 1152921504606846976L // 2^60

  /** Per-event-type HLL(m=256) distinct-user estimate next to the exact
    * count. Register rho = 54 − bitlength(h >>> 8) over the 53-bit tail of
    * the 61-bit hash; the harmonic sum Σ2^(−reg) is computed EXACTLY as the
    * integer Σ2^(60−reg) in DECIMAL(38,0) (empty buckets contribute 2^60 via
    * the (m − n_present) term — no bucket spine join needed), so the only
    * floating-point steps are one cast and one division, both correctly
    * rounded. The standard small-range linear-counting branch
    * (E ≤ 2.5m ∧ V > 0 → m·ln(m/V)) rounds to an integer estimate, so a
    * sub-ulp libm ln() difference cannot surface. Exercised for real: at
    * sf0.01 each type has 150 distinct users → linear counting; at sf0.1+
    * (1500+) → the raw HLL branch.
    */
  private def hllDistinct(s: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(s, dir).select(col("event_type"), col("user_id"))
    val h = Sketches.hash61(col("user_id"), Sketches.HllParams._1, Sketches.HllParams._2)
    val hashed = ev.select(col("event_type"),
      pmod(h, lit(HllM.toLong)).as("bucket"), shiftright(h, 8).as("rest"))
    val rho = when(col("rest") === 0L, lit(54)).otherwise(lit(54) - length(bin(col("rest"))))
    val perBucket = hashed.select(col("event_type"), col("bucket"), rho.as("rho"))
      .groupBy(col("event_type"), col("bucket")).agg(max(col("rho")).as("reg"))
    val agg = perBucket.groupBy(col("event_type")).agg(
      sum(expr("CAST(shiftleft(CAST(1 AS BIGINT), CAST(60 - reg AS INT)) AS DECIMAL(38,0))"))
        .as("s_present"),
      count(lit(1)).as("n_present"))
    val stats = agg.select(col("event_type"),
      (col("s_present") +
        (lit(HllM.toLong) - col("n_present")).cast(DecimalType(38, 0)) *
          lit(Pow60).cast(DecimalType(38, 0))).as("s_all"),
      (lit(HllM.toLong) - col("n_present")).as("v_zero"))
    val exact = ev.groupBy(col("event_type")).agg(countDistinct(col("user_id")).as("n_exact"))
    val withRaw = stats.join(exact, "event_type")
      .withColumn("hll_raw", lit(HllK) / col("s_all").cast("double"))
    withRaw.select(
      col("event_type"), col("n_exact"), col("v_zero"), col("hll_raw"),
      when(col("hll_raw") <= lit(2.5 * HllM) && col("v_zero") > 0,
        round(lit(HllM.toDouble) * log(lit(HllM.toDouble) / col("v_zero").cast("double"))))
        .otherwise(round(col("hll_raw"))).cast("long").as("hll_est"))
      .withColumn("err_pct",
        (col("hll_est") - col("n_exact")).cast("double") * lit(100.0) / col("n_exact").cast("double"))
  }

  /** Shared with `stream_hll_distinct`: the streaming HLL emits rows that
    * hash-match this same oracle (batch ≡ stream ≡ oracle).
    */
  val hllDistinctSql: String = {
    val h = hSql("user_id", Sketches.HllParams)
    s"""WITH e AS (SELECT event_type, user_id FROM events),
       |h AS (SELECT event_type, $h AS h61 FROM e),
       |hb AS (SELECT event_type, h61 % $HllM AS bucket, h61 >> 8 AS rest FROM h),
       |pb AS (SELECT event_type, bucket,
       |    MAX(CASE WHEN rest = 0 THEN 54 ELSE 54 - length(bin(rest)) END) AS reg
       |  FROM hb GROUP BY 1, 2),
       |ag AS (SELECT event_type,
       |    SUM(CAST((CAST(1 AS BIGINT) << CAST(60 - reg AS INTEGER)) AS DECIMAL(38,0))) AS s_present,
       |    CAST(COUNT(*) AS BIGINT) AS n_present
       |  FROM pb GROUP BY 1),
       |st AS (SELECT event_type,
       |    s_present + ($HllM - n_present) * CAST($Pow60 AS DECIMAL(38,0)) AS s_all,
       |    $HllM - n_present AS v_zero
       |  FROM ag),
       |ex AS (SELECT event_type, CAST(COUNT(DISTINCT user_id) AS BIGINT) AS n_exact
       |  FROM e GROUP BY 1),
       |fin AS (SELECT st.event_type, n_exact, v_zero,
       |    $HllK / CAST(s_all AS DOUBLE) AS hll_raw
       |  FROM st JOIN ex USING (event_type)),
       |est AS (SELECT *,
       |    CASE WHEN hll_raw <= ${2.5 * HllM} AND v_zero > 0
       |         THEN CAST(ROUND($HllM.0 * ln($HllM.0 / CAST(v_zero AS DOUBLE))) AS BIGINT)
       |         ELSE CAST(ROUND(hll_raw) AS BIGINT) END AS hll_est
       |  FROM fin)
       |SELECT event_type, n_exact, v_zero, hll_raw, hll_est,
       |  CAST(hll_est - n_exact AS DOUBLE) * 100.0 / CAST(n_exact AS DOUBLE) AS err_pct
       |FROM est""".stripMargin
  }

  // ---------------------------------------------------------------- CMS --

  private val CmsW = 4096L // ≈ rows/w expected overcount: ~2 at sf0.01, ~24 at sf0.1

  private def cmsBuckets(key: Column): Column =
    array(Sketches.CmsParams.zipWithIndex.map { case ((a, b), i) =>
      struct(lit(i).as("r"), pmod(Sketches.hash61(key, a, b), lit(CmsW)).as("bucket"))
    }: _*)

  /** Count-min(d=4, w=4096) frequency estimates for the top-5 users by
    * exact count (ties broken by user_id, both engines). The sketch
    * overcounts or is exact, never under — `overcount = cms_est − exact_cnt
    * ≥ 0` is the CMS guarantee as an oracle-checked column, nonzero in
    * practice (expected ≈ rows/w collision mass per cell, min over d rows).
    */
  private def cmsHeavy(s: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(s, dir).select(col("user_id"))
    val cells = ev.select(explode(cmsBuckets(col("user_id"))).as("c"))
      .select(col("c.r").as("r"), col("c.bucket").as("bucket"))
    val sketch = cells.groupBy(col("r"), col("bucket")).agg(count(lit(1)).as("cnt"))
    val exact = ev.groupBy(col("user_id")).agg(count(lit(1)).as("exact_cnt"))
    val top = exact.orderBy(col("exact_cnt").desc, col("user_id").asc).limit(5)
    val kb = top.select(col("user_id"), col("exact_cnt"),
        explode(cmsBuckets(col("user_id"))).as("c"))
      .select(col("user_id"), col("exact_cnt"), col("c.r").as("r"), col("c.bucket").as("bucket"))
    kb.join(broadcast(sketch), Seq("r", "bucket"))
      .groupBy(col("user_id"), col("exact_cnt"))
      .agg(min(col("cnt")).as("cms_est"))
      .select(col("user_id"), col("exact_cnt"), col("cms_est"),
        (col("cms_est") - col("exact_cnt")).as("overcount"))
  }

  private val cmsHeavySql = {
    def rowSelects(from: String, prefix: String): String =
      Sketches.CmsParams.zipWithIndex.map { case (ab, i) =>
        s"SELECT $prefix$i AS r, ${hSql("user_id", ab)} % $CmsW AS bucket$from"
      }.mkString("\n  UNION ALL ")
    val kbSelects = Sketches.CmsParams.zipWithIndex.map { case (ab, i) =>
      s"SELECT user_id, exact_cnt, $i AS r, ${hSql("user_id", ab)} % $CmsW AS bucket FROM top"
    }.mkString("\n  UNION ALL ")
    s"""WITH e AS (SELECT user_id FROM events),
       |cells AS (
       |  ${rowSelects(" FROM e", "")}),
       |sk AS (SELECT r, bucket, CAST(COUNT(*) AS BIGINT) AS cnt FROM cells GROUP BY 1, 2),
       |ex AS (SELECT user_id, CAST(COUNT(*) AS BIGINT) AS exact_cnt FROM e GROUP BY 1),
       |top AS (SELECT * FROM ex ORDER BY exact_cnt DESC, user_id ASC LIMIT 5),
       |kb AS (
       |  $kbSelects)
       |SELECT kb.user_id, kb.exact_cnt, MIN(sk.cnt) AS cms_est,
       |  MIN(sk.cnt) - kb.exact_cnt AS overcount
       |FROM kb JOIN sk USING (r, bucket) GROUP BY 1, 2""".stripMargin
  }

  // -------------------------------------------------------------- Bloom --

  private val BloomM = 131072 // 2^17 bits = 2048 words; sized ≈ 16·n at sf1

  /** Bloom(m=2^17, k=3) join pruning audit: the bitmask is built from the
    * urgent orders' keys, lineitem probes it, and the row counts prove both
    * properties — `false_neg = 0` (every true match passes) and `false_pos`
    * small (the pruning value). The driver-side collect is of DISTINCT bit
    * positions, bounded by m — independent of build cardinality, the same
    * shape as Spark's own runtime-filter bloom merge. This query keeps the
    * unpruned rows to AUDIT the filter; the production plan — filter before
    * the join, map-side, zero added shuffle — is pinned by PlanSpec.
    */
  private def bloomPrune(s: SparkSession, dir: String): DataFrame = {
    val urgent = Tables.orders(s, dir)
      .filter(col("o_orderpriority") === "1-URGENT")
      .select(col("o_orderkey").as("k")).distinct()
    val posCols = Sketches.BloomParams.map { case (a, b) =>
      pmod(Sketches.hash61(col("k"), a, b), lit(BloomM.toLong))
    }
    val positions = urgent.select(explode(array(posCols: _*)).as("pos"))
      .distinct().collect().map(_.getLong(0))
    val mask = Sketches.maskFromPositions(positions, BloomM)
    val li = Tables.lineitem(s, dir).select(col("l_orderkey"))
      .withColumn("pass",
        Sketches.bloomMightContain(col("l_orderkey"), mask, Sketches.BloomParams))
    li.join(broadcast(urgent), li("l_orderkey") === urgent("k"), "left")
      .agg(
        count(lit(1)).as("probe_rows"),
        sum(when(col("pass"), 1L).otherwise(0L)).as("bloom_pass"),
        sum(when(col("k").isNotNull, 1L).otherwise(0L)).as("true_match"),
        sum(when(col("pass") && col("k").isNull, 1L).otherwise(0L)).as("false_pos"),
        sum(when(!col("pass") && col("k").isNotNull, 1L).otherwise(0L)).as("false_neg"))
      .crossJoin(urgent.agg(count(lit(1)).as("n_build"))) // 1-row × 1-row scalar assembly
  }

  private val bloomPruneSql = {
    val bitSelects = Sketches.BloomParams.map { ab =>
      s"SELECT DISTINCT ${hSql("k", ab)} % $BloomM AS pos FROM urgent"
    }.mkString("\n  UNION ")
    val passConj = Sketches.BloomParams.map { ab =>
      s"(${hSql("pk", ab)} % $BloomM) IN (SELECT pos FROM bits)"
    }.mkString("\n    AND ")
    s"""WITH urgent AS (
       |  SELECT DISTINCT o_orderkey AS k FROM orders WHERE o_orderpriority = '1-URGENT'),
       |bits AS (
       |  $bitSelects),
       |keys AS (SELECT DISTINCT l_orderkey AS pk FROM lineitem),
       |kp AS (SELECT pk,
       |    $passConj AS pass,
       |    pk IN (SELECT k FROM urgent) AS is_u
       |  FROM keys)
       |SELECT
       |  (SELECT CAST(COUNT(*) AS BIGINT) FROM urgent) AS n_build,
       |  CAST(COUNT(*) AS BIGINT) AS probe_rows,
       |  CAST(SUM(CASE WHEN pass THEN 1 ELSE 0 END) AS BIGINT) AS bloom_pass,
       |  CAST(SUM(CASE WHEN is_u THEN 1 ELSE 0 END) AS BIGINT) AS true_match,
       |  CAST(SUM(CASE WHEN pass AND NOT is_u THEN 1 ELSE 0 END) AS BIGINT) AS false_pos,
       |  CAST(SUM(CASE WHEN is_u AND NOT pass THEN 1 ELSE 0 END) AS BIGINT) AS false_neg
       |FROM lineitem l JOIN kp ON l.l_orderkey = kp.pk""".stripMargin
  }

  /** Bloom-prefiltered semi join (J6) — the PRODUCTION twin of
    * sk_bloom_prune's audit row. The mask built from the selective build
    * side (urgent big-ticket orders) filters lineitem MAP-SIDE, ahead of
    * the semi join's exchange; the exact `left_semi` then removes the
    * false positives, so the result is bit-identical to the plain semi
    * join the oracle runs. At 100 TB this is the shape that matters: the
    * probe-side shuffle carries only `true_match + false_pos` rows instead
    * of the full table, while the bitmask riding the closure is m bits
    * regardless of build cardinality (the driver collects ≤ m DISTINCT
    * positions, same merge shape as Spark's own InjectRuntimeFilter).
    * No false negatives by construction — pinned by sk_bloom_prune's
    * `false_neg` column being hash-checked at 0.
    */
  private def j6BloomSemi(s: SparkSession, dir: String): DataFrame = {
    val sel = Tables.orders(s, dir)
      .filter(col("o_orderpriority") === "1-URGENT" && col("o_totalprice") > 250000.0)
      .select(col("o_orderkey").as("k")).distinct()
    val posCols = Sketches.BloomParams.map { case (a, b) =>
      pmod(Sketches.hash61(col("k"), a, b), lit(BloomM.toLong))
    }
    val positions = sel.select(explode(array(posCols: _*)).as("pos"))
      .distinct().collect().map(_.getLong(0)) // bounded by m bits, not build rows
    val mask = Sketches.maskFromPositions(positions, BloomM)
    val li = Tables.lineitem(s, dir)
      .filter(Sketches.bloomMightContain(col("l_orderkey"), mask, Sketches.BloomParams))
    li.join(sel, li("l_orderkey") === sel("k"), "left_semi")
      .groupBy(col("l_returnflag"))
      .agg(
        count(lit(1)).as("n_rows"),
        sum(col("l_extendedprice").cast(DecimalType(18, 2))).cast("double").as("sum_price"))
  }

  /** Oracle: the PLAIN semi join — the bloom must be invisible in the
    * result.
    */
  private val j6BloomSemiSql =
    """SELECT l_returnflag, CAST(COUNT(*) AS BIGINT) AS n_rows,
      |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_price
      |FROM lineitem
      |WHERE l_orderkey IN (SELECT o_orderkey FROM orders
      |  WHERE o_orderpriority = '1-URGENT' AND o_totalprice > 250000)
      |GROUP BY l_returnflag""".stripMargin

  // ---------------------------------------------------------------- KMV --

  private val KmvK = 64
  /** (k−1)·M61 as one double literal shared by both engines (same trick as
    * [[HllK]]): the estimate is then a single correctly-rounded division.
    */
  private val KmvNumer: Double = (KmvK - 1).toDouble * Sketches.M61.toDouble

  /** KMV (k-minimum-values) distinct sketch, k=64: per event type, the k
    * smallest distinct 61-bit hashes of user_id — simultaneously a
    * mergeable distinct-count estimator (est = (k−1)·M61 / h_(k), the
    * classic KMV unbiased form) and a DETERMINISTIC uniform sample of
    * distinct users (bottom-k hashing), reproducible on any rerun or
    * partitioning, unlike reservoir sampling. State rides the typed
    * [[graft.operators.BottomKDistinctAggregator]]: bounded ≤ k longs per
    * group with in-buffer dedup, partial-aggregated map-side — the shuffle
    * carries O(groups × k) values, never the data, and no distinct()
    * pre-pass. `hk` and `xor_bottomk` pin the exact sample content; the
    * small-cardinality branch (fewer than k distinct hashes → the count
    * itself) is exercised for real at sf0.001 (15 users < 64 < 150).
    */
  private def kmvDistinct(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val ev = Tables.events(s, dir).select(col("event_type"), col("user_id"))
    val hashed = ev.select(col("event_type"),
      Sketches.hash61(col("user_id"), Sketches.KmvParams._1, Sketches.KmvParams._2).as("h"))
    val bk = hashed.as[(String, Long)]
      .groupByKey(_._1)
      .mapValues(_._2)
      .agg(graft.operators.BottomKDistinctAggregator(KmvK).toColumn.name("bk"))
      .toDF("event_type", "bk")
    val exact = ev.groupBy(col("event_type")).agg(countDistinct(col("user_id")).as("n_exact"))
    bk.join(exact, "event_type")
      .select(
        col("event_type"), col("n_exact"),
        size(col("bk")).cast("long").as("k_used"),
        element_at(col("bk"), size(col("bk"))).as("hk"),
        aggregate(col("bk"), lit(0L), (acc, x) => acc.bitwiseXOR(x)).as("xor_bottomk"))
      .withColumn("kmv_est",
        round(when(col("k_used") < KmvK, col("k_used").cast("double"))
          .otherwise(lit(KmvNumer) / col("hk").cast("double"))).cast("long"))
  }

  private val kmvDistinctSql = {
    val h = hSql("user_id", Sketches.KmvParams)
    s"""WITH e AS (SELECT event_type, user_id FROM events),
       |h AS (SELECT DISTINCT event_type, $h AS h FROM e),
       |r AS (SELECT event_type, h,
       |    ROW_NUMBER() OVER (PARTITION BY event_type ORDER BY h) AS rn FROM h),
       |b AS (SELECT event_type, CAST(COUNT(*) AS BIGINT) AS k_used, MAX(h) AS hk,
       |    CAST(bit_xor(h) AS BIGINT) AS xor_bottomk
       |  FROM r WHERE rn <= $KmvK GROUP BY 1),
       |ex AS (SELECT event_type, CAST(COUNT(DISTINCT user_id) AS BIGINT) AS n_exact
       |  FROM e GROUP BY 1)
       |SELECT b.event_type, n_exact, k_used, hk, xor_bottomk,
       |  CAST(ROUND(CASE WHEN k_used < $KmvK THEN CAST(k_used AS DOUBLE)
       |       ELSE $KmvNumer / CAST(hk AS DOUBLE) END) AS BIGINT) AS kmv_est
       |FROM b JOIN ex USING (event_type)""".stripMargin
  }

  // -------------------------------------------------------------- theta --

  private val ThetaK = 64

  /** Theta-sketch set operations across two tables (k=64): per event type,
    * estimate |A ∪ B| and |A ∩ B| where A = distinct event users of that
    * type and B = distinct order customers — WITHOUT ever co-shuffling the
    * two tables. Each side builds its bottom-k-distinct-hash sketch
    * independently (bounded ≤ k state, map-side partials, O(groups × k)
    * shuffle; B's one-row sketch broadcasts); the set algebra then runs on
    * ≤ 2k longs per group: θ = min(θ_A, θ_B) with θ_side = k-th smallest
    * hash (M61 when under-full — everything retained), retained = hashes
    * < θ, and est = M61 · |retained| / θ (the standard theta-sketch
    * estimator, Dasgupta et al., "Theta-Sketch Framework"). At 100 TB this
    * is THE way to answer audience-overlap questions: the exact companions
    * computed alongside need a distinct + join over both key sets, the
    * sketch answers from two constant-size states. Every register is
    * replayed exactly by the DuckDB oracle (same 61-bit hash), so the gate
    * hash-checks θ, both retained counts, and both estimates.
    */
  private def thetaSetops(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val m61d = Sketches.M61.toDouble
    val h = (c: Column) =>
      Sketches.hash61(c, Sketches.KmvParams._1, Sketches.KmvParams._2)

    val aKeys = Tables.events(s, dir).select(col("event_type"), col("user_id"))
    val bKeys = Tables.orders(s, dir).select(col("o_custkey"))

    val bkA = aKeys.select(col("event_type"), h(col("user_id")).as("h"))
      .as[(String, Long)].groupByKey(_._1).mapValues(_._2)
      .agg(graft.operators.BottomKDistinctAggregator(ThetaK).toColumn.name("bka"))
      .toDF("event_type", "bka")
    val bkB = bKeys.select(h(col("o_custkey")).as("h"))
      .as[Long].groupByKey(_ => 0).mapValues(identity)
      .agg(graft.operators.BottomKDistinctAggregator(ThetaK).toColumn.name("bkb"))
      .toDF("g", "bkb").drop("g")

    def theta(bk: Column): Column =
      when(size(bk) < ThetaK, lit(Sketches.M61)).otherwise(element_at(bk, ThetaK))
    def estimate(ret: Column): Column =
      round(lit(m61d) * ret.cast("double") / col("theta").cast("double")).cast("long")

    val sketched = bkA.crossJoin(broadcast(bkB))
      .withColumn("theta", least(theta(col("bka")), theta(col("bkb"))))
      .select(col("event_type"), col("theta"),
        size(filter(array_union(col("bka"), col("bkb")), _ < col("theta")))
          .cast("long").as("union_ret"),
        size(filter(array_intersect(col("bka"), col("bkb")), _ < col("theta")))
          .cast("long").as("inter_ret"))
      .withColumn("union_est", estimate(col("union_ret")))
      .withColumn("inter_est", estimate(col("inter_ret")))

    val nA = aKeys.distinct().groupBy(col("event_type"))
      .agg(count(lit(1)).as("n_exact_a"))
    val nB = bKeys.distinct().agg(count(lit(1)).as("n_exact_b"))
    val inter = aKeys.distinct()
      .join(bKeys.distinct(), col("user_id") === col("o_custkey"))
      .groupBy(col("event_type")).agg(count(lit(1)).as("n_exact_inter"))
    val exact = nA.crossJoin(broadcast(nB))
      .join(inter, Seq("event_type"), "left")
      .withColumn("n_exact_inter", coalesce(col("n_exact_inter"), lit(0L)))
      .withColumn("n_exact_union",
        col("n_exact_a") + col("n_exact_b") - col("n_exact_inter"))

    sketched.join(exact, "event_type")
      .select(col("event_type"),
        col("n_exact_a"), col("n_exact_b"), col("n_exact_union"), col("n_exact_inter"),
        col("theta"), col("union_ret"), col("inter_ret"),
        col("union_est"), col("inter_est"))
  }

  private val thetaSetopsSql = {
    val m61d = Sketches.M61.toDouble
    val ha = hSql("user_id", Sketches.KmvParams)
    val hb = hSql("o_custkey", Sketches.KmvParams)
    s"""WITH ah AS (SELECT DISTINCT event_type, $ha AS h FROM events),
       |ar AS (SELECT event_type, h,
       |    ROW_NUMBER() OVER (PARTITION BY event_type ORDER BY h) AS rn FROM ah),
       |bka AS (SELECT event_type, h FROM ar WHERE rn <= $ThetaK),
       |tha AS (SELECT event_type,
       |    CASE WHEN COUNT(*) = $ThetaK THEN MAX(h) ELSE $M61s END AS theta_a
       |  FROM bka GROUP BY 1),
       |bh AS (SELECT DISTINCT $hb AS h FROM orders),
       |br AS (SELECT h, ROW_NUMBER() OVER (ORDER BY h) AS rn FROM bh),
       |bkb AS (SELECT h FROM br WHERE rn <= $ThetaK),
       |thb AS (SELECT CASE WHEN COUNT(*) = $ThetaK THEN MAX(h) ELSE $M61s END AS theta_b
       |  FROM bkb),
       |th AS (SELECT event_type, LEAST(theta_a, theta_b) AS theta FROM tha, thb),
       |uni AS (SELECT u.event_type, CAST(COUNT(DISTINCT u.h) AS BIGINT) AS union_ret
       |  FROM (SELECT event_type, h FROM bka
       |        UNION ALL
       |        SELECT t.event_type, b.h
       |        FROM (SELECT DISTINCT event_type FROM events) t, bkb b) u
       |  JOIN th ON u.event_type = th.event_type AND u.h < th.theta
       |  GROUP BY 1),
       |ints AS (SELECT bka.event_type, CAST(COUNT(*) AS BIGINT) AS inter_ret
       |  FROM bka JOIN bkb USING (h)
       |  JOIN th ON bka.event_type = th.event_type AND bka.h < th.theta
       |  GROUP BY 1),
       |na AS (SELECT event_type, CAST(COUNT(DISTINCT user_id) AS BIGINT) AS n_exact_a
       |  FROM events GROUP BY 1),
       |nb AS (SELECT CAST(COUNT(DISTINCT o_custkey) AS BIGINT) AS n_exact_b FROM orders),
       |ni AS (SELECT e.event_type, CAST(COUNT(*) AS BIGINT) AS n_exact_inter
       |  FROM (SELECT DISTINCT event_type, user_id FROM events) e
       |  JOIN (SELECT DISTINCT o_custkey FROM orders) o ON e.user_id = o.o_custkey
       |  GROUP BY 1)
       |SELECT na.event_type, n_exact_a, n_exact_b,
       |  n_exact_a + n_exact_b - COALESCE(n_exact_inter, 0) AS n_exact_union,
       |  COALESCE(n_exact_inter, 0) AS n_exact_inter,
       |  th.theta, COALESCE(union_ret, 0) AS union_ret, COALESCE(inter_ret, 0) AS inter_ret,
       |  CAST(ROUND($m61d * CAST(COALESCE(union_ret, 0) AS DOUBLE) / CAST(th.theta AS DOUBLE)) AS BIGINT) AS union_est,
       |  CAST(ROUND($m61d * CAST(COALESCE(inter_ret, 0) AS DOUBLE) / CAST(th.theta AS DOUBLE)) AS BIGINT) AS inter_est
       |FROM na
       |JOIN th ON na.event_type = th.event_type
       |LEFT JOIN uni ON na.event_type = uni.event_type
       |LEFT JOIN ints ON na.event_type = ints.event_type
       |CROSS JOIN nb
       |LEFT JOIN ni ON na.event_type = ni.event_type""".stripMargin
  }

  // ---------------------------------------------- histogram quantiles --

  private val QPermille = Seq(500, 950, 990)

  /** Mergeable histogram quantiles — the one-pass, bounded-state answer to
    * "p95 per group" that a 100 TB unsorted scan permits: a fixed-width
    * histogram (1-dollar bins over the 2-decimal value domain, ≤ ~500
    * cells) partial-aggregates map-side exactly like HLL/CMS registers, so
    * the shuffle carries groups × bins cells, never rows; the quantile is
    * then read off the cumulative histogram with within-bin linear
    * interpolation. Ranks use the integer form `ceil(q·n) = (n·q + 999)
    * div 1000` — no float rank, so bin selection is bit-stable. The exact
    * companion (rank-selection over the full sort, the q13 machinery) runs
    * alongside, making the estimate's error an oracle-checked column.
    * Completes the sketch family: distinct (HLL/KMV), frequency (CMS),
    * membership (Bloom), set algebra (theta), quantiles (histogram).
    */
  private def histQuantiles(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val ev = Tables.events(s, dir).select(col("event_type"), col("value"), col("event_id"))
      .withColumn("cents", (col("value").cast(DecimalType(12, 2)) * 100).cast("long"))
    // Floor division (via pmod), NOT `div`: `div` truncates toward zero, so
    // a negative value would bin differently from the DuckDB oracle's `//`
    // (floor) and silently break batch/stream/oracle parity. The generator
    // keeps value ≥ 0, but the operator shouldn't depend on that.
    val hist = ev.withColumn("bin", expr("(cents - pmod(cents, 100L)) div 100L"))
      .groupBy(col("event_type"), col("bin")).agg(count(lit(1)).as("cnt"))
    val wcum = Window.partitionBy(col("event_type")).orderBy(col("bin"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val histC = hist
      .withColumn("cum", sum(col("cnt")).over(wcum))
      .withColumn("n", sum(col("cnt")).over(Window.partitionBy(col("event_type"))))
    val qCol = explode(array(QPermille.map(lit): _*)).as("q")
    val est = histC.select(col("event_type"), col("bin"), col("cnt"), col("cum"), col("n"), qCol)
      .withColumn("rank_q", expr("(n * q + 999L) div 1000L"))
      .filter(col("cum") >= col("rank_q"))
      .groupBy(col("event_type"), col("q"))
      .agg(max(col("n")).as("n"), max(col("rank_q")).as("rank_q"),
        min(col("bin")).as("bin"),
        min_by(col("cnt"), col("bin")).as("bcnt"),
        min_by(col("cum"), col("bin")).as("bcum"))
      .withColumn("est_q",
        col("bin").cast("double") +
          (col("rank_q") - col("bcum") + col("bcnt")).cast("double") /
            col("bcnt").cast("double"))
    val wv = Window.partitionBy(col("event_type")).orderBy(col("value"), col("event_id"))
    val ranked = ev.withColumn("rn", row_number().over(wv))
    val exact = est.select(col("event_type"), col("q"), col("rank_q"))
      .join(ranked, Seq("event_type"))
      .filter(col("rn") === col("rank_q"))
      .select(col("event_type"), col("q"), col("value").as("exact_q"))
    est.join(exact, Seq("event_type", "q"))
      .select(col("event_type"), col("q"), col("n"), col("rank_q"),
        col("est_q"), col("exact_q"),
        (col("est_q") - col("exact_q")).as("err"))
  }

  /** Shared with `stream_hist_quantiles`: the streaming histogram emits
    * rows that hash-match this same oracle (batch ≡ stream ≡ oracle, the
    * stream_hll_distinct pattern). */
  val histQuantilesSql: String = {
    val qvals = QPermille.map(q => s"SELECT $q AS q").mkString(" UNION ALL ")
    s"""WITH ev AS (SELECT event_type, value, event_id,
       |    CAST(CAST(value AS DECIMAL(12,2)) * 100 AS BIGINT) AS cents
       |  FROM events),
       |hist AS (SELECT event_type, cents // 100 AS bin, CAST(COUNT(*) AS BIGINT) AS cnt
       |  FROM ev GROUP BY 1, 2),
       |hc AS (SELECT event_type, bin, cnt,
       |    SUM(cnt) OVER (PARTITION BY event_type ORDER BY bin
       |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum,
       |    SUM(cnt) OVER (PARTITION BY event_type) AS n
       |  FROM hist),
       |qs AS ($qvals),
       |cand AS (SELECT hc.*, qs.q, (n * q + 999) // 1000 AS rank_q
       |  FROM hc CROSS JOIN qs
       |  WHERE cum >= (n * q + 999) // 1000),
       |est AS (SELECT event_type, q,
       |    CAST(MAX(n) AS BIGINT) AS n, CAST(MAX(rank_q) AS BIGINT) AS rank_q,
       |    MIN(bin) AS bin, arg_min(cnt, bin) AS bcnt, arg_min(cum, bin) AS bcum
       |  FROM cand GROUP BY 1, 2),
       |est2 AS (SELECT event_type, q, n, rank_q,
       |    CAST(bin AS DOUBLE) +
       |      CAST(rank_q - bcum + bcnt AS DOUBLE) / CAST(bcnt AS DOUBLE) AS est_q
       |  FROM est),
       |rk AS (SELECT event_type, value,
       |    ROW_NUMBER() OVER (PARTITION BY event_type ORDER BY value, event_id) AS rn
       |  FROM ev),
       |ex AS (SELECT e.event_type, e.q, r.value AS exact_q
       |  FROM est2 e JOIN rk r ON e.event_type = r.event_type AND r.rn = e.rank_q)
       |SELECT e.event_type, e.q, e.n, e.rank_q, e.est_q, ex.exact_q,
       |  e.est_q - ex.exact_q AS err
       |FROM est2 e JOIN ex ON e.event_type = ex.event_type AND e.q = ex.q""".stripMargin
  }

  val all: Seq[Q] = Seq(
    Q("sk_hll_distinct", hllDistinct, Some(hllDistinctSql)),
    Q("sk_cms_heavy", cmsHeavy, Some(cmsHeavySql)),
    Q("sk_bloom_prune", bloomPrune, Some(bloomPruneSql)),
    Q("j6_bloom_semi", j6BloomSemi, Some(j6BloomSemiSql)),
    Q("sk_kmv_distinct", kmvDistinct, Some(kmvDistinctSql)),
    Q("sk_theta_setops", thetaSetops, Some(thetaSetopsSql)),
    Q("sk_hist_quantiles", histQuantiles, Some(histQuantilesSql)))
}
