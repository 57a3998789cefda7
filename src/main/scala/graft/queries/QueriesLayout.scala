package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.core.Tables
import graft.functions.{HilbertCurve, ZOrder}

/** Data-layout operators: the Z-order clustering manifest over `events`.
  *
  * The query computes each event's Morton z-value over (user bucket, hour
  * bucket) and aggregates per z-prefix "file" — exactly the min/max footer
  * stats a z-ordered parquet write would produce. The manifest itself IS
  * the data-skipping proof: every bucket's span in BOTH dimensions is
  * ≤ 2^(bits−prefixBits/2) wide (asserted in `ZOrderSpec`), so a predicate
  * on either `user_id` or time prunes ~15/16 of the files, where a 1-D
  * time-sorted layout prunes nothing for user predicates.
  */
object QueriesLayout {

  private val Bits = 8        // per-dimension bucket width (256 buckets)
  private val PrefixDiv = 256 // keep the top 8 of 16 z-bits → 256 "files"

  /** Z-order layout manifest: per z-prefix bucket, row count and the
    * min/max of both dimension buckets — tight on both by the Morton
    * property. `repartitionByRange(z).sortWithinPartitions(z)` before a
    * parquet write gives real files with exactly these stats; the
    * manifest form keeps the operator engine-checkable.
    */
  private def zorder(s: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(s, dir)
      .withColumn("xb", pmod(col("user_id"), lit(1L << Bits)))
      .withColumn("yb", pmod(expr("unix_micros(ts) div 3600000000"), lit(1L << Bits)))
    ev.withColumn("z", ZOrder.zValue(col("xb"), col("yb"), Bits))
      .withColumn("file_id", expr(s"z div ${PrefixDiv}L"))
      .groupBy(col("file_id"))
      .agg(
        count(lit(1)).as("n_rows"),
        min(col("xb")).as("min_user_bucket"),
        max(col("xb")).as("max_user_bucket"),
        min(col("yb")).as("min_hour_bucket"),
        max(col("yb")).as("max_hour_bucket"),
        min(col("z")).as("min_z"),
        max(col("z")).as("max_z"))
  }

  private val zorderSql = {
    val z = ZOrder.zValueSql("xb", "yb", Bits)
    s"""WITH b AS (
       |  SELECT ((user_id % ${1L << Bits}) + ${1L << Bits}) % ${1L << Bits} AS xb,
       |    ((epoch_us(ts::TIMESTAMP) // 3600000000 % ${1L << Bits}) + ${1L << Bits}) % ${1L << Bits} AS yb
       |  FROM events),
       |zv AS (SELECT xb, yb, $z AS z FROM b)
       |SELECT z // $PrefixDiv AS file_id, COUNT(*) AS n_rows,
       |  CAST(MIN(xb) AS BIGINT) AS min_user_bucket,
       |  CAST(MAX(xb) AS BIGINT) AS max_user_bucket,
       |  CAST(MIN(yb) AS BIGINT) AS min_hour_bucket,
       |  CAST(MAX(yb) AS BIGINT) AS max_hour_bucket,
       |  CAST(MIN(z) AS BIGINT) AS min_z,
       |  CAST(MAX(z) AS BIGINT) AS max_z
       |FROM zv GROUP BY 1""".stripMargin
  }

  /** Shared (user bucket, hour bucket) projection for the curve rows. */
  private def curveBuckets(s: SparkSession, dir: String): DataFrame =
    Tables.events(s, dir)
      .withColumn("xb", pmod(col("user_id"), lit(1L << Bits)))
      .withColumn("yb", pmod(expr("unix_micros(ts) div 3600000000"), lit(1L << Bits)))

  private val curveBucketsCte =
    s"""b AS (
       |  SELECT ((user_id % ${1L << Bits}) + ${1L << Bits}) % ${1L << Bits} AS xb,
       |    ((epoch_us(ts::TIMESTAMP) // 3600000000 % ${1L << Bits}) + ${1L << Bits}) % ${1L << Bits} AS yb
       |  FROM events)""".stripMargin

  /** Hilbert layout manifest — [[zorder]]'s twin on the jump-free curve
    * ([[graft.functions.HilbertCurve]]): same buckets, same file width,
    * file key = Hilbert distance prefix. Consecutive Hilbert keys are
    * always grid NEIGHBORS (Morton jumps at every quadrant seam), so
    * equal-size files cover connected regions with smaller average side
    * spans — `layout_curve_compare` quantifies the difference on this very
    * input. The oracle replays the bit-plane state machine as a generated
    * CTE chain, one stage per plane, value-exact.
    */
  private def hilbertLayout(s: SparkSession, dir: String): DataFrame =
    curveBuckets(s, dir)
      .withColumn("h", HilbertCurve.hilbert(col("xb"), col("yb"), Bits))
      .withColumn("file_id", expr(s"h div ${PrefixDiv}L"))
      .groupBy(col("file_id"))
      .agg(
        count(lit(1)).as("n_rows"),
        min(col("xb")).as("min_user_bucket"),
        max(col("xb")).as("max_user_bucket"),
        min(col("yb")).as("min_hour_bucket"),
        max(col("yb")).as("max_hour_bucket"),
        min(col("h")).as("min_h"),
        max(col("h")).as("max_h"))

  private val hilbertSql = {
    val (stages, last) = HilbertCurve.stagesSql("hsrc", Bits, Seq("xb", "yb"))
    s"""WITH $curveBucketsCte,
       |hsrc AS (SELECT xb, yb, xb AS hx, yb AS hy, 0 AS hd FROM b),
       |$stages
       |SELECT CAST(hd // $PrefixDiv AS BIGINT) AS file_id, COUNT(*) AS n_rows,
       |  CAST(MIN(xb) AS BIGINT) AS min_user_bucket,
       |  CAST(MAX(xb) AS BIGINT) AS max_user_bucket,
       |  CAST(MIN(yb) AS BIGINT) AS min_hour_bucket,
       |  CAST(MAX(yb) AS BIGINT) AS max_hour_bucket,
       |  CAST(MIN(hd) AS BIGINT) AS min_h,
       |  CAST(MAX(hd) AS BIGINT) AS max_h
       |FROM $last GROUP BY 1""".stripMargin
  }

  /** Curve locality comparison, one row: total per-file (x-span + y-span)
    * for Morton vs Hilbert on the SAME buckets and file width. The span
    * sum is exactly what data skipping pays for — a predicate window
    * overlaps a file iff it intersects the file's span box, so smaller
    * total spans = fewer files read per query. Integer-exact, so the
    * DuckDB replay hash-matches; `LayoutCurveSpec` additionally pins the
    * Hilbert sum ≤ the Morton sum on the fixtures (the structural claim,
    * kept out of the row so the data makes the case, not an assertion).
    */
  private def curveCompare(s: SparkSession, dir: String): DataFrame = {
    val b = curveBuckets(s, dir)
      .withColumn("z", ZOrder.zValue(col("xb"), col("yb"), Bits))
      .withColumn("h", HilbertCurve.hilbert(col("xb"), col("yb"), Bits))
    def spanTotal(key: String, tag: String) =
      b.groupBy(expr(s"$key div ${PrefixDiv}L"))
        .agg((max(col("xb")) - min(col("xb")) + max(col("yb")) - min(col("yb"))).as("span"))
        .agg(count(lit(1)).as(s"n_files_$tag"), sum(col("span")).as(s"sum_span_$tag"))
    spanTotal("z", "morton").crossJoin(spanTotal("h", "hilbert"))
  }

  private val curveCompareSql = {
    val z = ZOrder.zValueSql("xb", "yb", Bits)
    val (stages, last) = HilbertCurve.stagesSql("hsrc", Bits, Seq("xb", "yb"))
    s"""WITH $curveBucketsCte,
       |zf AS (SELECT ($z) // $PrefixDiv AS fid, xb, yb FROM b),
       |zs AS (SELECT COUNT(*) AS n_files_morton, CAST(SUM(span) AS BIGINT) AS sum_span_morton
       |  FROM (SELECT MAX(xb) - MIN(xb) + MAX(yb) - MIN(yb) AS span FROM zf GROUP BY fid)),
       |hsrc AS (SELECT xb, yb, xb AS hx, yb AS hy, 0 AS hd FROM b),
       |$stages,
       |hf AS (SELECT hd // $PrefixDiv AS fid, xb, yb FROM $last),
       |hs AS (SELECT COUNT(*) AS n_files_hilbert, CAST(SUM(span) AS BIGINT) AS sum_span_hilbert
       |  FROM (SELECT MAX(xb) - MIN(xb) + MAX(yb) - MIN(yb) AS span FROM hf GROUP BY fid))
       |SELECT * FROM zs, hs""".stripMargin
  }

  /** Co-located bucketed join: write orders and customer as catalog-backed
    * bucketed tables ([[graft.sources.Sinks.writeBucketed]], 8 buckets on
    * the customer key, sorted within buckets) and join them WITHOUT any
    * exchange — the shuffle is paid ONCE at ingest, then every join on the
    * key is exchange-free (pinned in `PlanSpec`'s bucketed-join test; this
    * row proves result parity end-to-end through the write→catalog→read
    * path). At 100 TB this is the difference between re-shuffling two fact
    * tables per query and a merge of pre-sorted co-located files; the only
    * exchange left in the plan is the tiny final per-segment aggregate.
    * Money sums ride DECIMAL ([[Det.dsum]]) so the result is partitioning-
    * independent and engine-exact.
    */
  private def bucketedJoin(s: SparkSession, dir: String): DataFrame = {
    import graft.queries.Det._
    graft.sources.Sinks.writeBucketed(
      Tables.orders(s, dir).select(col("o_custkey"), col("o_totalprice")),
      "layout_orders_b", 8, Seq("o_custkey"), Seq("o_custkey"))
    graft.sources.Sinks.writeBucketed(
      Tables.customer(s, dir).select(col("c_custkey"), col("c_mktsegment")),
      "layout_customer_b", 8, Seq("c_custkey"), Seq("c_custkey"))
    s.table("layout_orders_b")
      .join(s.table("layout_customer_b"), col("o_custkey") === col("c_custkey"))
      .groupBy(col("c_mktsegment"))
      .agg(
        count(lit(1)).as("n_orders"),
        dsum(col("o_totalprice")).as("revenue"))
  }

  private val bucketedJoinSql =
    """SELECT c_mktsegment, COUNT(*) AS n_orders,
      |  CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS revenue
      |FROM orders JOIN customer ON o_custkey = c_custkey
      |GROUP BY c_mktsegment""".stripMargin

  private val CompactTargetRows = 2000L

  /** Compaction planner: the per-day file manifest a small-files compactor
    * executes. Per event day: row count, planned file count at a fixed
    * rows-per-file target (`ceil(n / target)` in pure integer math), and
    * the resulting max rows per file (`ceil(n / n_files)` — balanced
    * split). The plan is what `repartitionByRange(day).sortWithin...
    * .write` turns into physical files; keeping it a manifest keeps the
    * operator engine-checkable. At 100 TB the small-files problem IS a
    * first-order cost (every file is a task + a footer read + an object
    * store request); this manifest is the driver-side plan that bounds
    * both file count and file size, computed from a pure aggregate —
    * one tiny shuffle of (day, count) partials, never the data.
    */
  private def compaction(s: SparkSession, dir: String): DataFrame = {
    val t = CompactTargetRows
    Tables.events(s, dir)
      .groupBy(to_date(col("ts")).as("day"))
      .agg(count(lit(1)).as("n_rows"))
      .withColumn("n_files", expr(s"(n_rows + ${t - 1}L) div ${t}L"))
      .withColumn("max_rows_per_file", expr("(n_rows + n_files - 1L) div n_files"))
  }

  private val compactionSql =
    s"""WITH d AS (
       |  SELECT CAST(ts::TIMESTAMP AS DATE) AS day, CAST(COUNT(*) AS BIGINT) AS n_rows
       |  FROM events GROUP BY 1),
       |f AS (SELECT day, n_rows,
       |    (n_rows + ${CompactTargetRows - 1}) // $CompactTargetRows AS n_files FROM d)
       |SELECT day, n_rows, n_files,
       |  (n_rows + n_files - 1) // n_files AS max_rows_per_file
       |FROM f""".stripMargin

  /** Executed compaction — the half of the operator a user actually runs
    * (the planner above only emits the manifest). Each event gets a
    * deterministic file index `(rank_in_day − 1) div max_rows_per_file`
    * (rank by (ts, event_id) — total order, so retries assign identically),
    * the frame is repartitioned on (day, file_idx) so each planned file
    * lives in exactly ONE task, and `partitionBy(day, file_idx)` writes it
    * as exactly ONE physical parquet file. The read-back then audits the
    * LAYOUT, not the plan: physical files per day counted via
    * `input_file_name()` (a second file in any dir would break the count),
    * per-file row max/min, and the per-day `sum(event_id)` content pin —
    * all predicted in closed form by the oracle from the raw table alone
    * (`k = ceil(n/target)`, `mx = ceil(n/k)`, min = `n − (k−1)·mx`; the
    * identity `ceil(n/ceil(n/k)) = k` holds for every k of the form
    * `ceil(n/t)`, so measured file count always equals planned). At scale
    * the shape is one window + one shuffle on (day, file_idx) — the data
    * rides the exchange once, and the written layout bounds both file
    * count and file size, which is the entire point of compaction.
    */
  private lazy val compactPath: String =
    QueriesIngest.stageRoot.resolve("layout_compacted").toString

  private def compactionExec(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val plan = compaction(s, dir).select(col("day"), col("max_rows_per_file"))
    val w = Window.partitionBy(col("day")).orderBy(col("ts"), col("event_id"))
    Tables.events(s, dir)
      .withColumn("day", to_date(col("ts")))
      .join(broadcast(plan), Seq("day"))
      .withColumn("rn", row_number().over(w).cast("long"))
      .withColumn("file_idx", expr("(rn - 1L) div max_rows_per_file"))
      .select(col("day"), col("file_idx"), col("event_id"))
      .repartition(col("day"), col("file_idx"))
      .write.mode("overwrite").partitionBy("day", "file_idx")
      .parquet(compactPath)
    val perFile = s.read.parquet(compactPath)
      .groupBy(col("day"), col("file_idx"), input_file_name().as("fname"))
      .agg(count(lit(1)).as("rows_in_file"), sum(col("event_id")).as("sum_ids"))
    perFile.groupBy(col("day"))
      .agg(
        count(lit(1)).as("n_physical_files"),
        sum(col("rows_in_file")).as("n_rows"),
        max(col("rows_in_file")).as("max_file_rows"),
        min(col("rows_in_file")).as("min_file_rows"),
        sum(col("sum_ids")).as("sum_event_ids"))
  }

  private val compactionExecSql =
    s"""WITH d AS (
       |  SELECT CAST(ts::TIMESTAMP AS DATE) AS day,
       |    CAST(COUNT(*) AS BIGINT) AS n_rows,
       |    CAST(SUM(event_id) AS BIGINT) AS sum_event_ids
       |  FROM events GROUP BY 1),
       |f AS (SELECT day, n_rows, sum_event_ids,
       |    (n_rows + ${CompactTargetRows - 1}) // $CompactTargetRows AS k FROM d),
       |m AS (SELECT *, (n_rows + k - 1) // k AS mx FROM f)
       |SELECT day, k AS n_physical_files, n_rows,
       |  mx AS max_file_rows,
       |  n_rows - (k - 1) * mx AS min_file_rows,
       |  sum_event_ids
       |FROM m""".stripMargin

  def all: Seq[Q] = Seq(
    Q("layout_zorder", zorder, Some(zorderSql)),
    Q("layout_hilbert", hilbertLayout, Some(hilbertSql)),
    Q("layout_curve_compare", curveCompare, Some(curveCompareSql)),
    Q("layout_bucketed_join", bucketedJoin, Some(bucketedJoinSql)),
    Q("layout_compaction", compaction, Some(compactionSql)),
    Q("layout_compaction_exec", compactionExec, Some(compactionExecSql)))
}
