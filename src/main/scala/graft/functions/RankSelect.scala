package graft.functions

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Exact per-group rank selection WITHOUT a per-group global sort — the
  * quantile-threshold filter a curation pipeline runs ("drop the bottom
  * quarter of each language by quality score") expressed as the classic
  * two-phase selection:
  *
  *  1. histogram pass: bucket the score (`floor(score·B)`), count per
  *     (group, bucket) — one map-side-combinable aggregation whose state is
  *     bounded by `groups × B`, never by row count;
  *  2. threshold location: per group, the cumulative bucket counts locate
  *     the single BOUNDARY bucket containing the k-th dropped row (k =
  *     `floor(n·num/den)`); buckets strictly above survive whole, buckets
  *     strictly below drop whole — the bucket table is collected once
  *     (model-sized: groups × buckets) and re-broadcast, so the decision
  *     is map-side and the histogram never re-executes;
  *  3. boundary sort: ONLY the boundary bucket's rows are ranked (window
  *     ordered by (score, tie)), so the sort is `rows-in-one-bucket` per
  *     group, not `rows-in-group`.
  *
  * At 100 TB a naive `row_number() OVER (PARTITION BY lang ORDER BY q)`
  * sorts entire languages on single reducers; here the full data is touched
  * by one histogram aggregation and one broadcast-join filter, and the only
  * sort is the boundary bucket. If scores concentrate so one bucket holds a
  * large share of a group, raise B or recurse on the boundary bucket — the
  * escape hatch is structural, not a rewrite.
  *
  * Exactness contract: the kept set equals "rank > floor(n·num/den) under
  * (score, tie) ordering" — bucket order refines score order (floor(q·B)
  * is monotone in q), and within the boundary bucket the (score, tie)
  * window completes the same total order, so the two-phase rank equals the
  * global rank row for row. All comparisons are on bit-identical doubles
  * (the caller's score expression must be deterministic), all counts exact
  * integers.
  */
object RankSelect {

  /** Drop the `floor(n·num/den)` lowest-(score, tie) rows of each group;
    * score must land in [0, 1) after multiplication by `buckets` (scores
    * of exactly 1.0 land in bucket B, which works — the bucket id only has
    * to be monotone). Returns the surviving rows with the helper columns
    * removed.
    */
  def dropBottomExact(df: DataFrame, partCols: Seq[String], scoreCol: String,
                      tieCol: String, num: Int = 1, den: Int = 4,
                      buckets: Int = 10000): DataFrame = {
    require(num >= 0 && den > 0 && num < den, s"bad fraction $num/$den")
    val p = partCols.map(col)
    // Three map-only passes evaluate the score (histogram, whole-bucket
    // classify, boundary branch) — deliberately: recomputing a map-side
    // expression 3× is cheaper at scale than materializing a data-sized
    // intermediate or adding a full shuffle. Callers whose score is an
    // expensive expression over a SMALL corpus (one effective parquet
    // split) should widen the raw input BELOW the score projection
    // ([[graft.core.Widen.toCores]]) so those passes run parallel — the
    // projection must sit ABOVE the widening exchange, which only the
    // caller can arrange.
    val withB = df.withColumn("__b", floor(col(scoreCol) * buckets).cast("int"))

    // phase 1+2 on the bucket table (groups × ≤ buckets rows — model-sized):
    // __cum = rows strictly below this bucket, __k = rows to drop in group
    val cnts = withB.groupBy((p :+ col("__b")): _*).agg(count(lit(1)).as("__c"))
    val wCum = Window.partitionBy(p: _*).orderBy(col("__b"))
    val wTot = Window.partitionBy(p: _*)
    val infoPlan = cnts
      .withColumn("__cum", sum(col("__c")).over(wCum) - col("__c"))
      .withColumn("__n", sum(col("__c")).over(wTot))
      // integer div, not `/`: Spark `/` is double division and would lose
      // exactness past 2^53 rows; num < den keeps __n * num in Long range
      .withColumn("__k", expr(s"(__n * $num) div $den"))
      .drop("__n")

    // COLLECT the bucket table — it is the MODEL (threshold structure),
    // bounded by groups × buckets, never by row count — so the histogram
    // pass runs exactly once; leaving it as a lazy subplan would re-execute
    // the full histogram inside EACH union branch's broadcast (measured 2×
    // the whole-operator cost). Same driver-state contract as the k-means
    // centroids and PQ codebooks in Similarity.
    val spark = df.sparkSession
    val infoRows = infoPlan.collect()
    val info = spark.createDataFrame(
      java.util.Arrays.asList(infoRows: _*), infoPlan.schema)

    val j = withB.join(broadcast(info), partCols :+ "__b")
    // whole bucket survives: everything strictly below it is already >= k
    val keptWhole = j.filter(col("__cum") >= col("__k"))
    // boundary bucket: rank only ITS rows, drop the first k - cum of them
    val wIn = Window.partitionBy((p :+ col("__b")): _*)
      .orderBy(col(scoreCol), col(tieCol))
    val keptBoundary = j
      .filter(col("__cum") < col("__k") && col("__cum") + col("__c") > col("__k"))
      .withColumn("__rn", row_number().over(wIn))
      .filter(col("__rn") > col("__k") - col("__cum"))
      .drop("__rn")
    keptWhole.unionByName(keptBoundary).drop("__b", "__c", "__cum", "__k")
  }

  /** Per-group type-1 median — the value AT rank ⌈n/2⌉ under (value, tie)
    * order — via the same two-phase histogram selection, for groups too hot
    * to window-sort (`w17_bucketed`): one map-side-combinable histogram
    * pass, a model-sized boundary-bucket table collected and re-broadcast,
    * and a window sort over ONLY the boundary bucket's rows. `bucketExpr`
    * must be a monotone non-decreasing integer function of `valueCol`
    * (e.g. `floor(col(v) * 100)` — floor of a positive-constant multiple is
    * monotone for ANY doubles, negatives included), which makes bucket
    * order refine value order; the in-bucket (value, tie) window completes
    * the same total order, so the selected value is bit-identical to the
    * full window-sort form. Returns one (partCols…, out) row per group.
    *
    * PRECONDITION: `valueCol` must be null-free and NaN-free. A null value
    * lands in the NULL bucket (which sorts FIRST) and a NaN lands wherever
    * `bucketExpr` casts it, while Spark's value order puts NULL first but
    * NaN ABOVE every double — either breaks the bucket-refines-value-order
    * invariant the bit-identical claim rests on. The guard is enforced for
    * free inside the histogram aggregate this pass already runs (one extra
    * map-side column, zero extra jobs): a violating input throws instead
    * of silently returning a wrong median (r15 advice).
    */
  def selectCeilHalf(df: DataFrame, partCols: Seq[String], valueCol: String,
                     tieCol: String, bucketExpr: org.apache.spark.sql.Column,
                     out: String): DataFrame = {
    val p = partCols.map(col)
    val withB = df.withColumn("__b", bucketExpr.cast("long"))
    val cnts = withB.groupBy((p :+ col("__b")): _*).agg(count(lit(1)).as("__c"),
      count(when(col(valueCol).isNull || isnan(col(valueCol).cast("double")), 1)).as("__bad"))
    val wCum = Window.partitionBy(p: _*).orderBy(col("__b"))
    val wTot = Window.partitionBy(p: _*)
    // boundary buckets only: __cum < k <= __cum + __c, k = ceil(n/2);
    // collected for the same reason dropBottomExact collects — the table is
    // the MODEL (one row per group), and a lazy subplan would re-run the
    // histogram inside the broadcast
    val infoPlan = cnts
      .withColumn("__cum", sum(col("__c")).over(wCum) - col("__c"))
      .withColumn("__n", sum(col("__c")).over(wTot))
      .withColumn("__k", expr("(__n + 1) div 2"))
      .withColumn("__badTot", sum(col("__bad")).over(wTot))
      .filter(col("__cum") < col("__k") && col("__cum") + col("__c") >= col("__k"))
      .drop("__n")
    val spark = df.sparkSession
    val infoRows = infoPlan.collect()
    // every group has exactly one boundary-bucket row, so checking the
    // collected rows covers every group without an extra job
    val badIdx = infoPlan.schema.fieldIndex("__badTot")
    require(infoRows.forall(r => r.getLong(badIdx) == 0L),
      s"selectCeilHalf: '$valueCol' contains null or NaN values, which break " +
        "the bucket-refines-value-order invariant (see scaladoc precondition)")
    val info = spark.createDataFrame(
      java.util.Arrays.asList(infoRows: _*), infoPlan.schema)
      .drop("__bad", "__badTot")
    val wIn = Window.partitionBy((p :+ col("__b")): _*)
      .orderBy(col(valueCol), col(tieCol))
    withB.join(broadcast(info), partCols :+ "__b") // inner: boundary rows only
      .withColumn("__rn", row_number().over(wIn))
      .filter(col("__rn") === col("__k") - col("__cum"))
      .select((p :+ col(valueCol).as(out)): _*)
  }
}
