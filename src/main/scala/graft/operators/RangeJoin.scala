package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** J5 — scalable point-in-interval range join.
  *
  * Spark has no native range-join operator: a bare
  * `points.join(intervals, ts >= start && ts < end)` has no equi-key, so
  * Catalyst plans a BroadcastNestedLoopJoin (or a cartesian product), which
  * is O(|points|·|intervals|) work and a broadcast of a whole side —
  * unusable when both sides scale. [[AsOfJoin.rangeJoin]] embraces that for
  * genuinely small interval sides; this operator is the large-large path.
  *
  * Bucket-replication rewrite: discretize time into `bucketSeconds` buckets;
  * each point lands in exactly one bucket, each interval is exploded to
  * every bucket it overlaps. The join becomes an EQUI-join on the bucket id
  * with the range predicate left as a residual filter — a plain shuffled
  * hash/sort-merge join Catalyst knows how to distribute (and AQE may still
  * broadcast if the exploded interval side turns out tiny). Work is
  * O(points + intervals · span/bucket + matches); choose `bucketSeconds`
  * near the typical interval span so the replication factor stays small
  * (span/bucket + 1 copies per interval). Bucket keys inherit the time
  * distribution — time-skew shows up here exactly as it does in any
  * time-bucketed shuffle, and the same salting/AQE answers apply.
  */
object RangeJoin {

  /** Join each point row to every interval row whose half-open
    * `[startCol, endCol)` contains `pointTs`. Column names must be disjoint
    * across the two frames (as with any Spark join); empty intervals
    * (`end <= start`) are dropped rather than exploded into a descending
    * bucket `sequence`.
    */
  def pointInInterval(
      points: DataFrame,
      intervals: DataFrame,
      pointTs: String,
      startCol: String,
      endCol: String,
      bucketSeconds: Long): DataFrame = {
    require(bucketSeconds > 0, "bucketSeconds must be positive")
    val bUs = bucketSeconds * 1000000L
    val p = points.withColumn("__pbkt", expr(s"unix_micros($pointTs) div ${bUs}L"))
    val iv = intervals
      .filter(col(endCol) > col(startCol))
      .withColumn("__ibkt", explode(sequence(
        expr(s"unix_micros($startCol) div ${bUs}L"),
        expr(s"(unix_micros($endCol) - 1) div ${bUs}L"))))
    p.join(iv, p.col("__pbkt") === iv.col("__ibkt") &&
        col(pointTs) >= col(startCol) && col(pointTs) < col(endCol))
      .drop("__pbkt", "__ibkt")
  }
}
