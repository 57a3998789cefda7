package graft.core

import org.apache.spark.sql.DataFrame

/** Stats-gated input widening for per-row-heavy kernels (extracted from the
  * MinHash signature path so other operators share one policy; see
  * `functions/MinHash.scala` widenToCores scaladoc for the measurements).
  *
  * A mid-size text corpus often arrives as ONE parquet row group (row group
  * < maxPartitionBytes ⇒ one effective split — Spark still REPORTS ~cores
  * byte-range partitions, but a row group belongs to the slice holding its
  * midpoint, so all but one are empty), which would run any expensive
  * per-row expression single-threaded. Below a single-node-scale ceiling we
  * repartition by plan-stats byte size (~2 MB per task); tiny inputs skip
  * the shuffle (its overhead exceeds the kernel win), and at cluster scale
  * the ceiling makes this a structural no-op — tables there are written
  * with row groups ≤ maxPartitionBytes and the scan is genuinely parallel.
  */
object Widen {

  /** `perTaskBytes` sets the per-task chunk: the default (2 MB) is the
    * MinHash kernel's measured sweet spot (~2 µs/byte kernel); callers with
    * a heavier per-byte cost (e.g. the regex-quality score, ~10× that)
    * pass a smaller chunk so each task still lands in the ~100 ms range.
    */
  def toCores(in: DataFrame, perTaskBytes: Long = 2L << 20): DataFrame = {
    val cores = in.sparkSession.sparkContext.defaultParallelism
    val bytes = in.queryExecution.optimizedPlan.stats.sizeInBytes
    val byBytes = (bytes / perTaskBytes).min(cores).toInt
    if (byBytes >= 2 && bytes <= (4L << 30)) in.repartition(byBytes) else in
  }
}
