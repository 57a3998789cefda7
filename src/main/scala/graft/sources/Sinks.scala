package graft.sources

import org.apache.spark.sql.{DataFrame, SaveMode}

import graft.operators.ValidatedFrame

/** A1–A4 — persistence lifecycle. The reference appends to CSVs and diverts
  * rejected rows to `invalid_*.csv` side files
  * (fetch_historical_trades_nvda.py:127-132,186-200; candle_to_calcs.py:
  * 130-133,141-161); here both streams land as parquet. The chunked writer
  * (A2) and truncate dance (A4) collapse into Spark's per-partition
  * streaming writers and overwrite mode.
  */
object Sinks {

  /** A1 — append sink (production grain: partitioned parquet). */
  def append(df: DataFrame, path: String, partitionBy: Seq[String] = Nil): Unit = {
    val w = df.write.mode(SaveMode.Append)
    (if (partitionBy.nonEmpty) w.partitionBy(partitionBy: _*) else w).parquet(path)
  }

  /** A3 — the valid/invalid split persisted as two tables. The parent is
    * cached for the double consumption (batch Spark has no single-pass
    * multi-sink; `foreachBatch` does both in one pass in streaming), and the
    * cache is dropped once both writes land. Returns (valid, invalid) counts.
    */
  def writeValidated(vf: ValidatedFrame, validPath: String, invalidPath: String): (Long, Long) = {
    val v = vf.valid.cache()
    val inv = vf.invalid.cache()
    try {
      v.write.mode(SaveMode.Overwrite).parquet(validPath)
      inv.write.mode(SaveMode.Overwrite).parquet(invalidPath)
      (v.count(), inv.count())
    } finally {
      v.unpersist()
      inv.unpersist()
    }
  }

  /** A4 — truncate/replace lifecycle: overwrite replaces the reference's
    * truncate-temp + rewrite-final dance atomically per partition.
    */
  def replace(df: DataFrame, path: String): Unit =
    df.write.mode(SaveMode.Overwrite).parquet(path)

  /** A2 — memory-bounded chunked sink: the reference writes its output in
    * fixed row-count chunks so no single write materializes the whole
    * frame. Spark's native writer expresses exactly that — it rolls to a
    * new file after `maxRecordsPerFile` records, PER TASK, so the bound
    * holds on every task of a distributed write with zero coordination
    * and no repartition.
    */
  def writeChunked(df: DataFrame, path: String, maxRecordsPerFile: Int): Unit =
    df.write.mode(SaveMode.Overwrite)
      .option("maxRecordsPerFile", maxRecordsPerFile.toLong)
      .parquet(path)

  /** Bucketed parquet table — the co-located-join write path for 100 TB:
    * rows are hash-distributed into `numBuckets` files per key ON WRITE, so
    * two tables bucketed the same way (same keys, same count) join with
    * ZERO exchanges — the shuffle is paid once at ingest instead of per
    * query — and an equality filter on the bucket key prunes to 1/numBuckets
    * of the files before the scan (both pinned in PlanSpec). `sortCols`
    * additionally pre-sorts within buckets, letting sort-merge joins skip
    * their sort. Catalog-backed (`saveAsTable`) because bucket metadata
    * lives in the table catalog, not in the parquet footers.
    */
  def writeBucketed(df: DataFrame, table: String, numBuckets: Int, keys: Seq[String],
                    sortCols: Seq[String] = Nil): Unit = {
    require(keys.nonEmpty, "writeBucketed needs at least one bucket key")
    val w = df.write.mode(SaveMode.Overwrite).format("parquet")
      .bucketBy(numBuckets, keys.head, keys.tail: _*)
    (if (sortCols.nonEmpty) w.sortBy(sortCols.head, sortCols.tail: _*) else w)
      .saveAsTable(table)
  }
}
