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
}
