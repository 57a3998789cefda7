package graft.streaming

import org.apache.spark.sql.{DataFrame, SaveMode}
import org.apache.spark.sql.streaming.{DataStreamWriter, StreamingQuery}
import org.apache.spark.sql.Row

import graft.operators.TickOps

/** Streaming output modes (SURVEY §2.9): the reference appends to CSVs and
  * keeps them canonical by dedup-on-merge rewrites
  * (fetch_historical_trades_nvda.py:239-245, candle_to_calcs.py:788-799) —
  * "update by rewrite". In Spark that is `foreachBatch` doing the keyed
  * upsert per micro-batch: merge the batch into the table with keep-new
  * semantics (G5), so replays and corrections overwrite instead of
  * duplicating. Plain append stays the default for immutable event streams.
  */
object StreamingSinks {

  /** Starts a foreachBatch upsert into a parquet table: each micro-batch
    * merges into `path` on `keys`, new rows winning (the reference's
    * keep-last concat order). The merge is the oracle-verified
    * [[TickOps.mergeKeepNew]]; the rewrite is atomic per batch via
    * overwrite-after-read.
    *
    * Note: a whole-table rewrite per batch is the reference's own semantics
    * made explicit (it rewrites its CSV on every merge). At lake scale the
    * same `foreachBatch` body swaps to a partition-pruned MERGE on a table
    * format — the operator contract (keyed upsert per batch) is unchanged.
    */
  def upsertParquet(stream: DataFrame, path: String, keys: Seq[String],
                    checkpoint: String): StreamingQuery =
    stream.writeStream
      .option("checkpointLocation", checkpoint)
      .outputMode("append")
      .foreachBatch { (batch: DataFrame, _: Long) =>
        val spark = batch.sparkSession
        val existing =
          try Some(spark.read.parquet(path))
          catch { case _: Throwable => None }
        val merged = (existing match {
          case Some(old) => TickOps.mergeKeepNew(old, batch, keys)
          case None => batch
        }).cache()
        merged.count() // pin into executor cache BEFORE truncating the source files
        merged.write.mode(SaveMode.Overwrite).parquet(path)
        merged.unpersist()
        ()
      }
      .start()
}
