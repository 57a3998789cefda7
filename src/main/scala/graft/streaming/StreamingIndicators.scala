package graft.streaming

import org.apache.spark.sql.{DataFrame, Encoder, Encoders, Row}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
import org.apache.spark.sql.types.StructType

import graft.calc.IndicatorPass

/** The H-family indicator engine as a stateful streaming operator — the
  * reference's `--stream` mode state (candle_to_calcs.py:702-829) done with
  * real checkpointed state instead of a 10 000-row replay buffer.
  *
  * State per symbol is ONE [[IndicatorPass.SymbolState]] — the same O(1)
  * kernel the batch pass runs, kryo-serialized into the state store (a few
  * hundred bytes: EMA/ADX/ATR/SAR/T3 scalars + two small rings + pattern
  * rings). The reference instead re-buffers the last 10 000 rows and
  * recomputes them every micro-batch (candle_to_calcs.py:771-774); carrying
  * the kernel state directly is both exact (no warm-up truncation) and
  * ~10 000× smaller.
  *
  * Ordering: rows are sorted by event time within each micro-batch (the
  * group iterator has no order guarantee); across batches the pass assumes
  * in-order arrival, exactly like the reference's stream loop (SURVEY §2.9
  * "silently assumes in-order input"). Feed it watermarked, windowed
  * upstreams (e.g. [[StreamingCandles.candles1s]]) to make that assumption
  * hold.
  */
object StreamingIndicators {

  def indicatorStream(candles: DataFrame, patterns: Boolean = false): DataFrame = {
    val inSchema = candles.schema
    val outSchema = StructType(inSchema.fields ++ IndicatorPass.indicatorFields ++
      (if (patterns) IndicatorPass.patternFields else Seq.empty))
    val iSym = inSchema.fieldIndex("symbol")
    val iTs = inSchema.fieldIndex("timestamp")
    val iO = inSchema.fieldIndex("open")
    val iH = inSchema.fieldIndex("high")
    val iL = inSchema.fieldIndex("low")
    val iC = inSchema.fieldIndex("close")

    implicit val stateEnc: Encoder[IndicatorPass.SymbolState] =
      Encoders.kryo[IndicatorPass.SymbolState]
    implicit val rowEnc: Encoder[Row] = Encoders.row(outSchema)

    candles
      .groupByKey((r: Row) => r.getString(iSym))(Encoders.STRING)
      .flatMapGroupsWithState[IndicatorPass.SymbolState, Row](
        OutputMode.Append(), GroupStateTimeout.NoTimeout)(
        (_: String, rows: Iterator[Row], state: GroupState[IndicatorPass.SymbolState]) => {
          val st =
            if (state.exists) state.get
            else new IndicatorPass.SymbolState(patterns = patterns)
          val out = rows.toArray.sortBy(_.getTimestamp(iTs).getTime).map { r =>
            Row.fromSeq(r.toSeq ++ st.next(
              r.getDouble(iO), r.getDouble(iH), r.getDouble(iL), r.getDouble(iC)))
          }
          state.update(st)
          out.iterator
        })
  }
}
