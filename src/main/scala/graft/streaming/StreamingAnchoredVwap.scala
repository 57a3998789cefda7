package graft.streaming

import java.math.{BigDecimal => JBigDecimal, RoundingMode}
import java.sql.Timestamp
import java.time.{Instant, ZoneId}

import org.apache.spark.sql.{DataFrame, Encoder, Encoders, Row}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
import org.apache.spark.sql.types._

import graft.calc.AnchorSnapshots

/** The M4 real anchored VWAP as a stateful streaming operator: the
  * time-trigger anchor subset of [[AnchorSnapshots.anchoredVwapReal]]
  * (daily_4am / daily_930 / daily_4pm) computed online with (Σpv, Σv)
  * suffix state — no chunk re-scan at flush time.
  *
  * Batch computes each anchor's VWAP as a per-(symbol, chunk) SUFFIX:
  * Σ close·volume over [anchor row .. chunk's last row]. Online, suffix =
  * chunk-running total − prefix-before-anchor, so the per-symbol state is:
  *
  *  - running (Σpv, Σv) since chunk start, exact `java.math.BigDecimal`
  *    (close ≤2 decimals × volume ≤4 ⇒ 6-decimal products; decimal sums are
  *    accumulation-order-independent, matching the batch decimal discipline);
  *  - the active anchors, each carrying its (Σpv, Σv) snapshot taken BEFORE
  *    its own row (the suffix includes the anchor row);
  *  - the day-flag set (trigger name × local date) — persists across chunk
  *    flushes exactly like the reference's `*_added` flags, so a day
  *    spanning a chunk boundary does not re-anchor;
  *  - row counters reproducing the buffer-rebased cidx arithmetic
  *    (in-chunk position + min(rows before chunk, bufferSize)).
  *
  * Emission happens on chunk rollover (the first row of chunk N+1 flushes
  * chunk N's anchors against chunk N's last row), mirroring the batch
  * chunk-end flush; anchors whose local day ends before the chunk does are
  * dropped by the day-change reset, mirroring the batch `ld = last_date`
  * gate. A finite replay flushes its final chunk with one far-future
  * sentinel row per symbol (next chunk, never itself emitted).
  *
  * The final decimal→double conversion recasts both sums to scale 2
  * (HALF_UP = the batch DECIMAL(38,2) recast = DuckDB ROUND) so all three
  * engines cross the 2^53 line identically — see Det.centsDouble.
  */
object StreamingAnchoredVwap {

  private val NY = ZoneId.of("America/New_York")

  final case class Anchor(anchorType: String, tsUs: Long, cidx: Long,
                          price: Double, prePv: JBigDecimal, preV: JBigDecimal)

  final class VwapState extends Serializable {
    var initialized: Boolean = false
    var curChunk: Long = Long.MinValue
    var curDate: String = ""
    var sumPv: JBigDecimal = JBigDecimal.ZERO
    var sumV: JBigDecimal = JBigDecimal.ZERO
    var rowsBefore: Long = 0L
    var inChunk: Long = 0L
    var lastTsUs: Long = 0L
    var lastCidx: Long = 0L
    var anchors: List[Anchor] = Nil
    var fired: Set[String] = Set.empty // "name@localDate"
  }

  val outputSchema: StructType = StructType(Seq(
    StructField("symbol", StringType),
    StructField("timeframe", StringType),
    StructField("anchor_type", StringType),
    StructField("anchor_timestamp", TimestampType),
    StructField("anchor_idx", LongType),
    StructField("price_at_anchor", DoubleType),
    StructField("current_snapshot_timestamp", TimestampType),
    StructField("current_idx", LongType),
    StructField("anchored_vwap", DoubleType)))

  /** Input must carry (symbol, timestamp, close, volume), event-time ordered
    * across micro-batches (same contract as [[StreamingIndicators]]).
    */
  def anchoredVwapStream(candles: DataFrame, timeframe: String = "1s",
                         chunkDays: Int = AnchorSnapshots.DefaultChunkDays,
                         bufferSize: Int = 10000,
                         chunkOriginUs: Long = 0L,
                         triggers: Seq[(String, Int, Int)] = AnchorSnapshots.Triggers): DataFrame = {
    val inSchema = candles.schema
    val iSym = inSchema.fieldIndex("symbol")
    val iTs = inSchema.fieldIndex("timestamp")
    val iC = inSchema.fieldIndex("close")
    val iV = inSchema.fieldIndex("volume")
    val chunkWidthUs = AnchorSnapshots.chunkUs(chunkDays)

    implicit val stateEnc: Encoder[VwapState] = Encoders.kryo[VwapState]
    implicit val rowEnc: Encoder[Row] = Encoders.row(outputSchema)

    // Timestamp(millis) alone truncates to the millisecond — restore the
    // full microsecond fraction via setNanos or anchor keys drift off the
    // batch rows
    def usTs(us: Long): Timestamp = {
      val t = new Timestamp(Math.floorDiv(us, 1000000L) * 1000L)
      t.setNanos((Math.floorMod(us, 1000000L) * 1000L).toInt)
      t
    }

    def flush(sym: String, st: VwapState): List[Row] =
      st.anchors.reverse.map { a =>
        val tailPv = st.sumPv.subtract(a.prePv).setScale(2, RoundingMode.HALF_UP)
        val tailV = st.sumV.subtract(a.preV).setScale(2, RoundingMode.HALF_UP)
        val vwap: java.lang.Double =
          if (tailV.signum > 0) tailPv.doubleValue() / tailV.doubleValue() else null
        Row(sym, timeframe, a.anchorType, usTs(a.tsUs),
          a.cidx, a.price, usTs(st.lastTsUs), st.lastCidx, vwap)
      }

    candles
      .groupByKey((r: Row) => r.getString(iSym))(Encoders.STRING)
      .flatMapGroupsWithState[VwapState, Row](
        OutputMode.Append(), GroupStateTimeout.NoTimeout)(
        (sym: String, rows: Iterator[Row], state: GroupState[VwapState]) => {
          val st = if (state.exists) state.get else new VwapState
          val out = List.newBuilder[Row]
          rows.toArray.sortBy(_.getTimestamp(iTs).getTime).foreach { r =>
            val ts = r.getTimestamp(iTs)
            val tsUs = Math.multiplyExact(ts.getTime, 1000L) +
              (ts.getNanos / 1000L) % 1000L
            val chunk = Math.floorDiv(tsUs - chunkOriginUs, chunkWidthUs)

            if (st.initialized && chunk > st.curChunk) {
              out ++= flush(sym, st)
              st.rowsBefore += st.inChunk
              st.inChunk = 0L
              st.sumPv = JBigDecimal.ZERO
              st.sumV = JBigDecimal.ZERO
              st.anchors = Nil
            }
            st.curChunk = chunk
            st.initialized = true

            val local = Instant.ofEpochMilli(ts.getTime).atZone(NY)
            val date = local.toLocalDate.toString
            if (date != st.curDate) {
              // day-change reset: an earlier day's anchors never reach the
              // chunk's last row, so they flush nowhere (batch: ld = last_date)
              st.anchors = Nil
              st.fired = st.fired.filter(_.endsWith("@" + date))
              st.curDate = date
            }

            val cidx = st.inChunk + math.min(st.rowsBefore, bufferSize.toLong)
            val close = r.getDouble(iC)
            triggers.foreach { case (name, h, m) =>
              val key = name + "@" + date
              if (local.getHour == h && local.getMinute == m && !st.fired(key)) {
                st.fired += key
                st.anchors ::= Anchor(name, tsUs, cidx, close, st.sumPv, st.sumV)
              }
            }
            val pD = JBigDecimal.valueOf(close).setScale(2, RoundingMode.HALF_UP)
            val vD = JBigDecimal.valueOf(r.getDouble(iV)).setScale(4, RoundingMode.HALF_UP)
            st.sumPv = st.sumPv.add(pD.multiply(vD))
            st.sumV = st.sumV.add(vD)
            st.lastTsUs = tsUs
            st.lastCidx = cidx
            st.inChunk += 1L
          }
          state.update(st)
          out.result().iterator
        })
  }
}
