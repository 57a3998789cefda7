package graft.calc

import scala.collection.mutable.ArrayBuffer

import org.apache.spark.sql.{DataFrame, Encoders, Row}
import org.apache.spark.sql.functions.col
import org.apache.spark.sql.types.{IntegerType, StructField, StructType}

import graft.calc.ta.PeakFinder

/** W11 — peak/valley flags at three granularities
  * (label_peaks_valleys_multi, candle_to_calcs.py:528-558): find_peaks on
  * `high` for peaks and on −`low` for valleys, with (distance, prominence) =
  * major (10, 0.9), minor (7, 0.7), micro (5, 0.5).
  *
  * Prominence needs an unbounded two-sided scan, so this cannot stream with
  * O(1) state: each (symbol [, chunk]) group is buffered in memory for the
  * scan — exactly the reference's per-chunk shape. At scale the group key
  * MUST include a time bucket (the reference's own 30-day chunks, via
  * `extraGroupCols`) so a group never exceeds executor memory; flags near
  * bucket edges then match the reference's chunked output (it computes peaks
  * per chunk slice too, candle_to_calcs.py:535).
  */
object PeaksPass {

  val configs: Seq[(String, Int, Double)] =
    Seq(("major", 10, 0.9), ("minor", 7, 0.7), ("micro", 5, 0.5))

  val peakFields: Seq[StructField] = configs.flatMap { case (name, _, _) =>
    Seq(StructField(s"is_${name}_peak", IntegerType),
      StructField(s"is_${name}_valley", IntegerType))
  }

  /** Computes the 6 flag arrays for one group's highs/lows. */
  def flags(high: Array[Double], low: Array[Double]): Array[Array[Int]] = {
    val n = high.length
    val negLow = low.map(-_)
    configs.flatMap { case (_, dist, prom) =>
      val pk = Array.fill(n)(0)
      PeakFinder.findPeaks(high, dist, prom).foreach(pk(_) = 1)
      val vl = Array.fill(n)(0)
      PeakFinder.findPeaks(negLow, dist, prom).foreach(vl(_) = 1)
      Seq(pk, vl)
    }.toArray
  }

  /** Appends the 6 flag columns; groups by symbol (+ extraGroupCols), rows
    * ordered by timestamp within a group.
    */
  def withPeakFlags(df: DataFrame, extraGroupCols: Seq[String] = Nil): DataFrame = {
    val inSchema = df.schema
    val outSchema = StructType(inSchema.fields ++ peakFields)
    val groupCols = "symbol" +: extraGroupCols
    val keyIdx = groupCols.map(inSchema.fieldIndex)
    val iH = inSchema.fieldIndex("high")
    val iL = inSchema.fieldIndex("low")

    df.repartition(groupCols.map(col): _*)
      .sortWithinPartitions((groupCols :+ "timestamp").map(col): _*)
      .mapPartitions { rows =>
        new Iterator[Row] {
          private var out: Iterator[Row] = Iterator.empty
          private var pending: Row = null

          private def key(r: Row) = keyIdx.map(r.get)

          private def flush(buf: ArrayBuffer[Row]): Iterator[Row] = {
            val high = buf.map(_.getDouble(iH)).toArray
            val low = buf.map(_.getDouble(iL)).toArray
            val fl = flags(high, low)
            buf.iterator.zipWithIndex.map { case (r, i) =>
              Row.fromSeq(r.toSeq ++ fl.map(_(i)))
            }
          }

          private def fill(): Unit = {
            while (!out.hasNext && (pending != null || rows.hasNext)) {
              val buf = ArrayBuffer.empty[Row]
              val first = if (pending != null) pending else rows.next()
              pending = null
              buf += first
              val k = key(first)
              var done = false
              while (!done && rows.hasNext) {
                val r = rows.next()
                if (key(r) == k) buf += r else { pending = r; done = true }
              }
              out = flush(buf)
            }
          }

          override def hasNext: Boolean = { fill(); out.hasNext }
          override def next(): Row = { fill(); out.next() }
        }
      }(Encoders.row(outSchema))
  }
}
