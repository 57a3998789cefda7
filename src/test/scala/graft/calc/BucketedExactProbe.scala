package graft.calc

import org.apache.spark.sql.functions._

import graft.core.GraftSession
import graft.operators.CandleAggregator

/** Scratch probe (test scope, not shipped): measures, on the REAL testdata
  * candles, how many warm-up rows the bucketed H-pass needs before its output
  * is BIT-IDENTICAL to the flat pass — the bar the driver's hash gate sets.
  * Run: sbt 'Test/runMain graft.calc.BucketedExactProbe <sfDir> <warmupRows> <bucketSeconds> <rowIntervalSeconds>'
  */
object BucketedExactProbe {
  def main(args: Array[String]): Unit = {
    val dir = args(0)
    val warm = args(1).toInt
    val bucketSecs = args(2).toLong
    val interval = args(3).toDouble
    val spark = GraftSession.get()
    val candles = CandleAggregator.aggregate(graft.core.Tables.ticks(spark, dir)).cache()

    val flat = IndicatorPass.withIndicators(candles, patterns = true)
    val spec = if (warm == 0) IndicatorPass.autoBucket(candles)
               else IndicatorPass.BucketSpec(bucketSecs, warm, interval)
    println(s"spec=$spec")
    val bucketed = IndicatorPass.withIndicators(candles, patterns = true, bucket = Some(spec))

    val cols = flat.columns
    def keyed(r: org.apache.spark.sql.Row) = (r.getString(0), r.getTimestamp(1))
    val a = flat.collect().map(r => keyed(r) -> r).toMap
    val b = bucketed.collect().map(r => keyed(r) -> r).toMap
    println(s"rows flat=${a.size} bucketed=${b.size}")

    val bad = collection.mutable.Map.empty[String, Int].withDefaultValue(0)
    var worst = 0.0
    var worstCol = ""
    a.foreach { case (k, ra) =>
      val rb = b(k)
      cols.indices.drop(2).foreach { i =>
        (ra.get(i), rb.get(i)) match {
          case (x: Double, y: Double) =>
            if (java.lang.Double.compare(x, y) != 0) {
              bad(cols(i)) += 1
              val rel = math.abs(x - y) / math.max(1.0, math.abs(x))
              if (rel > worst) { worst = rel; worstCol = cols(i) }
            }
          case (x, y) => if (x != y) bad(cols(i)) += 1
        }
      }
    }
    println(s"buckets ~ ${candles.select((unix_micros(col("timestamp")) / (spec.bucketSeconds * 1000000L)).cast("long")).distinct().count()}")
    if (bad.isEmpty) println(s"EXACT: bit-identical (warm=$warm bucket=$bucketSecs interval=$interval)")
    else {
      println(s"MISMATCH cols: ${bad.toSeq.sortBy(-_._2).mkString(", ")}")
      println(f"worst rel divergence: $worst%.3e in $worstCol")
    }
    spark.stop()
  }
}
