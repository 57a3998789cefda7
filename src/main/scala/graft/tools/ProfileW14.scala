package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.calc.{AnchorSnapshots, PeaksPass, SessionLabels, WindowCalcs}
import graft.core.Tables
import graft.operators.CandleAggregator

/** Stage-level wall-clock breakdown of the w14_anchor_points pipeline (the
  * heaviest non-output-bound domain row at sf10). Each stage is timed as a
  * cumulative materialization from the raw ticks — the DELTA between
  * consecutive stages is that stage's own cost, measured under the real
  * plan (not a cached intermediate, which would change exchange reuse).
  * Also counts Exchange operators in the final plan so "the anchors ride
  * the peaks pass's preserved exchange+sort" is verified from the executed
  * plan, not asserted.
  *
  * Usage: SPARK_GRAFT_SF_DIR=... sbt "runMain graft.tools.ProfileW14"
  */
object ProfileW14 {

  private def time(label: String, reps: Int)(mk: => DataFrame): Double = {
    val times = (1 to reps).map { _ =>
      val t0 = System.nanoTime()
      mk.queryExecution.toRdd.foreach(_ => ())
      (System.nanoTime() - t0) / 1e9
    }
    val med = times.sorted.apply(times.length / 2)
    println(f"[profile] $label%-28s $med%7.2f s  (min ${times.min}%.2f)")
    med
  }

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val reps = sys.env.getOrElse("SPARK_GRAFT_PROFILE_REPS", "3").toInt
    val spark = graft.core.GraftSession.get()

    def candles = CandleAggregator.aggregate(Tables.ticks(spark, sfDir))

    val t1 = time("1 candles (G1 agg)", reps)(candles)
    val t2 = time("2 + session/extremes", reps)(
      WindowCalcs.withDailyRunningExtremes(SessionLabels.withSessionLabels(candles)))
    val t3 = time("3 + peaks pass", reps) {
      val labeled = WindowCalcs.withDailyRunningExtremes(
        SessionLabels.withSessionLabels(candles))
        .withColumn("chunk",
          expr(s"unix_micros(timestamp) div ${AnchorSnapshots.chunkUs()}L"))
      PeaksPass.withPeakFlags(labeled, Seq("chunk"))
    }
    val t4 = time("4 + snapshots (pre-dedup)", reps)(AnchorSnapshots.snapshots(candles))
    val t5 = time("5 + dedup (full w14)", reps)(AnchorSnapshots.anchoredVwapPoints(candles))

    println(f"[profile] stage deltas: candles ${t1}%.2f | labels ${t2 - t1}%.2f | " +
      f"peaks ${t3 - t2}%.2f | snapshot-cross ${t4 - t3}%.2f | dedup ${t5 - t4}%.2f")

    val plan = AnchorSnapshots.anchoredVwapPoints(candles).queryExecution.executedPlan.toString
    val nExchange = "(?m)^.*Exchange".r.findAllIn(plan).size
    val nSort = "(?m)^\\s*[+:-]*\\s*\\*?\\(?\\d*\\)?\\s*Sort ".r.findAllIn(plan).size
    println(s"[profile] final plan: $nExchange Exchange node(s), $nSort Sort node(s)")
    spark.stop()
  }
}
