package graft

import org.apache.spark.sql.functions._

import graft.calc.{AnchorSnapshots, IndicatorPass}
import graft.operators.{CandleAggregator, TickOps}

/** Stage-by-stage wall-clock probe of the pipeline_full composition —
  * diagnostic main for locating where the end-to-end row's time goes at a
  * given SF (the per-query bench can't see inside the one job). Each stage
  * is forced with a count()/write so the measured time is that stage plus
  * only the cached upstream.
  */
object PipelineProbe {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("target/testdata/sf10")
    val spark = graft.core.GraftSession.get()
    def t[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime()
      val r = f
      println(f"[probe] $label%-28s ${(System.nanoTime() - t0) / 1e9}%8.2f s")
      r
    }
    val ticks = graft.core.Tables.ticks(spark, dir)
    t("ticks count")(ticks.count())
    val valid = TickOps.validate(ticks).valid
    t("validate")(valid.count())
    val deduped = TickOps.dedupKeepLast(
      valid, Seq("symbol", "timestamp"), Seq(col("seq")))
    t("dedup")(deduped.count())
    val c = CandleAggregator.aggregate(deduped).cache()
    t("candles cache+count")(c.count())
    val calcs = IndicatorPass.withIndicators(c, patterns = true)
    t("indicators+patterns")(calcs.count())
    val anchors = AnchorSnapshots.anchoredVwapPoints(c)
      .groupBy(col("symbol"), col("anchor_timestamp"))
      .agg(count(lit(1)).as("n_anchors"))
    t("anchors")(anchors.count())
    val joined = calcs
      .join(anchors.withColumnRenamed("anchor_timestamp", "timestamp"),
        Seq("symbol", "timestamp"), "left")
    t("final join")(joined.count())
    t("full query (Registry)")(
      graft.queries.Registry.queries("pipeline_full")(spark, dir).count())
    spark.stop()
  }
}
