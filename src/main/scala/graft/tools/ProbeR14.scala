package graft.tools

import org.apache.spark.sql.SparkSession

/** Round-14 plan probe (diagnostic main, not query API): prints exchange
  * and join-strategy counts for the round's new rows so plan regressions
  * are visible without reading full EXPLAIN dumps.
  */
object ProbeR14 {
  def main(args: Array[String]): Unit = {
    val spark: SparkSession = graft.core.GraftSession.get()
    val dir = args.headOption.getOrElse("/root/testdata/sf0.001")
    Seq("w17_anomaly_mad", "llm_bigram_lm_filter", "q18_cube_grouping",
        "mm_phash_neardup", "llm_dbscan_lsh").foreach { name =>
      val plan = graft.queries.Registry.queries(name)(spark, dir)
        .queryExecution.executedPlan.toString
      val lines = plan.split("\n")
      def c(s: String) = lines.count(_.contains(s))
      println(s"[probe] $name exchanges=${c("Exchange")} " +
        s"bhj=${c("BroadcastHashJoin")} smj=${c("SortMergeJoin")} " +
        s"bnlj=${c("BroadcastNestedLoopJoin")} bex=${c("BroadcastExchange")}")
    }
    spark.stop()
  }
}
