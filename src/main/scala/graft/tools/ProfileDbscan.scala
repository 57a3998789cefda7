package graft.tools

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.functions.{Dbscan, Similarity}
import graft.queries.QueriesLlm

/** Stage-level wall-clock breakdown of `llm_dbscan_lsh` — the heaviest
  * bench row at sf10 (70.4 s in r14) and the headline density-clustering
  * operator. Mirrors [[ProfileSubstring]]: the injected base corpus is
  * built ONCE (eagerly checkpointed, timed separately), then each stage is
  * a CUMULATIVE materialization from that base, so the delta between
  * consecutive stages is that stage's own cost under the real plan:
  *
  *   1. bucket    — 12-bit × 64-table sign-projection bucketing (native
  *                  expression, one map pass + eager cache)
  *   2. cand      — the (table, bucket) self-join + 16-B-wide pair distinct
  *   3. verify    — embeddings re-attach (shared broadcast ×2 aliases) +
  *                  exact rounded-cosine ε filter
  *   4. cluster   — degree count, core filter, core-core edge build, and
  *                  the O(log n) large-star/small-star component rounds
  *   5. full      — member/noise rollup (the registry row's output)
  *
  * `spark.catalog.clearCache()` runs before every stage so each cumulative
  * measurement rebuilds the bucket cache exactly as a cold registry run
  * does — without it, stage 2+ would read stage 1's cache and the deltas
  * would double-count nothing but also hide the bucketing share.
  *
  * Also counts Exchange nodes in the final executed plan so the shuffle
  * accounting is read off the plan, not asserted.
  *
  * Usage: SPARK_GRAFT_SF_DIR=... sbt "runMain graft.tools.ProfileDbscan"
  */
object ProfileDbscan {

  private def time(label: String)(mk: => DataFrame): Double = {
    val t0 = System.nanoTime()
    mk.queryExecution.toRdd.foreach(_ => ())
    val s = (System.nanoTime() - t0) / 1e9
    println(f"[profile] $label%-28s $s%7.2f s")
    s
  }

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = graft.core.GraftSession.get()

    val tb0 = System.nanoTime()
    val base = QueriesLlm.dbscanBase(spark, sfDir) // eager localCheckpoint
    base.count()
    println(f"[profile] 0 injected base (ckpt)     ${(System.nanoTime() - tb0) / 1e9}%7.2f s")

    def bucketed = Similarity.bucketedFrame(base, 12, 64, None)
    def candidates = {
      val bk = bucketed
      val a = bk.select(col("table"), col("bucket"), col("vec_id").as("id_a"))
      val b = bk.select(col("table"), col("bucket"), col("vec_id").as("id_b"))
      a.join(b, Seq("table", "bucket")).filter(col("id_a") < col("id_b"))
        .select(col("id_a"), col("id_b")).distinct()
    }
    def pairs = Similarity.nearDupPairsLsh(base, threshold = 0.9)
    def clustered = Dbscan.cluster(pairs, minPts = 6)
    def full = QueriesLlm.dbscanRollup(base, clustered)

    spark.catalog.clearCache()
    val t1 = time("1 lsh bucketing (64 tables)")(bucketed)
    spark.catalog.clearCache()
    val t2 = time("2 + candidate distinct")(candidates)
    spark.catalog.clearCache()
    val t3 = time("3 + exact-cosine verify")(pairs)
    spark.catalog.clearCache()
    val t4 = time("4 + degree/core/CC cluster")(clustered)
    spark.catalog.clearCache()
    val t5 = time("5 full rollup row")(full)

    println(f"[profile] stage deltas: bucket ${t1}%.2f | cand ${t2 - t1}%.2f | " +
      f"verify ${t3 - t2}%.2f | cluster ${t4 - t3}%.2f | rollup ${t5 - t4}%.2f")

    spark.catalog.clearCache()
    val plan = full.queryExecution.executedPlan.toString
    val nExchange = "(?m)^.*Exchange".r.findAllIn(plan).size
    println(s"[profile] final plan: $nExchange Exchange node(s)")
    spark.stop()
  }
}
