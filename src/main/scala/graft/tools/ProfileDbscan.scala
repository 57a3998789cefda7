package graft.tools

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.functions.{Dbscan, Similarity}
import graft.queries.QueriesLlm

/** Stage-level wall-clock breakdown of `llm_dbscan_lsh` — the heaviest
  * bench row at sf10 (70.4 s in r14) and the headline density-clustering
  * operator. Stages are ISOLATED, not cumulative: each stage's INPUT is an
  * eagerly-materialized frame (localCheckpoint / the bucketing's own eager
  * cache), so the reported number is that stage's own cost — the first
  * (cumulative-delta) version of this tool produced NEGATIVE deltas at
  * sf10 because single-run variance across 40–80 s cumulative plans
  * swamped per-stage differences.
  *
  *   0. base     — injected hub/spoke/noise corpus build (checkpoint)
  *   1. bucket   — 12-bit × 64-table sign-projection bucketing (native
  *                 expression; its own eager cache + count IS the stage)
  *   2. cand     — (table, bucket) self-join + 16-B-wide pair distinct,
  *                 from the cached bucket frame, checkpointed
  *   3. verify   — embeddings re-attach (one shared gated broadcast ×2
  *                 aliases) + exact rounded-cosine ε filter, from the
  *                 checkpointed candidates, checkpointed
  *   4. cluster  — degree count, core filter, core-core edges, O(log n)
  *                 large-star/small-star CC, from checkpointed pairs
  *   5. rollup   — member/noise aggregation (the registry row's output)
  *
  * Also counts Exchange nodes in the un-staged registry plan so the
  * shuffle accounting is read off the plan, not asserted.
  *
  * Usage: SPARK_GRAFT_SF_DIR=... sbt "runMain graft.tools.ProfileDbscan"
  *
  * SPARK_GRAFT_LSH_BITS / SPARK_GRAFT_LSH_TABLES override the geometry
  * for the bits-vs-tables experiment (r15 profile: candidate distinct is
  * 43% of the row — 123 M candidate sightings for 53 k ε-edges — so the
  * geometry IS the measured lever). The tool also reports the verified
  * pair count so an alternative geometry's ε-recall is checked against
  * the baseline's 53 k edges, not assumed.
  */
object ProfileDbscan {

  private def timed[A](label: String)(mk: => A): A = {
    val t0 = System.nanoTime()
    val r = mk
    println(f"[profile] $label%-28s ${(System.nanoTime() - t0) / 1e9}%7.2f s")
    r
  }

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = graft.core.GraftSession.get()

    def ckpt(df: DataFrame): DataFrame = df.localCheckpoint(true)

    val bits = sys.env.getOrElse("SPARK_GRAFT_LSH_BITS", "12").toInt
    val tables = sys.env.getOrElse("SPARK_GRAFT_LSH_TABLES", "64").toInt
    println(s"[profile] geometry: $bits bits x $tables tables")
    val base = timed("0 injected base (ckpt)") {
      val b = QueriesLlm.dbscanBase(spark, sfDir); b.count(); b
    }
    val bucketed = timed(s"1 lsh bucketing ($tables tables)")(
      Similarity.bucketedFrame(base, bits, tables, None)) // eager cache+count inside
    val candidates = timed("2 candidate distinct")(
      ckpt(Similarity.lshCandidatePairs(bucketed)))
    val nCand = candidates.count()
    val pairs = timed("3 exact-cosine verify")(
      ckpt(Similarity.verifyCandidatePairs(base, candidates, 0.9)))
    val nPairs = pairs.count()
    val clustered = timed("4 degree/core/CC cluster")(
      ckpt(Dbscan.cluster(pairs, minPts = 6)))
    timed("5 member/noise rollup") {
      QueriesLlm.dbscanRollup(base, clustered).queryExecution.toRdd.foreach(_ => ())
    }
    println(s"[profile] candidates=$nCand verified_pairs=$nPairs")

    spark.catalog.clearCache()
    val plan = QueriesLlm.dbscanRollup(base,
        Dbscan.cluster(
          Similarity.nearDupPairsLsh(base, threshold = 0.9, bits = bits, tables = tables),
          minPts = 6))
      .queryExecution.executedPlan.toString
    val nExchange = "(?m)^.*Exchange".r.findAllIn(plan).size
    println(s"[profile] registry plan: $nExchange Exchange node(s)")
    spark.stop()
  }
}
