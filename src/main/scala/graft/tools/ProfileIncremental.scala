package graft.tools

import org.apache.spark.sql.functions._

/** Stage split for `llm_incremental_bucketed` — the amortization evidence:
  * the registry row pays the corpus band-index BUILD (signature pass +
  * bucketed catalog write) inside the row so the gate checks the whole
  * write→catalog→probe path, but in production the build runs ONCE at
  * ingest and every delta batch pays only the probe. This tool times the
  * two halves separately at scale:
  *
  *   build — MinHash.bandKeys(corpus) + bucketBy(32, bk) saveAsTable
  *   probe — bandKeys(batch) + join against the catalog table (index side
  *           exchange-free, pinned in PlanSpec) + pair distinct
  *   verify — exact-Jaccard verification + classification aggregate (the
  *           rest of the row, also per-batch cost)
  *
  * Usage: SPARK_GRAFT_SF_DIR=... sbt "runMain graft.tools.ProfileIncremental"
  */
object ProfileIncremental {

  private def timed[A](label: String)(mk: => A): A = {
    val t0 = System.nanoTime()
    val r = mk
    println(f"[profile] $label%-28s ${(System.nanoTime() - t0) / 1e9}%7.2f s")
    r
  }

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = graft.core.GraftSession.get()
    import graft.functions.MinHash

    val (corpusRaw, batchRaw) = graft.queries.QueriesLlm.incrementalFrames(spark, sfDir)
    // eager cut so stage timings don't re-run the frame construction
    val corpus = corpusRaw.localCheckpoint(true)
    val batch = batchRaw.localCheckpoint(true)

    timed("1a band index build+write") {
      graft.sources.Sinks.writeBucketed(
        MinHash.bandKeys(corpus), "prof_band_index_b", 32, Seq("bk"))
    }
    timed("1b fp index build+write") {
      graft.sources.Sinks.writeBucketed(
        corpus.select(graft.functions.TextOps.fingerprint(col("text")).as("fp")).distinct(),
        "prof_fp_index_b", 32, Seq("fp"))
    }
    val cand = timed("2 batch probe (cand distinct)") {
      val c = MinHash.bandKeys(batch).select(col("bk"), col("id").as("id_a"))
        .join(spark.table("prof_band_index_b").select(col("bk"), col("id").as("id_b")), "bk")
        .select(col("id_a"), col("id_b")).distinct()
        .localCheckpoint(true)
      c.count(); c
    }
    println(s"[profile] candidates=${cand.count()}")
    timed("3 exact-verify + classify") {
      graft.queries.QueriesLlm.incrementalClassify(batch, corpus, cand,
          Some(spark.table("prof_fp_index_b")))
        .queryExecution.toRdd.foreach(_ => ())
    }
    spark.stop()
  }
}
