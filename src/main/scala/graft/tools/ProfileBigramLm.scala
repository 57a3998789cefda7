package graft.tools

import org.apache.spark.sql.functions._

/** Stage attribution for `llm_bigram_lm_filter` at scale: tokenization,
  * model aggregates, and the scoring join+aggregate, timed with eager cuts
  * between them (isolated-stage convention of [[ProfileDbscan]]).
  */
object ProfileBigramLm {
  private def timed[A](label: String)(mk: => A): A = {
    val t0 = System.nanoTime()
    val r = mk
    println(f"[profile] $label%-28s ${(System.nanoTime() - t0) / 1e9}%7.2f s")
    r
  }

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = graft.core.GraftSession.get()
    import graft.queries.QueriesCorpus._

    val d = timed("0 tokenize corpus (ckpt)") {
      val t = tokenizedDocs(spark, sfDir).localCheckpoint(true); t.count(); t
    }
    println(s"[profile] docs=${d.count()} partitions=${d.rdd.getNumPartitions}")
    val (uni, big, vocab) = timed("1 model aggregates (ckpt)") {
      val (u, b, v) = bigramModelFrames(d)
      val uc = u.localCheckpoint(true); val bc = b.localCheckpoint(true)
      val vc = v.localCheckpoint(true)
      (uc, bc, vc)
    }
    println(s"[profile] uni=${uni.count()} big=${big.count()}")
    timed("2 score join+agg") {
      scoreAgainstModel(d, uni, big, vocab).queryExecution.toRdd.foreach(_ => ())
    }
    timed("3 full registry row") {
      graft.queries.Registry.all.find(_.name == "llm_bigram_lm_filter").get
        .run(spark, sfDir).queryExecution.toRdd.foreach(_ => ())
    }
    spark.stop()
  }
}
