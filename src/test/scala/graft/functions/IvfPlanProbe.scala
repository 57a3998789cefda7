package graft.functions

import org.apache.spark.sql.functions._

import graft.core.GraftSession

/** Scratch probe (test scope): measures IVF plan-build + end-to-end wall as
  * nlist/dims grow, demonstrating the broadcast-centroid assignment keeps
  * plan time flat where the former nlist-literal expression tree grew with
  * nlist (256 inline L2 blocks ≈ codegen budget blowout).
  * Run: sbt 'Test/runMain graft.functions.IvfPlanProbe <rows> <dims>'
  */
object IvfPlanProbe {
  def main(args: Array[String]): Unit = {
    val rows = args.headOption.map(_.toInt).getOrElse(20000)
    val dims = args.lift(1).map(_.toInt).getOrElse(128)
    val spark = GraftSession.get()
    import spark.implicits._
    val vecs = spark.range(rows.toLong).toDF("vec_id")
      .withColumn("embedding",
        expr(s"transform(sequence(1, $dims), i -> cast(sin(vec_id * i) + 1.5 as float))"))
      .cache()
    vecs.count()
    for (nlist <- Seq(16, 64, 256)) {
      val t0 = System.nanoTime()
      val df = Similarity.ivfTopK(vecs, k = 1, nlist = nlist, nprobe = 4, iters = 2)
      val tPlan = (System.nanoTime() - t0) / 1e9 // incl. k-means fit
      val t1 = System.nanoTime()
      df.queryExecution.executedPlan // force analysis + physical planning
      val tBuild = (System.nanoTime() - t1) / 1e9
      val t2 = System.nanoTime()
      val n = df.count()
      val tExec = (System.nanoTime() - t2) / 1e9
      println(f"PROBE nlist=$nlist%4d dims=$dims fit=$tPlan%.2fs plan=$tBuild%.3fs exec=$tExec%.2fs rows=$n")
    }
    spark.stop()
  }
}
