package graft

/** Scale-measurement main for the connected-components operator: runs
  * `llm_dup_clusters` on the given SF dir and prints one JSON line with
  * wall time AND rounds-to-fixpoint
  * ([[graft.operators.ConnectedComponents.lastRounds]]) — the number that
  * actually governs CC cost at scale (work = rounds × edge shuffles;
  * Kiveris-style star alternation is O(log² n) rounds). Kept out of Bench:
  * rounds are an operator internal, not a query time.
  */
object CcBench {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.01")
    val spark = graft.core.GraftSession.get()
    val t0 = System.nanoTime()
    val df = graft.queries.Registry.queries("llm_dup_clusters")(spark, dir)
    val n = df.count()
    val sec = (System.nanoTime() - t0) / 1e9
    val json = s"""{"query":"llm_dup_clusters","sf":"$dir","rows":$n,""" +
      s""""sec":$sec,"cc_rounds":${graft.operators.ConnectedComponents.lastRounds}}"""
    println(json)
    java.nio.file.Files.writeString(
      java.nio.file.Paths.get(sys.env.getOrElse("SPARK_GRAFT_CC_OUT", "cc_bench.json")),
      json + "\n")
    spark.stop()
  }
}
