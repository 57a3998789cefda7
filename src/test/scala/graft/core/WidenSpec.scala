package graft.core

import graft.SparkSpec

/** The shared stats-gated widening policy: tiny inputs skip the shuffle,
  * mid-size inputs fan out to cores (scaled by per-task bytes), and
  * above the single-node ceiling the input is returned UNTOUCHED — the
  * structural no-op that makes the policy safe to leave in cluster-scale
  * plans.
  */
class WidenSpec extends SparkSpec {

  test("tiny input: no repartition (returned as-is)") {
    val df = spark.range(10).toDF("v") // stats ≈ 80 bytes < 2 tasks' worth
    assert(Widen.toCores(df) eq df)
  }

  test("mid-size input: fans out, capped at cores") {
    val df = spark.range(8L << 20).toDF("v") // stats ≈ 64 MB
    val out = Widen.toCores(df)
    val parts = out.rdd.getNumPartitions
    val cores = spark.sparkContext.defaultParallelism
    assert(parts == math.min(32, cores), s"got $parts")
    // finer per-task chunking widens further, still capped at cores
    val fine = Widen.toCores(df, perTaskBytes = 1L << 20)
    assert(fine.rdd.getNumPartitions == cores)
  }

  test("above the 4 GiB ceiling: structural no-op") {
    val df = spark.range(700L << 20).toDF("v") // stats ≈ 5.6 GB > ceiling
    assert(Widen.toCores(df) eq df)
  }
}
