package graft.functions

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Fixture checks for the incremental-dedup building blocks: the
  * probe-vs-index band join finds cross-frame near-dups without a
  * corpus-side self-join, and exact-Jaccard verification filters band
  * coincidences.
  */
class IncrementalDedupSpec extends SparkSpec {

  import spark.implicits._

  private val corpusDocs = Seq(
    (1L, "the quick brown fox jumps over the lazy dog near the river bank today"),
    (2L, "spark executes declarative plans with catalyst and tungsten at scale"),
    (3L, "completely unrelated text about cooking pasta with garlic and olive oil"))

  test("crossCandidatePairs finds a probe doc near-duplicating an index doc") {
    val corpus = corpusDocs.toDF("doc_id", "text")
    val probe = Seq(
      // near-dup of doc 1: one token appended
      (10L, "the quick brown fox jumps over the lazy dog near the river bank today extra"),
      // unrelated
      (11L, "totally fresh content that matches nothing in the existing index")
    ).toDF("doc_id", "text")
    val cand = MinHash.crossCandidatePairs(probe, corpus)
    val verified = MinHash.withExactJaccard(cand, probe.unionByName(corpus))
      .filter(col("jaccard") >= 0.7)
      .select(col("id_a"), col("id_b")).as[(Long, Long)].collect().toSet
    assert(verified.contains((10L, 1L)), s"expected (10,1) in $verified")
    assert(!verified.exists(_._1 == 11L), s"doc 11 must not match: $verified")
  }

  test("cross pairs carry no ordering constraint and no self-join artifacts") {
    val corpus = corpusDocs.toDF("doc_id", "text")
    // probe id SMALLER than every corpus id: a self-join style a<b filter
    // would silently drop the pair
    val probe = Seq(
      (0L, "the quick brown fox jumps over the lazy dog near the river bank today")
    ).toDF("doc_id", "text")
    val got = MinHash.crossCandidatePairs(probe, corpus)
      .select(col("id_a"), col("id_b")).as[(Long, Long)].collect().toSet
    assert(got.contains((0L, 1L)), s"expected exact-duplicate pair (0,1) in $got")
  }

  test("exact-Jaccard threshold separates suffix-appended from rewritten text") {
    val corpus = corpusDocs.toDF("doc_id", "text")
    val probe = Seq(
      (20L, "the quick brown fox jumps over the lazy dog near the river bank today zqx zqy zqz"),
      (21L, "the slow red fox walks under a lazy cat near some other place entirely"))
      .toDF("doc_id", "text")
    val j = MinHash.withExactJaccard(
        MinHash.crossCandidatePairs(probe, corpus), probe.unionByName(corpus))
      .select(col("id_a"), col("jaccard")).as[(Long, Double)].collect().toMap
    assert(j.get(20L).exists(_ >= 0.7), s"suffix near-dup should verify: $j")
    assert(j.get(21L).forall(_ < 0.7), s"rewrite must not verify: $j")
  }
}
