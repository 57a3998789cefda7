package graft.functions

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Micro-fixture checks for the corpus-curation operators: contamination
  * flagging, repetition statistics, portable sample key, packing plan.
  */
class CorpusOpsSpec extends SparkSpec {

  import spark.implicits._

  private def docs(rows: (Long, String, String)*) =
    rows.toDF("doc_id", "text", "source")

  test("withContamination flags exactly the docs sharing an eval n-gram") {
    val eval = docs((0L, "alpha beta gamma delta epsilon", "ev"))
    val corpus = docs(
      (1L, "x y alpha beta gamma delta z", "a"), // shares 4-gram "alpha beta gamma delta"
      (2L, "alpha beta gamma nope delta", "a"), // 3-gram overlap only — clean at n=4
      (3L, "totally unrelated words here now", "b"))
    val out = CorpusOps
      .withContamination(corpus, CorpusOps.evalNgrams(eval, 4), 4)
      .select("doc_id", "is_contaminated")
      .collect()
      .map(r => r.getLong(0) -> r.getInt(1))
      .toMap
    assert(out === Map(1L -> 1, 2L -> 0, 3L -> 0))
  }

  test("short docs (≤ n tokens) contaminate only on whole-text equality") {
    val eval = docs((0L, "tiny doc", "ev"))
    val corpus = docs((1L, "  TINY   doc ", "a"), (2L, "tiny doc extra pad words", "b"))
    val out = CorpusOps
      .withContamination(corpus, CorpusOps.evalNgrams(eval, 4), 4)
      .select("doc_id", "is_contaminated")
      .collect()
      .map(r => r.getLong(0) -> r.getInt(1))
      .toMap
    // doc 1 normalizes to the eval text exactly; doc 2's 4-grams never
    // equal the eval's whole-text gram
    assert(out === Map(1L -> 1, 2L -> 0))
  }

  test("withRepetitionStats: n2/d2/top2 on a hand-counted fixture") {
    // tokens: a b a b a  → 2-grams: [a b, b a, a b, b a] n2=4 d2=2 top2=2
    val out = CorpusOps
      .withRepetitionStats(docs((1L, "a b a b a", "s")))
      .select("n2", "d2", "top2")
      .collect()
      .head
    assert(out === Row(4L, 2L, 2L))
  }

  test("sampleKey matches the SQL-portable md5 construction and is stable") {
    val keys = spark
      .range(0, 50)
      .select(col("id"), CorpusOps.sampleKey(col("id")).as("k"))
      .collect()
      .map(r => r.getLong(0) -> r.getLong(1))
      .toMap
    // independently computed: first 8 hex chars of md5("graft" + id), % 1000
    def expected(id: Long): Long = {
      val d = java.security.MessageDigest.getInstance("MD5")
        .digest(s"graft$id".getBytes("UTF-8"))
      val hex = d.take(4).map(b => f"$b%02x").mkString
      java.lang.Long.parseLong(hex, 16) % 1000
    }
    keys.foreach { case (id, k) => assert(k === expected(id), s"id=$id") }
    assert(keys.values.toSet.size > 30, "keys should spread over [0,1000)")
  }

  test("tokenChunks: non-overlapping width-grid with trailing partial chunk") {
    val out = docs((1L, "a b c d e", "s"))
      .select(CorpusOps.tokenChunks(col("text"), 2).as("c"))
      .collect()
      .head
      .getSeq[String](0)
    assert(out === Seq("a b", "c d", "e"))
    // single-token and blank text both yield exactly one chunk
    val short = docs((1L, "solo", "s"), (2L, "   ", "s"))
      .select(CorpusOps.tokenChunks(col("text"), 8).as("c"))
      .collect()
      .map(_.getSeq[String](0))
    assert(short(0) === Seq("solo"))
    assert(short(1) === Seq(""))
  }

  test("withChunkDedup: cross-doc duplicated chunks counted per doc") {
    // width 2 → doc 1 chunks {a b, c d}; doc 2 {a b, x y}; doc 3 {p q}
    // "a b" occurs in docs 1 and 2 → duplicated; everything else unique
    val d = docs((1L, "a b c d", "s"), (2L, "a b x y", "s"), (3L, "p q", "s"))
    val out = CorpusOps
      .withChunkDedup(d, 2)
      .select("doc_id", "n_chunks", "n_dup_chunks")
      .collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2))))
      .toMap
    assert(out === Map(1L -> ((2L, 1L)), 2L -> ((2L, 1L)), 3L -> ((1L, 0L))))
  }

  test("withChunkDedup: repeats within one doc alone are not duplicates") {
    // doc 1 repeats its own chunk ("a b" twice) — distinct-per-doc first,
    // so a within-doc repeat never counts as a cross-doc duplicate
    val d = docs((1L, "a b a b", "s"), (2L, "z z z z", "s"))
    val out = CorpusOps
      .withChunkDedup(d, 2)
      .select("doc_id", "n_chunks", "n_dup_chunks")
      .collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2))))
      .toMap
    assert(out === Map(1L -> ((1L, 0L)), 2L -> ((1L, 0L))))
  }

  test("withPackingPlan: offsets, bins, and split docs on a fixture") {
    // budget 10; source s docs in id order with bpe token counts 4, 8, 6:
    // offsets 0, 4, 12 → bins (0,0), (0,1) split, (1,1)
    val d = docs((1L, "w w w w", "s"), (2L, "w w w w w w w w", "s"), (3L, "w w w w w w", "s"))
    val out = CorpusOps
      .withPackingPlan(d, 10L)
      .select("doc_id", "n_tok", "tok_offset", "start_bin", "end_bin")
      .collect()
      .map(r => (r.getLong(0), (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))))
      .toMap
    assert(out(1L) === ((4L, 0L, 0L, 0L)))
    assert(out(2L) === ((8L, 4L, 0L, 1L)))
    assert(out(3L) === ((6L, 12L, 1L, 1L)))
  }

  test("packing treats a zero-token doc as occupying its start bin") {
    val d = docs((1L, "w w w", "s"), (2L, "", "s"))
    val out = CorpusOps
      .withPackingPlan(d, 10L)
      .filter(col("doc_id") === 2)
      .select("n_tok", "start_bin", "end_bin")
      .collect()
      .head
    assert(out === Row(0L, 0L, 0L))
  }

  test("shardManifest: reproducible sharded shuffle order, invariant to partitioning") {
    val session = spark
    import session.implicits._
    val docs = (0L until 500L).toDF("doc_id")
    val m = CorpusOps.shardManifest(docs, numShards = 8)
      .select("doc_id", "shuffle_key", "shard", "pos").collect()
    assert(m.length == 500)
    // shard routing = pmod(key, 8); every shard's positions are 0..size-1
    m.foreach { r =>
      val expected = (r.getLong(1) % 8 + 8) % 8
      assert(r.getInt(2) == expected.toInt)
    }
    val byShard = m.groupBy(_.getInt(2))
    assert(byShard.keySet == (0 until 8).toSet, "uniform keys must hit every shard")
    byShard.values.foreach { rows =>
      assert(rows.map(_.getInt(3)).sorted.toSeq == rows.indices.toSeq)
      // in-shard order follows (shuffle_key, doc_id)
      val sorted = rows.sortBy(r => (r.getLong(1), r.getLong(0)))
      assert(sorted.map(_.getInt(3)).toSeq == rows.indices.toSeq)
    }
    // determinism under a different physical partitioning: same manifest
    val m2 = CorpusOps.shardManifest(docs.repartition(13), numShards = 8)
      .select("doc_id", "shard", "pos").collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getInt(2))).sortBy(_._1)
    val m1 = m.map(r => (r.getLong(0), r.getInt(2), r.getInt(3))).sortBy(_._1)
    assert(m1.toSeq == m2.toSeq)
  }
}
