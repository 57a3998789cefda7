package graft.operators

import graft.SparkSpec

/** Prefix-doubling suffix array: hand-computed order on a tiny corpus, the
  * within-doc suffix semantics, the comparison cap with (doc_id, pos)
  * tie-break, and a full from-scratch replay on real corpus text.
  */
class SuffixArraySpec extends SparkSpec {

  private def sa(docs: Seq[(Long, String)], cap: Int = 64): Seq[(Long, Long, Long)] = {
    val session = spark
    import session.implicits._
    SuffixArray.build(docs.toDF("doc_id", "text"), capTokens = cap)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
      .sortBy(_._1)
  }

  test("hand-computed token suffix order across two documents") {
    // doc 1: "b a"  -> suffixes: (1,1)="b a", (1,2)="a"
    // doc 2: "a b"  -> suffixes: (2,1)="a b", (2,2)="b"
    // sorted: "a"(1,2) < "a b"(2,1) < "b"(2,2) < "b a"(1,1)
    val got = sa(Seq((1L, "b a"), (2L, "a b")))
    assert(got == Seq((1L, 1L, 2L), (2L, 2L, 1L), (3L, 2L, 2L), (4L, 1L, 1L)))
  }

  test("suffixes equal through the cap tie-break by (doc_id, pos)") {
    // cap=2: suffixes of "x x x x" compare equal beyond 2 tokens:
    // (1,3)="x x", (1,4)="x" -> "x" < "x x" == "x x" == "x x"(capped),
    // the three capped-equal suffixes order by pos
    val got = sa(Seq((1L, "x x x x")), cap = 2)
    assert(got == Seq((1L, 1L, 4L), (2L, 1L, 1L), (3L, 1L, 2L), (4L, 1L, 3L)))
  }

  test("dupWindowPositions finds exactly the k-windows occurring twice-plus") {
    val session = spark
    import session.implicits._
    // "x y" occurs at (1,1), (1,4) [within-doc repeat] and (2,3)
    // [cross-doc]; every other 2-token window is unique
    val docs = Seq((1L, "x y z x y"), (2L, "p q x y w")).toDF("doc_id", "text")
    val got = SuffixArray.dupWindowPositions(docs, k = 2, capTokens = 4)
      .as[(Long, Long)].collect().toSet
    assert(got == Set((1L, 1L), (1L, 4L), (2L, 3L)))
  }

  test("SA dup positions contain the rolling-hash pipeline's cross-doc set") {
    // the two exact paths cross-check: SubstringDedup counts CROSS-DOC
    // duplicated 10-token windows; the suffix-array readout counts ANY
    // second occurrence (within-doc included) — so on the same corpus
    // slice the former must be a subset of the latter, and the difference
    // must contain only positions whose window repeats WITHIN its doc only
    val session = spark
    import session.implicits._
    val docs = graft.core.Tables.documents(spark, "/root/testdata/sf0.001")
      .filter($"source".isin("src0", "src1", "src2"))
    val saPos = SuffixArray.dupWindowPositions(docs, k = 10)
      .as[(Long, Long)].collect().toSet
    val crossDoc = graft.functions.SubstringDedup.dupWindowPositions(docs, 10)
      .as[(Long, Long)].collect().toSet
    assert(saPos.nonEmpty && crossDoc.nonEmpty)
    assert(crossDoc.subsetOf(saPos))
  }

  test("window-shift partner fetch ≡ broadcast-join fetch (scrambled input)") {
    // the r17 lead(rank, span) partner fetch (the past-broadcast-budget
    // path) relies on per-doc position DENSITY, not on input row order or
    // partitioning — force it via a zero budget on a corpus scrambled
    // across many partitions and demand the identical SA both ways
    val session = spark
    import session.implicits._
    val docs = Seq((7L, "a b a b a"), (3L, "b a b"), (11L, "a a b a b a b"))
    val scrambled = session.sparkContext
      .parallelize(scala.util.Random.shuffle(docs), 5).toDF("doc_id", "text")
    val local = docs.flatMap { case (id, text) =>
      val toks = text.split(" ")
      toks.indices.map(i => (toks.slice(i, i + 64).mkString(" "), id, (i + 1).toLong))
    }.sortBy(identity).zipWithIndex
      .map { case ((_, id, pos), i) => (i + 1L, id, pos) }
    val viaJoin = SuffixArray.build(scrambled)
      .as[(Long, Long, Long)].collect().toSeq.sortBy(_._1)
    session.conf.set(SuffixArray.PartnerBroadcastBytesKey, "0")
    try {
      val viaWindow = SuffixArray.build(scrambled)
        .as[(Long, Long, Long)].collect().toSeq.sortBy(_._1)
      assert(viaJoin == local)
      assert(viaWindow == local)
    } finally session.conf.unset(SuffixArray.PartnerBroadcastBytesKey)
  }

  test("matches a local capped-suffix sort of real corpus text") {
    val session = spark
    import session.implicits._
    val docs = graft.core.Tables.documents(spark, "/root/testdata/sf0.001")
      .filter($"source" === "src0")
      .select($"doc_id", $"text").as[(Long, String)].collect().toSeq
    val local = docs.flatMap { case (id, text) =>
      // mirror TextOps.normalized EXACTLY (the LmAnomalySpec convention):
      // Spark trim strips SPACES only (Java trim strips all <= U+0020) and
      // Spark split keeps trailing empty tokens (Java limit -1)
      val toks = text.replaceAll("^ +| +$", "")
        .toLowerCase(java.util.Locale.ROOT)
        .replaceAll("\\s+", " ").split(" ", -1)
      toks.indices.map(i =>
        (toks.slice(i, i + 64).mkString(" "), id, (i + 1).toLong))
    }.sortBy(identity)
      .zipWithIndex
      .map { case ((_, id, pos), i) => (i + 1L, id, pos) }
    val got = sa(docs)
    assert(got.size == local.size)
    assert(got == local)
  }
}
