package graft.functions

import graft.SparkSpec

/** BPE tokenizer training: the greedy single-scan merge semantics and the
  * full hand-computed merge-learning trace (including tiebreaks and early
  * stop when the vocab runs out of pairs).
  */
class BpeSpec extends SparkSpec {

  test("mergePair is greedy left-to-right non-overlapping") {
    assert(Bpe.mergePair(Vector("a", "a", "a"), "a", "a") == Vector("aa", "a"))
    assert(Bpe.mergePair(Vector("a", "b", "a", "b"), "a", "b") == Vector("ab", "ab"))
    assert(Bpe.mergePair(Vector("x", "a", "b", "y"), "a", "b") == Vector("x", "ab", "y"))
    assert(Bpe.mergePair(Vector("a"), "a", "a") == Vector("a"))
    assert(Bpe.mergePair(Vector.empty[String], "a", "b") == Vector.empty[String])
  }

  test("learnMerges follows the hand-computed trace and stops when pairs run out") {
    val session = spark
    import session.implicits._
    // vocab: "aaa"×2 → [a,a,a,>], "ab"×3 → [a,b,>]
    // r1: (a,a)=4 wins; aaa → [aa,a,>]
    // r2: tie at 3 between (a,b) and (b,>) → lexicographic left: (a,b); ab → [ab,>]
    // r3: (ab,>)=3 wins; ab → [ab>]
    // r4: tie at 2 between (a,>) and (aa,a) → "a" < "aa": (a,>); aaa → [aa,a>]
    // r5: (aa,a>)=2; aaa → [aaa>]
    // r6: no pairs anywhere → early stop at 5 merges
    val words = Seq(("aaa", 2L), ("ab", 3L)).toDF("w", "c")
    val got = Bpe.learnMerges(session, words, 6)
      .collect()
      .map(r => (r.getInt(0), r.getString(1), r.getString(2), r.getLong(3)))
      .sortBy(_._1)
    val expected = Seq(
      (1, "a", "a", 4L),
      (2, "a", "b", 3L),
      (3, "ab", ">", 3L),
      (4, "a", ">", 2L),
      (5, "aa", "a>", 2L))
    assert(got.toSeq == expected)
  }

  test("mergePair == the oracle's delimited-string replace, randomized") {
    // The DuckDB oracle merges via replace() on begin/end-delimited token
    // strings; the engine merges on arrays with a greedy single scan. The
    // BPE rows rest on these two semantics being identical — sweep it over
    // randomized token sequences including overlap-heavy ones.
    import org.scalacheck.Gen
    import org.scalacheck.rng.Seed
    val tok: Gen[String] = Gen.oneOf("a", "b", "ab", "aa", "c")
    val seqGen: Gen[List[String]] =
      Gen.chooseNum(0, 12).flatMap(n => Gen.listOfN(n, tok))
    def viaReplace(toks: Seq[String], l: String, r: String): Seq[String] = {
      val delim = toks.map(t => "" + t + "").mkString
      val merged = delim.replace(
        "" + l + "" + "" + r + "",
        "" + l + r + "")
      if (merged.isEmpty) Seq.empty
      else merged.stripPrefix("").stripSuffix("")
        .split("", -1).toSeq
    }
    val cases = (1 to 400).flatMap(i =>
      seqGen.apply(Gen.Parameters.default, Seed(i.toLong)))
    for {
      toks <- cases
      l <- Seq("a", "b", "aa")
      r <- Seq("a", "b", "ab")
    } assert(Bpe.mergePair(toks.toIndexedSeq, l, r) == viaReplace(toks, l, r),
      s"toks=$toks merge=($l,$r)")
  }

  test("applyMerges reproduces the final training state of each vocab word") {
    // the 5 merges learned above, applied in rank order
    val merges = Seq(("a", "a"), ("a", "b"), ("ab", ">"), ("a", ">"), ("aa", "a>"))
    assert(Bpe.applyMerges("aaa", merges) == Vector("aaa>"))
    assert(Bpe.applyMerges("ab", merges) == Vector("ab>"))
    // unseen word: only applicable merges fire, in order
    assert(Bpe.applyMerges("ba", merges) == Vector("b", "a>"))
    assert(Bpe.applyMerges("aaaa", merges) == Vector("aa", "aa", ">"))
  }
}
