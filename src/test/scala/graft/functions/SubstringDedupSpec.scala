package graft.functions

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Substring-level dedup: duplicated k-token windows and their merged
  * spans must match a brute-force scan, including the hash-collision
  * verification step (exactness may not ride on xxhash64).
  */
class SubstringDedupSpec extends SparkSpec {

  import spark.implicits._

  private def norm(s: String): Array[String] =
    s.trim.toLowerCase.replaceAll("\\s+", " ").split(" ")

  /** Brute force: every k-window string -> set of docs containing it;
    * duplicated window positions are those whose string occurs in >= 2
    * distinct docs.
    */
  private def bruteDupPositions(docs: Seq[(Long, String)], k: Int): Set[(Long, Int)] = {
    val wins = for {
      (id, text) <- docs
      toks = norm(text)
      if toks.length >= k
      i <- 0 to (toks.length - k)
    } yield (id, i + 1, toks.slice(i, i + k).mkString(" "))
    val byWin = wins.groupBy(_._3).filter(_._2.map(_._1).distinct.size >= 2)
    byWin.values.flatten.map(w => (w._1, w._2)).toSet
  }

  private def bruteSpans(docs: Seq[(Long, String)], k: Int): Set[(Long, Long, Long, Long)] =
    bruteMerge(bruteDupPositions(docs, k), k)

  /** Interval-union merge: window starts within k of the previous start
    * have touching/overlapping [p, p+k-1] ranges and join one island.
    */
  private def bruteMerge(ps: Set[(Long, Int)], k: Int): Set[(Long, Long, Long, Long)] =
    ps.groupBy(_._1).flatMap { case (id, pps) =>
      val sorted = pps.map(_._2).toSeq.sorted
      val runs = sorted.foldLeft(List.empty[(Int, Int, Int)]) {
        case ((s, e, n) :: tail, p) if p - e <= k => (s, p, n + 1) :: tail
        case (acc, p) => (p, p, 1) :: acc
      }
      runs.map { case (s, e, n) => (id, s.toLong, (e + k - 1).toLong, n.toLong) }
    }.toSet

  test("duplicated spans match brute force on a crafted fixture") {
    val boiler = (1 to 12).map(i => s"b$i").mkString(" ") // 12-token boilerplate
    val docs = Seq(
      1L -> s"u1 u2 u3 $boiler u4 u5 u6 u7 u8 u9",
      2L -> s"v1 v2 $boiler v3 v4 v5 v6 v7 v8 v9 v10",
      3L -> "w1 w2 w3 w4 w5 w6 w7 w8 w9 w10 w11 w12 w13", // no dup
      4L -> "short doc") // < k tokens
    val k = 10
    val got = SubstringDedup.spans(docs.toDF("doc_id", "text"), k)
      .as[(Long, Long, Long, Long)].collect().toSet
    val want = bruteSpans(docs, k)
    assert(got === want, s"got $got want $want")
    // the 12-token boilerplate yields 3 k=10 windows merging into ONE span
    // of 12 tokens in each carrier doc
    assert(got.count(s => s._4 == 3 && s._3 - s._2 + 1 == 12) === 2)
  }

  test("within-doc repetition alone is NOT cross-document duplication") {
    val rep = (1 to 10).map(i => s"r$i").mkString(" ")
    val docs = Seq(
      1L -> s"$rep x1 x2 $rep", // same 10-gram twice in ONE doc
      2L -> "y1 y2 y3 y4 y5 y6 y7 y8 y9 y10 y11")
    val got = SubstringDedup.spans(docs.toDF("doc_id", "text"), 10).count()
    assert(got === 0L)
  }

  test("stats row: window totals and span token coverage, brute-checked") {
    val boiler = (1 to 15).map(i => s"b$i").mkString(" ")
    val docs = Seq(
      1L -> s"$boiler a1 a2 a3 a4 a5",
      2L -> s"c1 c2 c3 $boiler",
      3L -> s"d1 d2 d3 d4 d5 d6 d7 d8 d9 d10")
    val k = 10
    val got = SubstringDedup.crossDocDupStats(docs.toDF("doc_id", "text"), k)
      .as[(Long, Long, Long, Long)].collect().toSet
    // doc1: 20 toks -> 11 windows; boilerplate occupies starts 1..6 (6
    // windows), span tokens 15. doc2: 18 toks -> 9 windows; starts 4..9,
    // span tokens 15. doc3: no dups -> absent.
    assert(got === Set((1L, 11L, 6L, 15L), (2L, 9L, 6L, 15L)))
  }

  test("overlapping non-adjacent dup windows merge into ONE union span") {
    // doc1 windows at pos 1 and pos 3 are duplicated (into docs 2 and 3
    // respectively) but pos 2 is NOT: the ranges [1,5] and [3,7] overlap,
    // so the union span is [1,7], not two overlapping spans
    val k = 5
    val docs = Seq(
      1L -> "a1 a2 a3 a4 a5 a6 a7", // w1=a1..a5, w2=a2..a6, w3=a3..a7
      2L -> "x1 a1 a2 a3 a4 a5 x2", // contains w1 only
      3L -> "y1 a3 a4 a5 a6 a7 y2") // contains w3 only
    val got = SubstringDedup.spans(docs.toDF("doc_id", "text"), k)
      .as[(Long, Long, Long, Long)].collect().toSet
    assert(got === bruteSpans(docs, k))
    // doc1: one span [1,7] covering 2 windows (w2 is not duplicated)
    assert(got.filter(_._1 == 1L) === Set((1L, 1L, 7L, 2L)))
  }

  test("trim stats: canonical owner keeps its copy, union never double-counts") {
    val k = 5
    val boiler = (1 to 7).map(i => s"b$i").mkString(" ") // 7 toks -> 3 dup windows
    val docs = Seq(
      1L -> s"$boiler u1 u2 u3", // owner of every boiler window (min doc)
      2L -> s"v1 v2 $boiler v3", // removable: spans [3,9] -> 7 tokens
      3L -> s"w1 $boiler w2 w3 w4") // removable: spans [2,8] -> 7 tokens
    val got = SubstringDedup.trimStats(docs.toDF("doc_id", "text"), k)
      .as[(Long, Long, Long, Long)].collect().toSet
    // doc1 is the owner everywhere -> absent; docs 2/3 lose the 7 boiler
    // tokens each
    assert(got === Set((2L, 10L, 7L, 3L), (3L, 11L, 7L, 4L)))
    // brute check of the removable union: owner = min doc per window string
    val wins = for {
      (id, text) <- docs; toks = norm(text); if toks.length >= k
      i <- 0 to (toks.length - k)
    } yield (id, i + 1, toks.slice(i, i + k).mkString(" "))
    val owners = wins.groupBy(_._3).filter(_._2.map(_._1).distinct.size >= 2)
      .map { case (w, rs) => (w, rs.map(_._1).min) }
    val removable = wins.collect {
      case (id, p, w) if owners.get(w).exists(_ != id) => (id, p)
    }.toSet
    val want = bruteMerge(removable, k).groupBy(_._1).map { case (id, spans) =>
      val nTok = norm(docs.find(_._1 == id).get._2).length.toLong
      val rm = spans.map(s => s._3 - s._2 + 1).sum
      (id, nTok, rm, nTok - rm)
    }.toSet
    assert(got === want)
  }

  test("trimmed text: spans cut from the normalized token stream; full " +
    "duplicates trim to empty; owner keeps its copy") {
    val k = 5
    val boiler = (1 to 7).map(i => s"b$i").mkString(" ") // 7 toks -> 3 dup windows
    val docs = Seq(
      1L -> s"$boiler u1 u2 u3",   // owner of every boiler window -> absent
      2L -> s"v1 v2 $boiler v3",   // loses [3,9]: keeps v1 v2 v3
      3L -> s"w1 $boiler w2 w3 w4", // loses [2,8]: keeps w1 w2 w3 w4
      4L -> "e1 e2 e3 e4 e5 e6",   // exact dup pair with 5 (same text)
      5L -> "e1 e2 e3 e4 e5 e6")   // non-owner -> fully trimmed, empty text
    val got = SubstringDedup.trimmedText(docs.toDF("doc_id", "text"), k)
      .as[(Long, Long, String)].collect().toSet
    assert(got === Set(
      (2L, 3L, "v1 v2 v3"),
      (3L, 4L, "w1 w2 w3 w4"),
      (5L, 0L, "")), s"got $got")
  }

  test("trimmed text: overlapping spans cut as one interval union") {
    // same fixture as the span-union test: doc1's windows 1 and 3 are
    // duplicated into docs 2 and 3 (which are the owners? no — doc1 is the
    // min id so doc1 OWNS both windows; docs 2 and 3 lose their copies)
    val k = 5
    val docs = Seq(
      1L -> "a1 a2 a3 a4 a5 a6 a7",
      2L -> "x1 a1 a2 a3 a4 a5 x2", // loses [2,6]: keeps x1 x2
      3L -> "y1 a3 a4 a5 a6 a7 y2") // loses [2,6]: keeps y1 y2
    val got = SubstringDedup.trimmedText(docs.toDF("doc_id", "text"), k)
      .as[(Long, Long, String)].collect().toSet
    assert(got === Set((2L, 2L, "x1 x2"), (3L, 2L, "y1 y2")), s"got $got")
  }

  test("randomized agreement with brute force") {
    val rnd = new scala.util.Random(7)
    val vocab = (0 until 12).map(i => s"t$i")
    for (trial <- 0 until 3) {
      val docs = (0 until 25).map { id =>
        (id.toLong,
          Seq.fill(8 + rnd.nextInt(30))(vocab(rnd.nextInt(vocab.size))).mkString(" "))
      }
      val k = 5
      val got = SubstringDedup.spans(docs.toDF("doc_id", "text"), k)
        .as[(Long, Long, Long, Long)].collect().toSet
      assert(got === bruteSpans(docs, k), s"trial $trial")
    }
  }
}
