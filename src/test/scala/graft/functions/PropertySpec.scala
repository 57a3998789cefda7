package graft.functions

import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

import graft.SparkSpec
import graft.operators.TickOps

/** Property-based checks over randomized inputs (scalacheck generators,
  * fixed seeds — reproducible) for the pure-logic corners the fixed oracle
  * corpus cannot sweep: the winnowing substring guarantee, the SimHash
  * banding pigeonhole, and keep-last merge semantics.
  */
class PropertySpec extends SparkSpec {

  private def samples[T](g: Gen[T], n: Int): Seq[T] =
    (1 to n).flatMap(i => g.apply(Gen.Parameters.default, Seed(i.toLong)))

  private val word: Gen[String] =
    Gen.chooseNum(1, 5).flatMap(n => Gen.stringOfN(n, Gen.alphaLowerChar))
  private val text: Gen[String] =
    Gen.chooseNum(0, 30).flatMap(n => Gen.listOfN(n, word)).map(_.mkString(" "))

  test("winnowing guarantee: strings sharing a (w+k-1)-char substring share a fingerprint") {
    // Schleimer et al.'s theorem: any common substring of length >= w+k-1
    // (= 11 at k=8, w=4) forces at least one common window-min k-gram hash.
    val gen = for {
      s <- Gen.stringOfN(16, Gen.alphaLowerChar)
      a <- text; b <- text; c <- text; d <- text
    } yield (s, s"$a $s $b", s"$c $s $d")
    val cases = samples(gen, 24)
    val session = spark
    import session.implicits._
    // one Spark job for all cases — per-case jobs would dominate the suite
    val rows = cases.zipWithIndex.flatMap { case ((_, t1, t2), i) =>
      Seq((i.toLong, 1, t1), (i.toLong, 2, t2))
    }
    val fps = rows.toDF("case", "side", "text")
      .select(col("case"), col("side"), TextOps.winnowFingerprints(col("text")).as("fp"))
      .collect().map(r => (r.getLong(0), r.getInt(1)) -> r.getSeq[Long](2).toSet).toMap
    cases.zipWithIndex.foreach { case ((s, _, _), i) =>
      assert(fps((i.toLong, 1)).intersect(fps((i.toLong, 2))).nonEmpty,
        s"case $i: no shared fingerprint between texts sharing '$s'")
    }
  }

  test("simhash banding finds EVERY pair within maxDist (pigeonhole recall)") {
    val gen = for {
      bases <- Gen.listOfN(6, Gen.long)
      ks <- Gen.listOfN(6, Gen.chooseNum(0, 12)) // up to 12 flipped bits
      maxDist <- Gen.oneOf(3, 7, 15)
    } yield (bases, ks, maxDist)
    val session = spark
    import session.implicits._
    samples(gen, 12).foreach { case (bases, ks, maxDist) =>
      // neighbors at controlled Hamming distance: flip k distinct positions
      val rows = bases.zipWithIndex.flatMap { case (b, i) =>
        val flipped = (0 until ks(i))
          .foldLeft(b)((acc, j) => acc ^ (1L << ((i * 7 + j * 5) % 64)))
        Seq((i.toLong * 2, b), (i.toLong * 2 + 1, flipped))
      }
      val got = SimHash
        .nearDupPairsFromSketches(rows.toDF("id", "sh"), maxDist)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
      val expect = (for {
        (ia, sa) <- rows; (ib, sb) <- rows if ia < ib
        d = java.lang.Long.bitCount(sa ^ sb) if d <= maxDist
      } yield (ia, ib, d)).toSet
      assert(got == expect, s"banded pairs diverge from brute force at maxDist $maxDist")
    }
  }

  test("mergeKeepNew == map-union with new-side wins, for any overlap") {
    val kv: Gen[List[(Int, Int)]] =
      Gen.listOf(Gen.zip(Gen.chooseNum(0, 8), Gen.chooseNum(0, 100)))
    val session = spark
    import session.implicits._
    samples(Gen.zip(kv, kv), 12).foreach { case (oldRows, newRows) =>
      // unique keys per side (toMap keeps the last occurrence on both sides)
      val o = oldRows.toMap.toSeq
      val n = newRows.toMap.toSeq
      val got = TickOps.mergeKeepNew(
          o.toDF("k", "v"), n.toDF("k", "v"), keys = Seq("k"))
        .collect().map(r => r.getInt(0) -> r.getInt(1)).toMap
      assert(got == o.toMap ++ n.toMap)
    }
  }
}
