package graft.functions

import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

import graft.SparkSpec

/** The native quality-score kernel vs the composed Column form it
  * replaced: bit-equal doubles over randomized adversarial texts —
  * whitespace classes (tab/newline/VT/FF/CR), leading/trailing runs,
  * blank/empty strings, punctuation, uppercase, non-ASCII — plus null
  * propagation. The DuckDB oracles replay the composed tree, so this pin
  * is what keeps them hash-green against the kernel.
  */
class QualitySpec extends SparkSpec {

  private val stop = TextOps.stopwords.head._2

  test("kernel == composed form, randomized adversarial texts") {
    val session = spark
    import session.implicits._
    val piece: Gen[String] = Gen.oneOf(
      Gen.oneOf(stop), // real stopwords
      Gen.chooseNum(1, 8).flatMap(n => Gen.stringOfN(n, Gen.alphaChar)),
      Gen.oneOf("THE", "The", "a1b2", "...", "!?", "café", "Über", "x"))
    val ws: Gen[String] = Gen.chooseNum(1, 3).flatMap(n =>
      Gen.stringOfN(n, Gen.oneOf(' ', '\t', '\n', '', '\f', '\r')))
    val textGen: Gen[String] = for {
      n <- Gen.chooseNum(0, 14)
      ps <- Gen.listOfN(n, piece)
      ss <- Gen.listOfN(n + 1, ws)
    } yield (ss.head +: ps.zip(ss.tail).flatMap { case (p, s) => Seq(p, s) }).mkString

    val texts = (1 to 300)
      .flatMap(i => textGen.apply(Gen.Parameters.default, Seed(i.toLong))) ++
      Seq("", " ", "\t", "  a  ", "the the the the the", "\ta b c d e\t")
    val df = texts.toDF("text")
    val rows = df.select(
        TextOps.qualityScore(col("text")).as("kernel"),
        TextOps.qualityScoreComposed(col("text")).as("composed"))
      .collect()
    rows.zip(texts).foreach { case (r, t) =>
      assert(java.lang.Double.doubleToRawLongBits(r.getDouble(0)) ==
        java.lang.Double.doubleToRawLongBits(r.getDouble(1)),
        s"mismatch on ${t.map(c => f"\\u${c.toInt}%04x").mkString}: " +
          s"kernel=${r.getDouble(0)} composed=${r.getDouble(1)}")
    }
  }

  test("null text propagates to null score, like the composed form") {
    val session = spark
    import session.implicits._
    val df = Seq[Option[String]](None, Some("the and of it is here now ok")).toDF("text")
    val got = df.select(TextOps.qualityScore(col("text")).as("q"),
      TextOps.qualityScoreComposed(col("text")).as("c")).collect()
    assert(got(0).isNullAt(0) && got(0).isNullAt(1))
    assert(got(1).getDouble(0) == got(1).getDouble(1))
  }
}
