package graft.functions

import org.apache.spark.sql.catalyst.expressions.XxHash64Function
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StringType
import org.apache.spark.unsafe.types.UTF8String

import graft.SparkSpec

/** [[TokenWindowHashes]]: the rolling-update recurrence must equal a direct
  * (non-rolling) polynomial evaluation of every window, equal windows must
  * hash equal across documents, and the codegen path must agree with the
  * kernel.
  */
class TextExprsSpec extends SparkSpec {

  import spark.implicits._

  private val B = 0x9E3779B97F4A7C15L

  private def tokHash(t: String): Long =
    XxHash64Function.hash(UTF8String.fromString(t), StringType, 42L)

  /** Direct per-window polynomial — no rolling reuse, the independent
    * reference the recurrence is checked against.
    */
  private def direct(toks: Array[String], k: Int): Array[Long] =
    (0 to toks.length - k).map { i =>
      var h = 0L
      (i until i + k).foreach(j => h = h * B + tokHash(toks(j)))
      h
    }.toArray

  private def viaDf(toks: Seq[String], k: Int): Option[Array[Long]] =
    Seq(Tuple1(toks)).toDF("toks")
      .select(TextExprs.windowHashes(col("toks"), k).as("h"))
      .as[Option[Array[Long]]].head()

  test("rolling recurrence equals direct polynomial, several k and lengths") {
    val rnd = new scala.util.Random(42)
    for (k <- Seq(1, 2, 5, 10); n <- Seq(k, k + 1, k + 7, 40)) {
      val toks = Array.fill(n)(s"t${rnd.nextInt(8)}")
      assert(viaDf(toks.toSeq, k).get.toSeq === direct(toks, k).toSeq, s"k=$k n=$n")
    }
  }

  test("equal windows hash equal across docs; short array empty; null null") {
    val a = Seq("x", "p1", "p2", "p3", "y")
    val b = Seq("z", "w", "p1", "p2", "p3")
    val ha = viaDf(a, 3).get
    val hb = viaDf(b, 3).get
    assert(ha(1) === hb(2)) // the shared ["p1","p2","p3"] window
    assert(viaDf(Seq("one", "two"), 3).get.isEmpty)
    val nullRow = Seq(Tuple1(null.asInstanceOf[Seq[String]])).toDF("toks")
      .select(TextExprs.windowHashes(col("toks"), 3).as("h"))
      .as[Option[Array[Long]]].head()
    assert(nullRow.isEmpty)
  }

  test("kernel eval path agrees with the DataFrame (codegen) path") {
    val toks = Array("a", "b", "a", "b", "a", "c")
    val kern = new WindowHashKernel(2)
    val got = kern.compute(new GenericArrayData(
      toks.map(t => UTF8String.fromString(t)).toArray[Any]))
    assert(got.toLongArray().toSeq === viaDf(toks.toSeq, 2).get.toSeq)
  }

  test("SQL-registered function resolves") {
    val out = spark.sql(
      s"SELECT ${TextExprs.WindowHashesName}(array('a','b','c'), 2) AS h")
      .as[Array[Long]].head()
    assert(out.toSeq === direct(Array("a", "b", "c"), 2).toSeq)
  }
}
