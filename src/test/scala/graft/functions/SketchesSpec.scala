package graft.functions

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkSpec

/** The sketch hash's exactness contract and the Bloom filter's one-sided
  * error guarantee — the properties every QueriesSketch oracle hangs on.
  */
class Hash61KernelSpec extends AnyFunSuite {

  private val M = Sketches.M61

  private def ref(x: Long, a: Long, b: Long): Long = {
    val xm = ((BigInt(x) mod BigInt(M)) + M) mod BigInt(M)
    ((BigInt(a) * xm + b) mod BigInt(M)).toLong
  }

  test("hash61 matches the BigInt reference across the full long range") {
    val rnd = new scala.util.Random(42)
    val params = Sketches.HllParams +: (Sketches.CmsParams ++ Sketches.BloomParams)
    val edge = Seq(0L, 1L, M - 1, M, M + 1, Long.MaxValue, Long.MinValue, -1L)
    for ((a, b) <- params; x <- edge ++ Seq.fill(2000)(rnd.nextLong()))
      assert(Hash61Kernel.hash(x, a, b) === ref(x, a, b), s"x=$x a=$a b=$b")
  }

  test("hash61 range is [0, M61) and the family separates points") {
    val (a, b) = Sketches.HllParams
    val hs = (0L until 10000L).map(Hash61Kernel.hash(_, a, b))
    assert(hs.forall(h => h >= 0 && h < M))
    assert(hs.distinct.size === hs.size, "a*x+b mod prime is injective below M61")
  }

  test("bloom kernel: zero false negatives, bounded false positives") {
    val rnd = new scala.util.Random(7)
    val m = 4096
    val build = Seq.fill(200)(rnd.nextLong().abs % 1000000).distinct
    val positions = for {
      k <- build
      (a, b) <- Sketches.BloomParams
    } yield Hash61Kernel.hash(k, a, b) % m
    val mask = Sketches.maskFromPositions(positions, m)
    val kernel = new BloomKernel(mask.words.toArray, m,
      Sketches.BloomParams.map(_._1).toArray, Sketches.BloomParams.map(_._2).toArray)
    assert(build.forall(kernel.test), "every inserted key must pass")
    val probes = Seq.fill(5000)(rnd.nextLong().abs % 1000000).filterNot(build.contains)
    val fp = probes.count(kernel.test)
    // k=3, n=200·3 positions in 4096 bits → fpp ≈ (1 − e^(−600/4096))^3 ≈ 0.25%
    assert(fp < probes.size / 20, s"false-positive rate implausibly high: $fp/${probes.size}")
  }
}

/** Column/codegen faces evaluate through the same kernel, and the SQL
  * registration resolves on a GraftSession.
  */
class SketchesColumnSpec extends SparkSpec {

  test("hash61 column face matches the kernel (codegen path)") {
    import spark.implicits._
    val (a, b) = Sketches.HllParams
    val xs = Seq(0L, 1L, 12345L, Sketches.M61 - 1)
    val got = xs.toDF("x").select(Sketches.hash61(col("x"), a, b).as("h"))
      .collect().map(_.getLong(0)).toSeq
    assert(got === xs.map(Hash61Kernel.hash(_, a, b)))
  }

  test("graft_hash61 resolves from SQL text") {
    import spark.implicits._
    Seq(7L).toDF("x").createOrReplaceTempView("sk_hash_probe")
    val (a, b) = Sketches.CmsParams.head
    val viaSql = spark.sql(s"SELECT graft_hash61(x, ${a}L, ${b}L) FROM sk_hash_probe")
      .collect().head.getLong(0)
    assert(viaSql === Hash61Kernel.hash(7L, a, b))
  }

  test("bloom column face: inserted keys pass, mask bounds membership") {
    import spark.implicits._
    val m = 512
    val build = Seq(3L, 99L, 1024L)
    val positions = for {
      k <- build
      (a, b) <- Sketches.BloomParams
    } yield Hash61Kernel.hash(k, a, b) % m
    val mask = Sketches.maskFromPositions(positions, m)
    val rows = (build ++ Seq(5L, 777L, 123456L)).toDF("x")
      .select(col("x"),
        Sketches.bloomMightContain(col("x"), mask, Sketches.BloomParams).as("p"))
      .collect().map(r => r.getLong(0) -> r.getBoolean(1)).toMap
    assert(build.forall(rows(_)), "no false negatives")
  }
}
