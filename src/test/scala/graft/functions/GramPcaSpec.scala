package graft.functions

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Unit checks for the quantized-Gram PCA: aggregator exactness vs a
  * driver-side brute force, power-iteration recovery of a known dominant
  * axis, deflation orthogonality, and the end-to-end projection shape.
  */
class GramPcaSpec extends SparkSpec {

  import spark.implicits._

  private val dim = 4

  test("GramAggregator matches a brute-force integer gram and counts rows") {
    val vecs = Seq(
      Seq(1.0f, 2.0f, -3.0f, 0.5f),
      Seq(0.25f, -1.0f, 4.0f, 2.0f),
      Seq(-2.0f, 0.0f, 1.0f, -0.125f))
    val df = vecs.toDF("embedding")
    val buf = df.select(GramPca.quantize(col("embedding")).as("q"))
      .as[Seq[Long]]
      .select(GramPca.GramAggregator(dim).toColumn.name("g"))
      .head()
    val q = vecs.map(_.map(x => math.round(x.toDouble * 10000.0)))
    assert(buf(0) === vecs.length)
    var idx = 1
    for (i <- 0 until dim; j <- i until dim) {
      val expect = q.map(v => v(i) * v(j)).sum
      assert(buf(idx) === expect, s"gram($i,$j)")
      idx += 1
    }
  }

  test("power iteration recovers the dominant axis of an axis-aligned cloud") {
    // variance concentrated on coordinate 2: top component must align with e2
    val rows = (1 to 200).map { k =>
      val s = if (k % 2 == 0) 1.0f else -1.0f
      Seq(0.01f * (k % 3), 0.02f * (k % 5), s * 0.9f, 0.005f * (k % 7))
    }
    val df = rows.toDF("embedding")
    val buf = df.select(GramPca.quantize(col("embedding")).as("q"))
      .as[Seq[Long]]
      .select(GramPca.GramAggregator(dim).toColumn.name("g"))
      .head()
    val comps = GramPca.topComponents(buf, dim, k = 2)
    val (v1, lam1) = comps.head
    val (v2, lam2) = comps(1)
    assert(math.abs(v1(2)) > 0.99, s"v1 should align with e2, got ${v1.toSeq}")
    assert(lam1 > lam2 && lam2 >= -1e-12, s"eigenvalue order: $lam1 vs $lam2")
    // deflation orthogonality: |v1 . v2| ~ 0
    val dot = v1.zip(v2).map { case (a, b) => a * b }.sum
    assert(math.abs(dot) < 1e-6, s"components not orthogonal: $dot")
  }

  test("projectTopK emits one row per vector with rounded projections") {
    val df = Seq(
      (0L, 1, Seq(0.5f, 0.0f, 0.0f, 0.0f)),
      (1L, 2, Seq(0.0f, 0.5f, 0.0f, 0.0f)),
      (2L, 1, Seq(0.4f, 0.3f, 0.0f, 0.0f))).toDF("vec_id", "label", "embedding")
    val out = GramPca.projectTopK(df, "embedding", dim, k = 2)
    assert(out.columns.toSeq === Seq("vec_id", "label", "p1", "p2", "lam1", "lam2"))
    val rows = out.collect()
    assert(rows.length === 3)
    // projections bounded by vector norms (<= 1 here), eigenvalues constant
    val lams = rows.map(r => (r.getDouble(4), r.getDouble(5))).distinct
    assert(lams.length === 1)
    rows.foreach(r => assert(math.abs(r.getDouble(2)) <= 1.0 + 1e-9))
  }

  test("quantize rejects nothing in grid and aggregator guards the bound") {
    val ok = Seq(Seq(9.9f, -9.9f, 0.0f, 1.0f)).toDF("embedding")
      .select(GramPca.quantize(col("embedding")).as("q"))
      .as[Seq[Long]]
      .select(GramPca.GramAggregator(dim).toColumn.name("g"))
      .head()
    assert(ok(0) === 1L)
    val bad = Seq(Seq(11.0f, 0.0f, 0.0f, 0.0f)).toDF("embedding")
      .select(GramPca.quantize(col("embedding")).as("q"))
      .as[Seq[Long]]
    val e = intercept[Exception] {
      bad.select(GramPca.GramAggregator(dim).toColumn.name("g")).head()
    }
    assert(e.getMessage != null)
  }

  test("accumulation past Long headroom fails loudly, never wraps") {
    // Drive the diagonal sum to the Long boundary directly (driver-side
    // reduce/merge calls — the distributed path runs the same methods).
    // Each row at the grid max |q|=10^5 contributes 10^10 per cell; seed a
    // buffer one step below Long.MaxValue and show the next reduce throws
    // ArithmeticException instead of wrapping negative.
    val agg = GramPca.GramAggregator(dim)
    val nearMax = agg.zero
    nearMax(1) = Long.MaxValue - 1L // gram(0,0) cell
    val row = Seq(100000L, 0L, 0L, 0L) // contributes 10^10 to gram(0,0)
    intercept[ArithmeticException] { agg.reduce(nearMax, row) }
    // merge path: two half-full buffers whose sum overflows
    val a = agg.zero; val b = agg.zero
    a(2) = Long.MaxValue / 2 + 1L; b(2) = Long.MaxValue / 2 + 1L
    intercept[ArithmeticException] { agg.merge(a, b) }
    // sanity: a legal reduce on a fresh buffer still works after the guard
    val fresh = agg.reduce(agg.zero, row)
    assert(fresh(0) === 1L && fresh(1) === 10000000000L)
  }
}
