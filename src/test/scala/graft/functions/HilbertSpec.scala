package graft.functions

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** The Hilbert encoding is pinned by its defining properties — bijectivity
  * and unit-step adjacency — rather than against a reference table, then
  * the Column face is pinned to the kernel and the locality claim
  * (`layout_curve_compare`'s structural case) is asserted on a grid.
  */
class HilbertSpec extends SparkSpec {

  import spark.implicits._

  private def mapping(bits: Int): Map[Long, (Long, Long)] = {
    val k = new HilbertDKernel(bits)
    val n = 1L << bits
    (for (x <- 0L until n; y <- 0L until n) yield k.compute(x, y) -> (x, y)).toMap
  }

  test("bijective on the full grid for bits = 1..5") {
    for (bits <- 1 to 5) {
      val m = mapping(bits)
      val cells = 1L << (2 * bits)
      assert(m.size == cells, s"bits=$bits: ${m.size} distinct d of $cells")
      assert(m.keys.min == 0L && m.keys.max == cells - 1)
    }
  }

  test("consecutive distances are always grid neighbors (no Morton jumps)") {
    for (bits <- 2 to 5) {
      val m = mapping(bits)
      val cells = 1L << (2 * bits)
      var d = 0L
      while (d < cells - 1) {
        val (x0, y0) = m(d)
        val (x1, y1) = m(d + 1)
        assert(math.abs(x1 - x0) + math.abs(y1 - y0) == 1,
          s"bits=$bits: jump at d=$d: ($x0,$y0)->($x1,$y1)")
        d += 1
      }
    }
  }

  test("Column face equals the kernel and survives codegen") {
    val k = new HilbertDKernel(8)
    val rows = Seq((3L, 200L), (0L, 0L), (255L, 255L), (17L, 103L))
    val got = rows.toDF("x", "y")
      .select(col("x"), col("y"), HilbertCurve.hilbert(col("x"), col("y"), 8).as("h"))
      .as[(Long, Long, Long)].collect()
    got.foreach { case (x, y, h) => assert(h == k.compute(x, y), s"($x,$y)") }
  }

  test("null input yields null, not a crash") {
    val got = Seq((Some(1L), Option.empty[Long]), (Some(2L), Some(2L)))
      .toDF("x", "y")
      .select(HilbertCurve.hilbert(col("x"), col("y"), 4).as("h"))
      .as[Option[Long]].collect()
    assert(got(0).isEmpty && got(1).isDefined)
  }

  test("per-file span total: Hilbert <= Morton on a uniform grid") {
    val bits = 6
    val n = 1L << bits
    val k = new HilbertDKernel(bits)
    def spanTotal(key: (Long, Long) => Long): Long = {
      val byFile = (for (x <- 0L until n; y <- 0L until n) yield (key(x, y) / 64, x, y))
        .groupBy(_._1).values
      byFile.map { g =>
        g.map(_._2).max - g.map(_._2).min + g.map(_._3).max - g.map(_._3).min
      }.sum
    }
    def morton(x: Long, y: Long): Long =
      (0 until bits).map(i => (((x >> i) & 1L) << (2 * i)) | (((y >> i) & 1L) << (2 * i + 1))).sum
    val h = spanTotal(k.compute)
    val z = spanTotal(morton)
    assert(h <= z, s"hilbert span $h > morton span $z")
  }
}
