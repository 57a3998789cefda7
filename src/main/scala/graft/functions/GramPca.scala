package graft.functions

import org.apache.spark.sql.{Column, DataFrame, Encoder}
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions._

/** Uncentered PCA over an embedding column via a distributed exact Gram
  * matrix + driver-side power iteration — the dimensionality-reduction /
  * whitening step a training-data pipeline runs before ANN indexing or
  * redundancy scoring (motivated by SURVEY.md §2.11's embedding-pipeline
  * north star — the reference itself has no embedding stage; this is part
  * of the training-data extension surface, not a reference port).
  *
  * Scale shape (the 100 TB answer):
  *  - embeddings are QUANTIZED to integer grid `round(x·10⁴)` first, so the
  *    Gram accumulation is an exact integer sum — associative, commutative,
  *    partition-order-free. Float/double sums over a shuffle are NOT
  *    reproducible across partitionings; integer sums are. Quantization is
  *    also what real embedding pipelines ship (int8/int16 compression), so
  *    the grid is the production representation, not a test crutch.
  *  - the ONLY aggregate is one typed [[GramAggregator]] pass: a fixed
  *    `1 + d(d+1)/2`-long buffer (d = 64 → 2 081 longs ≈ 16 KB) with
  *    map-side partial merge — one reduce of a model-sized state, zero
  *    shuffle of row data, no explode. At 10⁹ rows the reduce traffic is
  *    `partitions × 16 KB`, invariant in row count.
  *  - the eigensolve runs on the DRIVER on the d×d matrix — model-sized
  *    work (64×64), same contract as the k-means centroids and PQ
  *    codebooks in [[Similarity]]: the collected state is the MODEL, never
  *    data.
  *  - per-row Long overflow headroom: |q| ≤ 10⁴·max|x|; at max|x| ≈ 1 the
  *    per-row product is ≤ 10⁸, so the Long sums hold to ~9·10¹⁰ rows. The
  *    aggregator asserts the input grid bound AND accumulates with
  *    `Math.addExact` in both reduce and merge, so past the headroom the
  *    job FAILS LOUDLY with ArithmeticException instead of wrapping —
  *    the same fail-loud convention as `requireIdHeadroom`. The recovery
  *    at that scale is per-shard partial grams merged as DECIMAL(38,0)
  *    (exact, only the container widens); the exception is the signal to
  *    switch, never a silent wrong answer.
  *
  * Determinism contract (what makes the row oracle-checkable): every
  * floating-point statement below is a fixed-order sequential reduction
  * (ascending index), mirrored token-for-token by the DuckDB oracle's
  * `list_sum(list_transform(...))` and the numpy/pure-Python sf1 replay —
  * the same IEEE-double convention every H-family kernel already pins.
  */
object GramPca {

  /** Quantization grid: 4 decimal digits — int16-ish embedding compression. */
  val Scale = 10000.0

  /** `round(x·10⁴)` as a long; round = HALF_UP away from zero, identical in
    * Spark (BigDecimal HALF_UP), DuckDB (C `round`) and the replay
    * (Decimal ROUND_HALF_UP) — all three compare the same double against
    * the representable .5 boundary, so they cannot disagree.
    */
  def quantize(emb: Column): Column =
    transform(emb, x => round(x.cast("double") * lit(Scale)).cast("long"))

  /** One-pass exact integer Gram: buffer slot 0 = row count, slots 1.. =
    * upper-triangle Σ qᵢ·qⱼ (i ≤ j, row-major). Fixed-size, mergeable,
    * map-side-combined — the canonical bounded-state distributed moment
    * accumulator.
    */
  final case class GramAggregator(dim: Int)
    extends Aggregator[Seq[Long], Array[Long], Array[Long]] {

    private val tri = dim * (dim + 1) / 2

    override def zero: Array[Long] = new Array[Long](1 + tri)

    override def reduce(buf: Array[Long], q: Seq[Long]): Array[Long] = {
      require(q.length == dim, s"embedding dim ${q.length} != $dim")
      val a = q.toArray
      var i = 0
      while (i < dim) {
        // |q| ≤ 10^5 keeps q_i*q_j ≤ 10^10 and the running sums inside Long
        // until ~10^8 rows per partition — far past single-node scale; the
        // DECIMAL(38,0) widening documented above takes over beyond.
        require(math.abs(a(i)) <= 100000L, s"quantized value ${a(i)} out of grid")
        i += 1
      }
      buf(0) = Math.addExact(buf(0), 1L)
      var idx = 1
      i = 0
      while (i < dim) {
        val qi = a(i)
        var j = i
        while (j < dim) {
          // addExact: past the documented ~9·10¹⁰-row headroom the sums must
          // FAIL LOUDLY (ArithmeticException), not wrap silently — same
          // contract as requireIdHeadroom elsewhere. The per-term product
          // qi*a(j) ≤ 10¹⁰ cannot itself overflow (grid bound above).
          buf(idx) = Math.addExact(buf(idx), qi * a(j))
          idx += 1
          j += 1
        }
        i += 1
      }
      buf
    }

    override def merge(a: Array[Long], b: Array[Long]): Array[Long] = {
      var i = 0
      while (i < a.length) { a(i) = Math.addExact(a(i), b(i)); i += 1 }
      a
    }

    override def finish(buf: Array[Long]): Array[Long] = buf

    override def bufferEncoder: Encoder[Array[Long]] = ExpressionEncoder[Array[Long]]()
    override def outputEncoder: Encoder[Array[Long]] = bufferEncoder
  }

  /** Principal components of the uncentered quantized second-moment matrix
    * `M = G / n / 10⁸` (the 10⁸ un-scales the two 10⁴ quantizations):
    * power iteration with Hotelling deflation, fixed iteration count —
    * deterministic given the integer gram, no convergence test (a test
    * would make the op count data-dependent and break replays).
    *
    * @return (component vector, eigenvalue) pairs, strongest first.
    */
  def topComponents(gramBuf: Array[Long], dim: Int, k: Int = 2,
                    iters: Int = 40): Seq[(Array[Double], Double)] = {
    val n = gramBuf(0)
    require(n > 0, "empty embedding table")
    val nd = n.toDouble
    val m = Array.ofDim[Double](dim, dim)
    var idx = 1
    var i = 0
    while (i < dim) {
      var j = i
      while (j < dim) {
        val v = gramBuf(idx).toDouble / nd / 1e8
        m(i)(j) = v
        m(j)(i) = v
        idx += 1
        j += 1
      }
      i += 1
    }

    val out = Seq.newBuilder[(Array[Double], Double)]
    var c = 0
    while (c < k) {
      val (v, lam) = powerIterate(m, iters)
      out += ((v, lam))
      // Hotelling deflation: M ← M − λ·v·vᵀ, elementwise fixed order
      var ii = 0
      while (ii < dim) {
        var jj = 0
        while (jj < dim) {
          m(ii)(jj) = m(ii)(jj) - lam * v(ii) * v(jj)
          jj += 1
        }
        ii += 1
      }
      c += 1
    }
    out.result()
  }

  /** Fixed-count power iteration from the uniform start `1/√d` (never
    * orthogonal to a PSD Gram's top eigenvector unless the data is exactly
    * mean-free in every coordinate — not a real corpus). All reductions
    * ascending-index sequential.
    */
  private def powerIterate(m: Array[Array[Double]], iters: Int): (Array[Double], Double) = {
    val dim = m.length
    var v = Array.fill(dim)(1.0 / math.sqrt(dim.toDouble))
    var t = 0
    while (t < iters) {
      val u = matvec(m, v)
      var s = 0.0
      var i = 0
      while (i < dim) { s += u(i) * u(i); i += 1 }
      val nrm = math.sqrt(s)
      i = 0
      while (i < dim) { u(i) = u(i) / nrm; i += 1 }
      v = u
      t += 1
    }
    val w = matvec(m, v)
    var lam = 0.0
    var i = 0
    while (i < dim) { lam += v(i) * w(i); i += 1 }
    (v, lam)
  }

  private def matvec(m: Array[Array[Double]], v: Array[Double]): Array[Double] = {
    val dim = m.length
    val u = new Array[Double](dim)
    var i = 0
    while (i < dim) {
      val row = m(i)
      var s = 0.0
      var j = 0
      while (j < dim) { s += row(j) * v(j); j += 1 }
      u(i) = s
      i += 1
    }
    u
  }

  /** Projection of the quantized vector onto a component, as a column:
    * `Σ (qᵢ/10⁴)·vᵢ`, ascending-index left fold (`aggregate` folds in array
    * order) — the exact expression the oracle's `list_sum` replays.
    */
  def project(q: Column, component: Array[Double]): Column = {
    val comp = array(component.map(lit): _*)
    aggregate(
      zip_with(q, comp, (qi, vi) => qi.cast("double") / lit(Scale) * vi),
      lit(0.0), (acc, x) => acc + x)
  }

  /** End-to-end: quantize → one-pass gram → driver eigensolve → project.
    * Output: (idCols*, p1..pk, lam1..lamk) with projections and eigenvalues
    * rounded to 6 dp.
    */
  def projectTopK(embeddings: DataFrame, embCol: String, dim: Int, k: Int = 2,
                  iters: Int = 40, idCols: Seq[String] = Seq("vec_id", "label")): DataFrame = {
    val spark = embeddings.sparkSession
    import spark.implicits._
    val q = embeddings.withColumn("q", quantize(col(embCol)))
    val buf = q.select(col("q")).as[Seq[Long]]
      .select(GramAggregator(dim).toColumn.name("g"))
      .head()
    val comps = topComponents(buf, dim, k, iters)
    val projCols = comps.zipWithIndex.map { case ((v, _), i) =>
      round(project(col("q"), v), 6).as(s"p${i + 1}")
    }
    val lamCols = comps.zipWithIndex.map { case ((_, lam), i) =>
      round(lit(lam), 6).as(s"lam${i + 1}")
    }
    q.select(idCols.map(col) ++ projCols ++ lamCols: _*)
  }
}
