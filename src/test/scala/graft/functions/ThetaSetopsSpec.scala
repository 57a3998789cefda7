package graft.functions

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.operators.BottomKDistinctAggregator

/** Properties of the theta-sketch set-operation estimator behind
  * `sk_theta_setops`: under-full exactness and full-sketch error bounds,
  * on deterministic key sets with known overlap.
  */
class ThetaSetopsSpec extends SparkSpec {

  import spark.implicits._

  private val K = 64
  private val M61 = Sketches.M61

  /** Build the bottom-K distinct sketch of a key set and return
    * (sortedHashes, theta).
    */
  private def sketch(keys: Seq[Long]): (Vector[Long], Long) = {
    val bk = keys.toDF("k")
      .select(Sketches.hash61(col("k"), Sketches.KmvParams._1, Sketches.KmvParams._2).as("h"))
      .as[Long].groupByKey(_ => 0).mapValues(identity)
      .agg(BottomKDistinctAggregator(K).toColumn.name("bk"))
      .collect().head._2
    (bk, if (bk.length < K) M61 else bk(K - 1))
  }

  private def estimates(a: Seq[Long], b: Seq[Long]): (Long, Long) = {
    val (bka, ta) = sketch(a)
    val (bkb, tb) = sketch(b)
    val theta = math.min(ta, tb)
    val unionRet = (bka ++ bkb).distinct.count(_ < theta)
    val interRet = bka.toSet.intersect(bkb.toSet).count(_ < theta)
    def est(ret: Int): Long =
      math.round(M61.toDouble * ret.toDouble / theta.toDouble)
    (est(unionRet), est(interRet))
  }

  test("under-full sketches are exact: theta = M61, est = true cardinality") {
    val a = (0L until 40L)
    val b = (20L until 50L)
    val (u, i) = estimates(a, b)
    assert(u === 50L) // |A ∪ B|
    assert(i === 20L) // |A ∩ B|
  }

  test("full sketches estimate union and intersection within 3/sqrt(k)") {
    // |A| = 4000, |B| = 3000, overlap 2000 → union 5000, intersection 2000
    val a = (0L until 4000L)
    val b = (2000L until 5000L)
    val (u, i) = estimates(a, b)
    val bound = 3.0 / math.sqrt(K.toDouble) // ~37.5% at k=64
    assert(math.abs(u - 5000.0) / 5000.0 < bound, s"union est $u")
    assert(math.abs(i - 2000.0) / 2000.0 < bound * 2, s"intersection est $i")
  }

  test("disjoint sets estimate zero intersection") {
    val (u, i) = estimates(0L until 3000L, 100000L until 103000L)
    assert(i === 0L)
    assert(u > 3000L) // union of two 3000-sets, crude floor
  }
}
