package graft.operators

import graft.SparkSpec

/** Large-star/small-star connected components vs a local union-find, on
  * shapes that stress the algorithm differently: a long path (tests
  * multi-round convergence — O(log n) rounds, not one min-propagation
  * hop), disjoint cliques (dedup's natural shape), and random graphs.
  */
class ConnectedComponentsSpec extends SparkSpec {
  import spark.implicits._

  private def localComponents(edges: Seq[(Long, Long)]): Map[Long, Long] = {
    val parent = scala.collection.mutable.Map.empty[Long, Long]
    def find(x: Long): Long = {
      var r = x
      while (parent.getOrElse(r, r) != r) r = parent(r)
      var c = x
      while (parent.getOrElse(c, c) != c) { val n = parent(c); parent(c) = r; c = n }
      r
    }
    edges.foreach { case (a, b) =>
      val (ra, rb) = (find(a), find(b))
      if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
    }
    val nodes = edges.flatMap(e => Seq(e._1, e._2)).distinct
    nodes.map(v => v -> find(v)).toMap
  }

  private def check(edges: Seq[(Long, Long)], label: String): Unit = {
    val got = ConnectedComponents.components(edges.toDF("a", "b"))
      .as[(Long, Long)].collect().toMap
    val want = localComponents(edges)
    assert(got == want, s"$label: $got vs $want")
  }

  test("long path converges to one min-rooted component") {
    check((0L until 63L).map(i => (i, i + 1)), "path")
  }

  test("rounds-to-fixpoint on the worst-case path is logarithmic, not linear") {
    // A 256-node path is the adversarial shape for star contraction: naive
    // min-propagation needs n rounds; large-star/small-star alternation is
    // O(log² n). The bound here (≤ 16 ≈ 2·log₂ 256) is what makes
    // cc_bench.json's `cc_rounds` meaningful at 100 TB — rounds, not
    // edges, govern the shuffle count.
    check((0L until 255L).map(i => (i, i + 1)), "path256")
    val r = ConnectedComponents.lastRounds
    assert(r >= 2 && r <= 16, s"path256 converged in $r rounds — expected O(log n)")
  }

  test("disjoint cliques keep separate min representatives") {
    val cliques = Seq(Seq(10L, 11L, 12L, 13L), Seq(40L, 41L), Seq(7L, 70L, 700L))
    val edges = cliques.flatMap(c => c.combinations(2).map(p => (p(0), p(1))))
    check(edges, "cliques")
  }

  test("random graphs match a local union-find") {
    val rnd = new scala.util.Random(11)
    for (trial <- 1 to 3) {
      val n = 60 + trial * 40
      val edges = (1 to n).map(_ =>
        (rnd.nextInt(80).toLong, rnd.nextInt(80).toLong)).filter(e => e._1 != e._2)
      check(edges, s"random$trial")
    }
  }

  test("reversed and duplicated edges do not change the answer") {
    val edges = Seq((5L, 1L), (1L, 5L), (5L, 1L), (2L, 5L), (9L, 8L))
    check(edges, "dup-edges")
  }

  test("fingerprints ride the checkpoint's observe channel, not extra jobs") {
    // the r17 fusion only saves its per-round pass when observedMetrics is
    // populated by the eager localCheckpoint action — pin that it fires on
    // every round (fallback count 0) so a Spark upgrade that breaks the
    // channel is caught here, not as a silent bench regression
    check((0L until 63L).map(i => (i, i + 1)), "path-observed")
    assert(ConnectedComponents.lastObservedFingerprints >= 2,
      s"observed=${ConnectedComponents.lastObservedFingerprints}")
    assert(ConnectedComponents.lastFallbackFingerprints == 0,
      s"fallback=${ConnectedComponents.lastFallbackFingerprints} — observe channel dead")
  }
}
