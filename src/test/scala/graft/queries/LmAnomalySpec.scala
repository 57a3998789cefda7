package graft.queries

import graft.SparkSpec

/** Round-14 extension rows: the bigram-LM in-domain filter and the
  * median/MAD robust anomaly detector — structural invariants at sf0.001
  * plus a from-scratch local replay of the MAD pipeline for one symbol.
  */
class LmAnomalySpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  test("llm_bigram_lm_filter: train source has zero OOV and keeps its docs") {
    val rows = Registry.queries("llm_bigram_lm_filter")(spark, dir)
      .collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2), r.getLong(4)))
      .toMap
    val (nDocs, nKept, sumOov) = rows("src0")
    // every train bigram is in the model: Laplace floor never fires
    assert(sumOov == 0, "train slice must have no OOV bigrams")
    // at the sf0.001 scale the 25-doc model is sparse enough that a couple
    // of train docs graze the threshold; in-domain must still dominate
    assert(nKept * 5 >= nDocs * 4, s"in-domain mostly kept: $nKept of $nDocs")
    // the filter must actually reject something somewhere
    val dropped = rows.values.map { case (d, k, _) => d - k }.sum
    assert(dropped > 0, "out-of-domain docs must be filtered")
    // and OOV mass exists outside the train slice
    assert(rows.exists { case (s, (_, _, oov)) => s != "src0" && oov > 0 })
  }

  test("w17_anomaly_mad: matches a from-scratch local replay per symbol") {
    val got = Registry.queries("w17_anomaly_mad")(spark, dir)
      .collect()
      .map(r => r.getString(0) ->
        (r.getLong(1), r.getDouble(2), r.getDouble(3), r.getLong(4)))
      .toMap
    val ticks = graft.core.Tables.ticks(spark, dir)
      .select("symbol", "price", "seq").collect()
      .map(r => (r.getString(0), r.getDouble(1), r.getLong(2)))
    def medianAtCeilRank(xs: Seq[Double]): Double = {
      val sorted = xs.sorted
      sorted((math.ceil(sorted.size * 0.5) - 1).toInt)
    }
    ticks.groupBy(_._1).foreach { case (sym, rows) =>
      val prices = rows.map(_._2).toSeq
      val med = medianAtCeilRank(prices)
      val mad = medianAtCeilRank(prices.map(p => math.abs(p - med)))
      val nOut = prices.count(p => math.abs(p - med) > 4.4478 * mad)
      val (n, gMed, gMad, gOut) = got(sym)
      assert(n == rows.length, s"$sym n_ticks")
      assert(gMed == med, s"$sym median")
      assert(gMad == mad, s"$sym mad")
      assert(gOut == nOut, s"$sym outlier count")
    }
    assert(got.values.map(_._4).sum > 0, "corpus must show some outliers")
  }
}
