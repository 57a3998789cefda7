package graft.plans

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.operators.SuffixArray

/** Direct specs for the two order-index native nodes ([[GlobalIndexPlan]],
  * [[GlobalRankPlan]]): dense/monotone index values on a multi-partition
  * fixture, run-start rank parity with the DataFrame `groupBy(min)+join`
  * form, cross-partition run threading (duplicate keys far wider than a
  * partition), and the one-range-exchange plan shape — the property a
  * re-sampled-bounds regression or a second exchange would break.
  */
class GlobalIndexRankSpec extends SparkSpec {

  import SuffixArray.{rankBy, withGlobalIdx}

  /** Shuffled multi-partition fixture: key runs of wildly different length
    * (one key spans many partitions), plus a payload column to prove whole
    * rows survive the append.
    */
  private def fixture = {
    val session = spark
    import session.implicits._
    val rows = (1 to 997).map(i => (i % 7L, s"p$i")) ++
      Seq.fill(3000)((3L, "hot")) ++ (1 to 500).map(i => (100L + i % 3, s"q$i"))
    scala.util.Random.shuffle(rows).toDF("k", "payload").repartition(11)
  }

  test("withGlobalIdx: dense 0..n-1 index, monotone in the sort key") {
    val df = fixture
    val n = df.count()
    val got = withGlobalIdx(df, Seq("k")).orderBy("__idx")
      .select(col("__idx"), col("k")).collect()
    assert(got.length == n)
    assert(got.map(_.getLong(0)).toSeq == (0L until n).toSeq, "index must be dense 0..n-1")
    val keys = got.map(_.getLong(1))
    assert(keys.zip(keys.tail).forall { case (a, b) => a <= b },
      "index order must follow the sort key")
  }

  test("rankBy (segmented scan): exact parity with the groupBy(min)+join form") {
    val df = fixture.localCheckpoint(true) // one shared input for both paths
    val seg = rankBy(df, Seq("k")).select(col("k"), col("payload"), col("__rank"))
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2))).sorted.toSeq
    // baseline: the retired three-stage public-API form, built inline —
    // global index, then min(__idx) per key joined back
    val idx = withGlobalIdx(df, Seq("k"))
    val old = idx.join(
        idx.groupBy(col("k")).agg(min(col("__idx")).as("__rank")), "k")
      .select(col("k"), col("payload"), col("__rank"))
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2))).sorted.toSeq
    assert(seg == old, "segmented-scan ranks must equal the DataFrame form's")
    // run-start semantics directly: every key's rank = min global idx of
    // the key's run, ranks monotone in key order, one rank per key
    val byKey = seg.groupBy(_._1).view.mapValues(_.map(_._3).distinct).toMap
    assert(byKey.values.forall(_.size == 1), "equal keys must share one rank")
    val ordered = byKey.toSeq.sortBy(_._1).map(_._2.head)
    assert(ordered == ordered.sorted, "ranks must be monotone in key order")
  }

  test("rankBy threads a run across many partitions (hot key > partition size)") {
    val session = spark
    import session.implicits._
    // 5000 identical keys across 13 partitions below 2000 smaller + 2000
    // larger keys: the hot run's rank must be the global index where the
    // run STARTS, threaded across every partition it spans
    val df = scala.util.Random.shuffle(
        (1 to 2000).map(i => 1L) ++ Seq.fill(5000)(5L) ++ (1 to 2000).map(i => 9L))
      .toDF("k").repartition(13)
    val got = SuffixArray.rankBy(df, Seq("k"))
      .groupBy("k").agg(first("__rank").as("r"), countDistinct("__rank").as("nr"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).sortBy(_._1)
    assert(got.map(_._3).forall(_ == 1L))
    assert(got.map(t => (t._1, t._2)).toSeq == Seq((1L, 0L), (5L, 2000L), (9L, 7000L)))
  }

  test("plan shape: exactly ONE range exchange per call, native node present") {
    val df = fixture
    def ep(d: org.apache.spark.sql.DataFrame) = d.queryExecution.executedPlan.toString
    val epIdx = ep(withGlobalIdx(df, Seq("k")))
    assert(epIdx.contains("GlobalIndex"), s"native index node must plan:\n$epIdx")
    assert(epIdx.split('\n').count(_.contains("Exchange rangepartitioning")) == 1,
      s"one range exchange exactly:\n$epIdx")
    val epRank = ep(rankBy(df, Seq("k")))
    assert(epRank.contains("GlobalRank"), s"native rank node must plan:\n$epRank")
    assert(epRank.split('\n').count(_.contains("Exchange rangepartitioning")) == 1,
      s"one range exchange exactly:\n$epRank")
    assert(!epRank.contains("Exchange hashpartitioning"),
      s"the segmented scan must add NO hash exchange:\n$epRank")
  }

  test("SuffixArray.build plans through the native nodes (one range exchange on top)") {
    val session = spark
    import session.implicits._
    val docs = Seq((1L, "b a c a"), (2L, "a b a")).toDF("doc_id", "text")
    val out = SuffixArray.build(docs, capTokens = 4)
    val ep = out.queryExecution.executedPlan.toString
    assert(ep.contains("GlobalIndex"), s"final index append must be native:\n$ep")
    assert(ep.split('\n').count(_.contains("Exchange rangepartitioning")) == 1,
      s"one range exchange above the checkpointed rounds:\n$ep")
  }
}
