package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** TopKAggregator correctness across the reduce AND merge paths: many
  * partitions force partial buffers to merge, and the result must equal
  * the brute-force sort on the (value DESC, id ASC) total order.
  */
class TopKSpec extends SparkSpec {

  test("aggregated top-k equals brute-force sort across forced merges") {
    import spark.implicits._
    val rnd = new scala.util.Random(5)
    val rows = Seq.fill(2000)((s"g${rnd.nextInt(4)}", rnd.nextInt(50).toDouble, rnd.nextLong().abs))
    val expected = rows.groupBy(_._1).view.mapValues(
      _.map(r => (r._2, r._3))
        .sortBy { case (v, id) => (-v, id) }.take(5).toVector).toMap

    val got = rows.toDF("g", "value", "id").repartition(13)
      .as[(String, Double, Long)]
      .groupByKey(_._1).mapValues(r => (r._2, r._3))
      .agg(TopKAggregator(5).toColumn.name("topk"))
      .collect().toMap
    assert(got === expected)
  }

  test("duplicate values break ties by id — result is deterministic") {
    import spark.implicits._
    val rows = Seq(("g", 1.0, 9L), ("g", 1.0, 3L), ("g", 1.0, 7L), ("g", 2.0, 5L))
    val got = rows.toDF("g", "value", "id").repartition(3)
      .as[(String, Double, Long)]
      .groupByKey(_._1).mapValues(r => (r._2, r._3))
      .agg(TopKAggregator(2).toColumn.name("topk"))
      .collect().head._2
    assert(got === Vector((2.0, 5L), (1.0, 3L)))
  }

  test("BottomKDistinctAggregator keeps the k smallest DISTINCT values across merges") {
    import spark.implicits._
    val rnd = new scala.util.Random(11)
    // heavy duplication: 3000 draws over only 120 distinct values
    val rows = Seq.fill(3000)((s"g${rnd.nextInt(3)}", rnd.nextInt(120).toLong * 7919L))
    val expected = rows.groupBy(_._1).view.mapValues(
      _.map(_._2).distinct.sorted.take(10).toVector).toMap
    val got = rows.toDF("g", "h").repartition(17)
      .as[(String, Long)]
      .groupByKey(_._1).mapValues(_._2)
      .agg(BottomKDistinctAggregator(10).toColumn.name("bk"))
      .collect().toMap
    assert(got === expected)
    got.values.foreach(v => assert(v == v.distinct.sorted && v.length <= 10))
  }

  test("BottomKDistinct reduce dedups and respects the bound") {
    val a = BottomKDistinctAggregator(3)
    val buf = Seq(5L, 2L, 5L, 9L, 1L, 2L, 7L).foldLeft(a.zero)(a.reduce)
    assert(buf === Vector(1L, 2L, 5L))
    assert(a.merge(buf, Vector(0L, 1L, 4L)) === Vector(0L, 1L, 2L))
  }

  test("q14 plans as a partial+final object aggregate (map-side combine)") {
    val df = graft.queries.Registry.queries("q14_topk_per_group")(spark, "/root/testdata/sf0.001")
    val p = df.queryExecution.sparkPlan.toString
    assert("ObjectHashAggregate|SortAggregate".r.findAllIn(p).size >= 2,
      "typed aggregator must run partial (map-side) + final, shipping <= k pairs per group")
  }
}
