package graft.functions

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Two-phase exact rank selection vs the naive per-group global sort:
  * identical kept sets on data engineered to stress the boundary bucket
  * (score ties, a group smaller than the denominator, a group where one
  * bucket holds most rows).
  */
class RankSelectSpec extends SparkSpec {

  test("dropBottomExact equals the naive row_number filter, ties included") {
    val session = spark
    import session.implicits._
    // deterministic scores with heavy ties: g0 has 17 rows where many share
    // buckets AND exact scores; g1 has 3 rows (< den=4, k=0 → keep all);
    // g2 concentrates 9 of 10 rows in one bucket (boundary = hot bucket)
    val rows =
      (0 until 17).map(i => ("g0", i.toLong, (i % 5) / 10.0)) ++
      (0 until 3).map(i => ("g1", i.toLong, i / 10.0)) ++
      (0 until 10).map(i => ("g2", i.toLong, if (i == 0) 0.9 else 0.4242))
    val df = rows.toDF("lang", "doc_id", "q")

    val got = RankSelect.dropBottomExact(df, Seq("lang"), "q", "doc_id")
      .select("lang", "doc_id").as[(String, Long)].collect().toSet

    val w = Window.partitionBy("lang").orderBy(col("q"), col("doc_id"))
    val n = Window.partitionBy("lang")
    val expected = df.withColumn("rn", row_number().over(w))
      .withColumn("n", count(lit(1)).over(n))
      .filter(col("rn") > expr("n div 4"))
      .select("lang", "doc_id").as[(String, Long)].collect().toSet

    assert(got == expected)
    // sanity: g0 dropped exactly 4 of 17, g1 kept all 3, g2 dropped 2 of 10
    assert(got.count(_._1 == "g0") == 13)
    assert(got.count(_._1 == "g1") == 3)
    assert(got.count(_._1 == "g2") == 8)
  }

  test("selectCeilHalf equals the naive ceil-rank median, ties and negatives") {
    val session = spark
    import session.implicits._
    // g0: 17 rows with heavy exact-value ties (in-bucket tie-break matters);
    // g1: 1 row (k = 1 = the row itself); g2: even count (k = n/2, the
    // lower middle); g3: negative values (floor-bucket monotonicity below 0)
    val rows =
      (0 until 17).map(i => ("g0", i.toLong, (i % 5) / 10.0)) ++
      Seq(("g1", 0L, 0.7)) ++
      (0 until 10).map(i => ("g2", i.toLong, if (i == 0) 0.9 else 0.4242)) ++
      (0 until 5).map(i => ("g3", i.toLong, -1.3 + i * 0.011))
    val df = rows.toDF("lang", "doc_id", "q")

    val got = RankSelect.selectCeilHalf(df, Seq("lang"), "q", "doc_id",
        floor(col("q") * 100), "med")
      .as[(String, Double)].collect().toMap

    val w = Window.partitionBy("lang").orderBy(col("q"), col("doc_id"))
    val n = Window.partitionBy("lang")
    val expected = df.withColumn("rn", row_number().over(w))
      .withColumn("n", count(lit(1)).over(n))
      .filter(col("rn") === ceil(col("n") * lit(0.5)))
      .select(col("lang"), col("q")).as[(String, Double)].collect().toMap

    assert(got == expected)
    assert(got.keySet == Set("g0", "g1", "g2", "g3"))
  }
}
