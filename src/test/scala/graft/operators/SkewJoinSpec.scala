package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Salted join: result equality with the plain join under heavy skew, and
  * the plan actually shuffles on (key, salt).
  */
class SkewJoinSpec extends SparkSpec {

  test("salted inner join equals the plain join on heavily skewed keys") {
    val session = spark
    import session.implicits._
    val rnd = new scala.util.Random(23)
    // 90% of rows share one hot key
    val big = Seq.tabulate(2000) { i =>
      val k = if (rnd.nextInt(10) < 9) "HOT" else s"k${rnd.nextInt(20)}"
      (k, i.toLong, rnd.nextDouble())
    }.toDF("key", "seq", "value")
    val small = (Seq("HOT") ++ (0 until 20).map(i => s"k$i"))
      .zipWithIndex.map { case (k, i) => (k, i * 10.0) }.toDF("key", "weight")

    val plain = big.join(small, Seq("key"))
    val salted = SkewJoin.saltedInner(big, small, "key", salts = 8)
    val cols = plain.columns.sorted.map(c => col(s"`$c`")).toSeq
    assert(salted.count() == plain.count())
    assert(plain.select(cols: _*).except(salted.select(cols: _*)).count() == 0)
    assert(salted.select(cols: _*).except(plain.select(cols: _*)).count() == 0)
  }

  test("the shuffle runs on (key, salt), spreading a hot key over reducers") {
    val session = spark
    import session.implicits._
    val big = Seq.tabulate(100)(i => ("HOT", i.toLong)).toDF("key", "seq")
    val small = Seq(("HOT", 1.0)).toDF("key", "weight")
    // salting targets the too-big-to-broadcast regime; turn broadcast off so
    // the plan shows the shuffle it reshapes
    val prior = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    val ep =
      try {
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        SkewJoin.saltedInner(big, small, "key", salts = 4)
          .queryExecution.executedPlan.toString
      } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prior)
    assert(ep.contains("hashpartitioning(key") && ep.contains("__salt"),
      s"expected a (key, __salt) shuffle, got:\n$ep")
    // distinct salts actually occur (the hot key is spread, not all-one-salt)
    val salts = big.select(pmod(xxhash64(col("seq")), lit(4L)).cast("int").as("s"))
      .distinct().collect().map(_.getInt(0)).toSet
    assert(salts.size > 1, "xxhash64 salting must spread rows across sub-keys")
  }
}
