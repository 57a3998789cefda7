package graft.functions

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** The native [[DotProduct]] expression: bit-equivalence with the
  * higher-order form it replaced (the DuckDB oracles hang on that), the
  * zip_with-mirroring null semantics, and the codegen contract — the whole
  * point of a native expression over a kernel is that it fuses into the
  * surrounding whole-stage-codegen span.
  */
class VectorExprsSpec extends SparkSpec {

  /** The exact higher-order form DotProduct replaced in Similarity.dot. */
  private def hoDot(a: org.apache.spark.sql.Column, b: org.apache.spark.sql.Column) =
    aggregate(zip_with(a, b, (x, y) => x.cast("double") * y.cast("double")),
      lit(0.0), (acc, v) => acc + v)

  test("bit-identical to the higher-order fold on float and double arrays") {
    val session = spark
    import session.implicits._
    val rnd = new scala.util.Random(7)
    val rows = Seq.tabulate(64) { i =>
      (i.toLong, Array.fill(48)(rnd.nextFloat() * 2 - 1), Array.fill(48)(rnd.nextDouble() * 2 - 1))
    }
    val df = rows.toDF("id", "fa", "da")
      .withColumn("fb", reverse(col("fa")))
      .withColumn("db", reverse(col("da")))
    val out = df.select(
      VectorExprs.dotProduct(col("fa"), col("fb")).as("nf"),
      hoDot(col("fa"), col("fb")).as("hf"),
      VectorExprs.dotProduct(col("da"), col("db")).as("nd"),
      hoDot(col("da"), col("db")).as("hd"),
      // mixed element types widen like the cast chain did
      VectorExprs.dotProduct(col("fa"), col("db")).as("nm"),
      hoDot(col("fa"), col("db")).as("hm")).collect()
    out.foreach { r =>
      // == not approx: the contract is identical double bits, not closeness
      assert(r.getDouble(0) == r.getDouble(1), "float path diverged")
      assert(r.getDouble(2) == r.getDouble(3), "double path diverged")
      assert(r.getDouble(4) == r.getDouble(5), "mixed path diverged")
    }
  }

  test("null semantics mirror zip_with: mismatch, null element, null array") {
    val session = spark
    import session.implicits._
    val df = Seq(
      (1L, Seq[java.lang.Double](1.0, 2.0), Seq[java.lang.Double](3.0)), // length mismatch
      (2L, Seq[java.lang.Double](1.0, null), Seq[java.lang.Double](3.0, 4.0)), // null element
      (3L, null, Seq[java.lang.Double](3.0, 4.0)), // null array
      (4L, Seq[java.lang.Double](1.0, 2.0), Seq[java.lang.Double](3.0, 4.0))
    ).toDF("id", "a", "b")
    val got = df.select(col("id"),
        VectorExprs.dotProduct(col("a"), col("b")).as("n"),
        hoDot(col("a"), col("b")).as("h"))
      .orderBy("id").collect()
    got.foreach { r =>
      assert(r.isNullAt(1) == r.isNullAt(2), s"null-ness diverged on id ${r.getLong(0)}")
      if (!r.isNullAt(1)) assert(r.getDouble(1) == r.getDouble(2))
    }
    assert(got.take(3).forall(_.isNullAt(1)) && !got(3).isNullAt(1))
  }

  test("sign buckets are bit-identical to the lshBucket expression spec") {
    val session = spark
    import session.implicits._
    val rnd = new scala.util.Random(11)
    val floats = Seq.tabulate(40)(i => (i.toLong, Array.fill(24)(rnd.nextFloat() * 2 - 1)))
    val doubles = Seq.tabulate(40)(i => (i.toLong, Array.fill(24)(rnd.nextDouble() * 2 - 1)))
    val bits = 8
    val tables = 3
    def check(df: org.apache.spark.sql.DataFrame): Unit = {
      val rows = df.select(col("id"),
          VectorExprs.signBuckets(col("embedding"), bits, tables).as("native"),
          array((0 until tables).map(t =>
            Similarity.lshBucket(col("embedding"), bits, seed = t)): _*).as("spec"))
        .collect()
      rows.foreach { r =>
        assert(r.getSeq[Long](1) == r.getSeq[Long](2),
          s"bucket divergence for id ${r.getLong(0)}")
      }
    }
    check(floats.toDF("id", "embedding"))
    check(doubles.toDF("id", "embedding"))
  }

  test("sign buckets null semantics: null array -> null; null element drops its bits") {
    val session = spark
    import session.implicits._
    val df = Seq(
      (1L, Seq[java.lang.Double](0.5, -0.25, 1.0)),
      (2L, Seq[java.lang.Double](0.5, null, 1.0)),
      (3L, null)
    ).toDF("id", "embedding")
    val got = df.select(col("id"),
        VectorExprs.signBuckets(col("embedding"), 6, 2).as("native"),
        array((0 until 2).map(t =>
          Similarity.lshBucket(col("embedding"), 6, seed = t)): _*).as("spec"))
      .orderBy("id").collect()
    // row 2: every projection touches the null element -> all signs unset
    assert(got(1).getSeq[Long](1) == Seq(0L, 0L))
    assert(got(1).getSeq[Long](1) == got(1).getSeq[Long](2))
    assert(got(0).getSeq[Long](1) == got(0).getSeq[Long](2))
    assert(got(2).isNullAt(1))
  }

  test("sign buckets NaN/Inf semantics match the Column spec (NaN sets the bit)") {
    val session = spark
    import session.implicits._
    // Spark SQL's `>=` orders NaN above every double, so a NaN projection
    // sets its bit in the Column spec; the native kernel must agree.
    // Row 1: a NaN component -> every projection is NaN.
    // Row 2: +Inf and -Inf components -> projections are +/-Inf or NaN
    //        (Inf - Inf) depending on the random plane signs.
    // Row 3: -0.0 components -> projection is -0.0 or +0.0; `>= 0` holds.
    val df = Seq(
      (1L, Seq(0.5, Double.NaN, 1.0)),
      (2L, Seq(Double.PositiveInfinity, Double.NegativeInfinity, 0.25)),
      (3L, Seq(-0.0, -0.0, -0.0))
    ).toDF("id", "embedding")
    val got = df.select(col("id"),
        VectorExprs.signBuckets(col("embedding"), 6, 3).as("native"),
        array((0 until 3).map(t =>
          Similarity.lshBucket(col("embedding"), 6, seed = t)): _*).as("spec"))
      .orderBy("id").collect()
    got.foreach { r =>
      assert(r.getSeq[Long](1) == r.getSeq[Long](2),
        s"NaN/Inf bucket divergence for id ${r.getLong(0)}")
    }
    // all-NaN projections -> every bit set, matching Spark's NaN >= 0 = true
    assert(got(0).getSeq[Long](1).forall(_ == (1L << 6) - 1))
  }

  test("l2sq is bit-identical to the higher-order squared-distance fold") {
    val session = spark
    import session.implicits._
    val rnd = new scala.util.Random(13)
    val df = Seq.tabulate(48)(i => (i.toLong, Array.fill(32)(rnd.nextFloat() * 2 - 1)))
      .toDF("id", "a").withColumn("b", reverse(col("a")))
    val ho = aggregate(zip_with(col("a"), col("b"),
        (x, y) => (x.cast("double") - y.cast("double")) * (x.cast("double") - y.cast("double"))),
      lit(0.0), (acc, v) => acc + v)
    df.select(VectorExprs.l2Sq(col("a"), col("b")).as("n"), ho.as("h")).collect()
      .foreach(r => assert(r.getDouble(0) == r.getDouble(1)))
  }

  test("simhash64 native is bit-identical to the expression spec, incl null tokens") {
    val session = spark
    import session.implicits._
    val rnd = new scala.util.Random(17)
    val words = Array("alpha", "beta", "gamma", "delta", "epsilon", "zeta", "eta", "theta")
    val docs = Seq.tabulate(60) { i =>
      (i.toLong, Seq.fill(3 + rnd.nextInt(40))(words(rnd.nextInt(words.length))))
    }
    val withEdge = docs ++ Seq(
      (100L, Seq.empty[String]), // empty token array
      (101L, null) // null array
    )
    val df = withEdge.toDF("id", "toks")
    val got = df.select(col("id"),
        VectorExprs.simHash64(col("toks")).as("native"),
        SimHash.simhash64(col("toks")).as("spec"))
      .collect()
    got.foreach { r =>
      assert(r.isNullAt(1) == r.isNullAt(2), s"null-ness diverged on id ${r.getLong(0)}")
      if (!r.isNullAt(1))
        assert(r.getLong(1) == r.getLong(2), s"sketch diverged on id ${r.getLong(0)}")
    }
    // a null TOKEN hashes like xxhash64(NULL) = the seed — both forms agree
    val withNullTok = spark.range(1)
      .select(array(lit("alpha"), lit(null).cast("string"), lit("beta")).as("toks"))
    val r = withNullTok.select(VectorExprs.simHash64(col("toks")).as("n"),
      SimHash.simhash64(col("toks")).as("s")).collect()(0)
    assert(r.getLong(0) == r.getLong(1))
  }

  test("sortedIntersectCount == size(array_intersect) on random sorted sets") {
    val session = spark
    import session.implicits._
    val rnd = new scala.util.Random(7)
    val rows = (0 until 200).map { i =>
      def mk(): Array[Long] =
        (0 until rnd.nextInt(40)).map(_ => rnd.nextInt(60).toLong).distinct.sorted.toArray
      (i.toLong, mk(), mk())
    }
    val df = rows.toDF("id", "a", "b")
    val got = df.select(col("id"),
        VectorExprs.sortedIntersectCount(col("a"), col("b")).as("k"),
        size(array_intersect(col("a"), col("b"))).as("ref"),
        (VectorExprs.sortedIntersectCount(col("a"), col("b")).cast("double") /
          (size(col("a")) + size(col("b")) - VectorExprs.sortedIntersectCount(col("a"), col("b")))).as("jac"),
        (size(array_intersect(col("a"), col("b"))).cast("double") /
          size(array_union(col("a"), col("b")))).as("jacRef"))
      .collect()
    got.foreach { r =>
      assert(r.getInt(1) == r.getInt(2), s"id ${r.getLong(0)}: merge ${r.getInt(1)} vs ref ${r.getInt(2)}")
      val (j, jr) = (r.isNullAt(3), r.isNullAt(4)) match {
        case (true, true) => (0.0, 0.0)
        case _ => (r.getDouble(3), r.getDouble(4))
      }
      assert(java.lang.Double.compare(j, jr) == 0 || (j.isNaN && jr.isNaN),
        s"id ${r.getLong(0)}: jaccard $j vs $jr")
    }
    // null array -> null, mirroring array_intersect
    val n = spark.range(1).select(VectorExprs.sortedIntersectCount(
      lit(null).cast("array<bigint>"), array(lit(1L))).as("k")).collect()(0)
    assert(n.isNullAt(0))
  }

  test("dot product runs inside WholeStageCodegen and is SQL-callable") {
    val session = spark
    import session.implicits._
    // a range source (not a literal LocalRelation, which the optimizer would
    // fold away entirely) so a genuine codegen stage surrounds the dot
    val df = spark.range(8)
      .select(col("id"), array(col("id").cast("double"), lit(2.0)).as("e"))
    val projected = df.select(VectorExprs.dotProduct(col("e"), col("e")).as("d"))
    val ep = projected.queryExecution.executedPlan.toString
    // `*(n)` is the WholeStageCodegen stage marker in the plan string — the
    // Project carrying graft_dot must sit inside a codegen span
    assert(ep.linesIterator.exists(l => l.contains("graft_dot") && l.trim.startsWith("*(")),
      s"dot must codegen, got:\n$ep")
    assert(projected.orderBy("d").collect()(0).getDouble(0) == 4.0) // 0*0 + 2*2
    // the registry route: usable from SQL text through the injected function
    df.createOrReplaceTempView("ve_t")
    val viaSql = spark.sql("SELECT graft_dot(e, e) AS d FROM ve_t WHERE id = 1")
      .collect()(0).getDouble(0)
    assert(viaSql == 5.0)
  }
}
