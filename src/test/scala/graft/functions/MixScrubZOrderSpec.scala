package graft.functions

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Micro-fixture checks for the round-9 curation additions: integer sqrt,
  * temperature-weighted source mixing, scrub/redaction rules, and the
  * Z-order interleave + locality guarantee.
  */
class MixScrubZOrderSpec extends SparkSpec {

  import spark.implicits._

  test("isqrt is exact across perfect-square boundaries") {
    val rows = Seq(0L, 1L, 2L, 3L, 4L, 15L, 16L, 17L, 99L, 100L, 101L,
      (1L << 31) - 1, 1L << 40).toDF("n")
    val out = rows.select(col("n"), CorpusOps.isqrt(col("n")).as("s")).collect()
    out.foreach { r =>
      val (n, s) = (r.getLong(0), r.getLong(1))
      val expect = math.sqrt(n.toDouble).toLong match {
        case g if g * g > n => g - 1
        case g if (g + 1) * (g + 1) <= n => g + 1
        case g => g
      }
      assert(s === expect, s"isqrt($n)")
      assert(s * s <= n && (s + 1) * (s + 1) > n, s"isqrt($n) invariant")
    }
  }

  test("isqrt near Long.MaxValue: +1 correction must not overflow") {
    // 3037000499 is the largest long whose square fits; its square is
    // 9223372030926249001 and (3037000499+1)^2 wraps negative — the
    // unguarded form would wrongly return s0+1 (or throw under ANSI).
    val big = 3037000499L * 3037000499L
    val rows = Seq(big - 1, big, big + 1, Long.MaxValue - 1, Long.MaxValue).toDF("n")
    val out = rows.select(col("n"), CorpusOps.isqrt(col("n")).as("s"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(out(big - 1) === 3037000498L)
    assert(out(big) === 3037000499L)
    assert(out(big + 1) === 3037000499L)
    assert(out(Long.MaxValue - 1) === 3037000499L)
    assert(out(Long.MaxValue) === 3037000499L)
  }

  test("sourceMixTargets: sqrt weighting upweights small sources") {
    // 100 vs 400 docs: weights 10 vs 20 (1:2), raw counts 1:4 — the small
    // source gets 2× its proportional share.
    val docs = ((0L until 100L).map(i => (i, "a")) ++ (100L until 500L).map(i => (i, "b")))
      .toDF("doc_id", "source")
    val t = CorpusOps.sourceMixTargets(docs, budgetDiv = 5L) // B = 100
      .select("source", "n_docs", "wgt", "k_target")
      .collect().map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
    assert(t("a") === ((100L, 10L, 33L))) // 100*10/30
    assert(t("b") === ((400L, 20L, 66L)))
  }

  test("sourceMixSample keeps exactly the k smallest sample keys per source") {
    val docs = (0L until 50L).map(i => (i, s"doc $i", if (i < 25) "a" else "b"))
      .toDF("doc_id", "text", "source")
    val targets = CorpusOps.sourceMixTargets(docs, budgetDiv = 5L) // B = 10
    val kept = CorpusOps.sourceMixSample(docs, targets)
    val ks = targets.select("source", "k_target").as[(String, Long)].collect().toMap
    val keyOf = docs.select(col("source"), col("doc_id"),
      CorpusOps.sampleKey(col("doc_id")).as("k"))
      .as[(String, Long, Long)].collect()
    val expect = keyOf.groupBy(_._1).toSeq.flatMap { case (src, rows) =>
      rows.sortBy(r => (r._3, r._2)).take(ks(src).toInt).map(_._2).toSeq
    }.toSet
    assert(kept.select("doc_id").as[Long].collect().toSet === expect)
    assert(kept.count() === ks.values.sum)
  }

  test("scrub rules count and redact PII + blocklist terms") {
    val docs = Seq(
      (0L, "contact bob.smith+x@corp.example.com or 555-123-4567 now", "a"),
      (1L, "a slow query on a big table", "a"),
      (2L, "slowly bigger tokens must not match", "a"))
      .toDF("doc_id", "text", "source")
    val out = docs.select(
      col("doc_id"),
      CorpusOps.scrubHits(col("text"), CorpusOps.ScrubRules(0)._2).as("em"),
      CorpusOps.scrubHits(col("text"), CorpusOps.ScrubRules(1)._2).as("ph"),
      CorpusOps.scrubHits(col("text"), CorpusOps.ScrubRules(2)._2).as("bl"),
      CorpusOps.scrubbed(col("text")).as("red"))
      .collect().map(r => r.getLong(0) -> r).toMap
    assert(out(0L).getInt(1) === 1 && out(0L).getInt(2) === 1 && out(0L).getInt(3) === 0)
    assert(out(0L).getString(4) === "contact [REDACTED] or [REDACTED] now")
    assert(out(1L).getInt(3) === 2)
    assert(out(1L).getString(4) === "a [REDACTED] query on a [REDACTED] table")
    // \b word boundaries: substrings of longer words never match
    assert(out(2L).getInt(3) === 0 && out(2L).getString(4) === docs.collect()(2).getString(1))
  }

  test("zValue interleaves bits (known vectors) and matches its SQL replay") {
    // x=0b101=5, y=0b011=3 at 3 bits → z = 1·1 + 1·8 + 1·2 + 1·16 = 27
    val df = Seq((5L, 3L), (0L, 0L), (255L, 0L), (0L, 255L), (255L, 255L), (170L, 85L))
      .toDF("x", "y")
    val got = df.select(ZOrder.zValue(col("x"), col("y"), 8).as("z"))
      .as[Long].collect().toSeq
    def ref(x: Long, y: Long): Long =
      (0 until 8).map(i => (((x >> i) & 1L) << (2 * i)) | (((y >> i) & 1L) << (2 * i + 1))).sum
    val expect = Seq((5L, 3L), (0L, 0L), (255L, 0L), (0L, 255L), (255L, 255L), (170L, 85L))
      .map { case (x, y) => ref(x, y) }
    assert(got === expect)
    assert(got.head === 27L)
    // SQL replay (the oracle string targets DuckDB's `//` int-div; Spark
    // SQL spells it `div` — semantics identical for the non-negative args)
    df.createOrReplaceTempView("zin")
    val sparkSql = ZOrder.zValueSql("x", "y", 8).replace("//", "div")
    val sqlGot = spark.sql(s"SELECT $sparkSql AS z FROM zin")
      .as[Long].collect().toSeq
    assert(sqlGot === expect)
  }

  test("z-prefix buckets confine both dimensions — the data-skipping bound") {
    // All 256×256 points: every z div 256 bucket must span ≤ 16 in x AND y.
    val pts = spark.range(0L, 256L * 256L)
      .select((col("id") % 256).as("x"), (col("id") / 256).cast("long").as("y"))
    val spans = pts
      .withColumn("z", ZOrder.zValue(col("x"), col("y"), 8))
      .withColumn("file_id", expr("z div 256L"))
      .groupBy("file_id")
      .agg((max("x") - min("x")).as("sx"), (max("y") - min("y")).as("sy"),
        count(lit(1)).as("n"))
      .agg(max("sx"), max("sy"), min("n"), max("n"), count(lit(1)))
      .head()
    assert(spans.getLong(0) === 15L, "x span")
    assert(spans.getLong(1) === 15L, "y span")
    assert(spans.getLong(2) === 256L && spans.getLong(3) === 256L, "uniform files")
    assert(spans.getLong(4) === 256L, "file count")
  }
}
