package graft.streaming

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.functions.TextOps

/** Streaming corpus funnel: dedup state carries ACROSS micro-batches, the
  * quality gate drops junk, and the surviving content set equals the batch
  * funnel's.
  */
class StreamingCorpusSpec extends SparkSpec {

  test("cross-batch dedup state: a duplicate arriving later is dropped") {
    val session = spark
    import session.implicits._
    implicit val ctx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val good = "the quick brown fox jumps over the lazy dog again and again"
    val other = "a completely different sentence about the weather in the mountains today"
    val junk = "!!!" // fails the quality gate (too few tokens, no letters)
    val in = MemoryStream[(Long, String)]
    val name = s"corpus_spec_${System.nanoTime}"
    val q = StreamingCorpus.dedupExactStream(in.toDF().toDF("doc_id", "text"))
      .writeStream.format("memory").queryName(name).outputMode("append").start()
    try {
      in.addData(Seq((1L, good), (2L, junk)))
      q.processAllAvailable()
      // batch 2: a cosmetic duplicate of doc 1 (same normalized content) + a new doc
      in.addData(Seq((3L, s"  $good "), (4L, other)))
      q.processAllAvailable()
    } finally q.stop()
    val out = spark.table(name).select(col("doc_id"), col("text")).collect()
    assert(out.map(_.getLong(0)).toSet == Set(1L, 4L),
      s"expected docs 1 and 4 to survive, got ${out.map(_.getLong(0)).toSeq}")
    // batch equivalence on the same 4 docs: identical surviving content set
    val batch = TextOps.dedupExact(
      Seq((1L, good), (2L, junk), (3L, s"  $good "), (4L, other)).toDF("doc_id", "text")
        .filter(TextOps.qualityScore(col("text")) >= 0.3))
    val bNorms = batch.select(TextOps.normalized(col("text"))).collect().map(_.getString(0)).toSet
    val sNorms = out.map(r => r.getString(1)).map(t =>
      t.trim.toLowerCase.replaceAll("\\s+", " ")).toSet
    assert(bNorms == sNorms)
  }
}
