package graft.queries

import java.sql.Timestamp

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.calc.IndicatorPass
import graft.operators.CandleAggregator
import graft.streaming.{StreamingCandles, StreamingIndicators}

/** §2.9 on the scoreboard: the REAL Structured Streaming pipelines run over
  * the sf ticks as event-time micro-batches and are counted against the
  * batch results — the reference's batch ≡ stream promise (shared
  * apply_all_calculations, candle_to_calcs.py:653 vs :777) as a
  * driver-visible, hash-checked row.
  *
  * The emitted row is (n_candles, n_stream_g1, g1_only_batch, g1_only_stream,
  * n_h_batch, n_stream_h, h_only_batch, h_only_stream); the DuckDB oracle
  * recomputes n_candles independently and pins every mismatch column to 0,
  * so ANY batch/stream divergence — a missing window, a wrong indicator bit,
  * a dropped row — turns the row red.
  *
  * The MemoryStream feed is driver-side BY NATURE: it is the in-process
  * harness source (production streams arrive via readStream file/Kafka
  * sources, same operators). The collect() here feeds the harness; it is not
  * part of the computation under test, which runs distributed like any other
  * streaming query.
  */
object QueriesStreaming {

  /** Ordered contiguous event-time slices — the reference's stream loop
    * slices by wall minutes (candle_to_calcs.py:750-755); at sf scale that
    * would mean thousands of micro-batches, so we keep the in-order
    * micro-batch structure but bound the batch count.
    */
  private def slices[T](rows: Seq[T], n: Int): Seq[Seq[T]] = {
    val per = math.max(1, math.ceil(rows.length.toDouble / n).toInt)
    rows.grouped(per).toSeq
  }

  /** batch.except(stream) / stream.except(batch) over bit-exact rows.
    * Set semantics are safe: every compared frame is unique per
    * (symbol, timestamp), and Spark's set ops treat NaN = NaN.
    */
  private def diffCounts(batch: DataFrame, stream: DataFrame): (Long, Long) = {
    val cols = batch.columns.sorted.map(c => col(s"`$c`")).toSeq
    val b = batch.select(cols: _*)
    val s = stream.select(cols: _*)
    (b.except(s).count(), s.except(b).count())
  }

  private def streamEquiv(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    implicit val ctx: org.apache.spark.sql.SQLContext = spark.sqlContext

    val ticks = graft.core.Tables.ticks(spark, dir)
    val batchCandles = CandleAggregator.aggregate(ticks).cache()

    // ---- G1: windowed agg + watermark over micro-batched ticks
    val tickRows = ticks
      .select(col("symbol"), col("timestamp"), col("price"), col("volume"), col("seq"))
      .as[(String, Timestamp, Double, Double, Long)]
      .collect().sortBy(t => (t._2.getTime, t._1, t._5)).toSeq
    val g1Name = s"graft_stream_g1_${System.nanoTime}"
    val g1In = MemoryStream[(String, Timestamp, Double, Double, Long)]
    val g1Q = StreamingCandles.candles1s(
        g1In.toDF().toDF("symbol", "timestamp", "price", "volume", "seq"))
      .writeStream.format("memory").queryName(g1Name).outputMode("append").start()
    try {
      slices(tickRows, 20).foreach { sl => g1In.addData(sl); g1Q.processAllAvailable() }
      // sentinel far past the end pushes the watermark over every real window
      val lastTs = tickRows.last._2.getTime
      g1In.addData(Seq(("\u0000SENTINEL", new Timestamp(lastTs + 3600L * 1000), 1.0, 1.0, -1L)))
      g1Q.processAllAvailable()
    } finally g1Q.stop()
    val streamG1 = spark.table(g1Name).filter(col("symbol") =!= "\u0000SENTINEL")
    val (g1OnlyBatch, g1OnlyStream) = diffCounts(batchCandles, streamG1)

    // ---- H: stateful kernel pass over micro-batched candles
    val candleRows = batchCandles
      .select(col("symbol"), col("timestamp"), col("open"), col("high"), col("low"), col("close"))
      .as[(String, Timestamp, Double, Double, Double, Double)]
      .collect().sortBy(t => (t._2.getTime, t._1)).toSeq
    val hName = s"graft_stream_h_${System.nanoTime}"
    val hIn = MemoryStream[(String, Timestamp, Double, Double, Double, Double)]
    val hQ = StreamingIndicators.indicatorStream(
        hIn.toDF().toDF("symbol", "timestamp", "open", "high", "low", "close"))
      .writeStream.format("memory").queryName(hName).outputMode("append").start()
    try {
      slices(candleRows, 20).foreach { sl => hIn.addData(sl); hQ.processAllAvailable() }
    } finally hQ.stop()
    val batchH = IndicatorPass.withIndicators(
      batchCandles.select(col("symbol"), col("timestamp"),
        col("open"), col("high"), col("low"), col("close")))
    val (hOnlyBatch, hOnlyStream) = diffCounts(batchH, spark.table(hName))

    val nCandles = batchCandles.count()
    val nStreamG1 = streamG1.count()
    val nStreamH = spark.table(hName).count()
    batchCandles.unpersist()
    Seq((nCandles, nStreamG1, g1OnlyBatch, g1OnlyStream,
      nCandles, nStreamH, hOnlyBatch, hOnlyStream))
      .toDF("n_candles", "n_stream_g1", "g1_only_batch", "g1_only_stream",
        "n_h_batch", "n_stream_h", "h_only_batch", "h_only_stream")
  }

  /** The oracle recomputes the candle count from raw events and requires
    * zero divergence in all four except-counts — DuckDB-independent proof
    * that the streaming pipelines emitted exactly the batch rows.
    */
  private val streamEquivSql =
    s"""${QueriesDomain.withCandles}
       |SELECT COUNT(*) AS n_candles, COUNT(*) AS n_stream_g1,
       |  CAST(0 AS BIGINT) AS g1_only_batch, CAST(0 AS BIGINT) AS g1_only_stream,
       |  COUNT(*) AS n_h_batch, COUNT(*) AS n_stream_h,
       |  CAST(0 AS BIGINT) AS h_only_batch, CAST(0 AS BIGINT) AS h_only_stream
       |FROM candles""".stripMargin

  /** The LLM-corpus ingest funnel, batch ≡ stream: quality gate + langId +
    * exact dedup run BOTH as the batch pipeline and as the streaming one
    * (micro-batched documents through streaming dropDuplicates state), and
    * the surviving NORMALIZED-CONTENT sets are compared exactly. Content
    * sets, not doc_ids: within one micro-batch the first-seen
    * representative of a duplicate group is partition-order dependent
    * (batch keeps lowest id) — the retained content is what the dedup
    * contract promises, and it must match row-for-row. The oracle replays
    * the funnel's survivor count by construction and pins both except-counts
    * to zero.
    */
  private def streamLlmDedup(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    implicit val ctx: org.apache.spark.sql.SQLContext = spark.sqlContext

    val docs = graft.core.Tables.documents(spark, dir)
    val kept = docs
      .withColumn("pred_lang", graft.functions.TextOps.langId(col("text")))
      .filter(graft.functions.TextOps.qualityScore(col("text")) >= 0.3)
    val batchNorms = graft.functions.TextOps.dedupExact(kept)
      .select(graft.functions.TextOps.normalized(col("text")).as("norm"))

    // Feed the stream through toLocalIterator in bounded slices: driver
    // memory holds one partition + one 100-doc micro-batch at a time, not
    // the whole corpus (a full collect() scales linearly with SF and would
    // eventually OOM the driver). 100 keeps multiple micro-batches even at
    // the 500-doc gate SF, so cross-batch dedup state stays exercised.
    // orderBy keeps the feed deterministic; batch boundaries don't matter
    // because the equivalence below compares normalized-content SETS, which
    // are boundary-independent.
    val name = s"graft_stream_dedup_${System.nanoTime}"
    val in = MemoryStream[(Long, String)]
    val q = graft.streaming.StreamingCorpus.dedupExactStream(
        in.toDF().toDF("doc_id", "text"))
      .writeStream.format("memory").queryName(name).outputMode("append").start()
    try {
      import scala.jdk.CollectionConverters._
      docs.select(col("doc_id"), col("text")).orderBy("doc_id")
        .as[(Long, String)].toLocalIterator().asScala
        .grouped(100)
        .foreach { sl => in.addData(sl.toSeq); q.processAllAvailable() }
    } finally q.stop()
    val streamNorms = spark.table(name)
      .select(graft.functions.TextOps.normalized(col("text")).as("norm"))

    val (onlyBatch, onlyStream) = diffCounts(batchNorms, streamNorms)
    Seq((batchNorms.count(), streamNorms.count(), onlyBatch, onlyStream))
      .toDF("n_batch", "n_stream", "only_batch", "only_stream")
  }

  /** DuckDB replays quality gate + exact dedup and asserts zero divergence
    * (same scoring/dedup SQL the per-stage LLM oracles use).
    */
  private val streamLlmDedupSql = {
    val en = graft.functions.TextOps.stopwords.head._2.map(w => s"'$w'").mkString(", ")
    s"""WITH base AS (
       |  SELECT doc_id, text,
       |    regexp_replace(lower(trim(text)), '\\s+', ' ', 'g') AS norm,
       |    string_split(regexp_replace(lower(trim(text)), '\\s+', ' ', 'g'), ' ') AS toks
       |  FROM documents),
       |scored AS (
       |  SELECT doc_id, norm,
       |    CASE WHEN len(list_filter(toks, t -> t SIMILAR TO '\\S+')) BETWEEN 5 AND 100000
       |      THEN 1.0 ELSE 0.0 END *
       |    (0.5 * (length(text) - length(regexp_replace(text, '[a-zA-Z ]', '', 'g')))::DOUBLE / greatest(length(text), 1) +
       |     0.5 * least(len(list_filter(toks, t -> t IN ($en)))::DOUBLE / greatest(len(toks), 1) * 5, 1.0)) AS q
       |  FROM base)
       |SELECT COUNT(DISTINCT norm) AS n_batch, COUNT(DISTINCT norm) AS n_stream,
       |  CAST(0 AS BIGINT) AS only_batch, CAST(0 AS BIGINT) AS only_stream
       |FROM scored WHERE q >= 0.3""".stripMargin
  }

  val all: Seq[Q] = Seq(
    Q("stream_equiv", streamEquiv, Some(streamEquivSql)),
    Q("stream_llm_dedup", streamLlmDedup, Some(streamLlmDedupSql))
  )
}
