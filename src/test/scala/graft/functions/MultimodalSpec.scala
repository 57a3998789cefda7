package graft.functions

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Multimodal plumbing: byte-exact frame slicing (incl. short tails and
  * empty payloads), the batch decode kernel, and stub features flowing into
  * the similarity operators.
  */
class MultimodalSpec extends SparkSpec {

  test("frames slice bytes with clamped tails; empty payload yields one empty frame") {
    val session = spark
    import session.implicits._
    val df = Seq(
      (1L, "abcdefghij"), // 10 bytes, frame 4 stride 3 -> starts 0,3,6,9
      (2L, "") // empty
    ).toDF("doc_id", "text").withColumn("media", encode(col("text"), "UTF-8"))
    val out = df.select(col("doc_id"),
      Multimodal.frames(col("media"), 4, 3).as("fr"),
      Multimodal.frameSizes(col("media"), 4, 3).as("fs"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Int](2)).toMap
    assert(out(1L) == Seq(4, 4, 4, 1)) // last frame clamps at the tail
    assert(out(2L) == Seq(0))
  }

  test("decodeBatches appends deterministic decode columns per row") {
    val session = spark
    import session.implicits._
    val df = Seq((1L, "hello"), (2L, "world!")).toDF("doc_id", "text")
      .withColumn("media", encode(col("text"), "UTF-8"))
    val out = Multimodal.decodeBatches(df).select("doc_id", "decoded_bytes", "checksum")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    assert(out == Map(1L -> 5L, 2L -> 6L))
    // deterministic: a second run produces identical checksums
    val a = Multimodal.decodeBatches(df).select("checksum").collect().toSeq
    val b = Multimodal.decodeBatches(df).select("checksum").collect().toSeq
    assert(a == b)
  }

  test("PNG encode→decode roundtrips real dimensions and raster through javax.imageio") {
    val session = spark
    import session.implicits._
    val df = Seq((0L, "a"), (5L, "b"), (63L, "c")).toDF("doc_id", "text")
    val out = Multimodal.decodeImages(Multimodal.encodePngBatches(df.select($"doc_id")))
      .select("doc_id", "img_width", "img_height", "pix_sum")
      .collect().map(r => r.getLong(0) -> ((r.getInt(1), r.getInt(2), r.getLong(3)))).toMap
    // closed-form expectations: w = 1+id%64, h = 1+id%48, Σ (x·31+y·17+id)%256
    for (id <- Seq(0L, 5L, 63L)) {
      val w = (1 + id % 64).toInt
      val h = (1 + id % 48).toInt
      val pix = (for (x <- 0 until w; y <- 0 until h) yield (x * 31 + y * 17 + id) % 256).sum
      assert(out(id) == ((w, h, pix)), s"id $id")
    }
    // a non-PNG payload degrades to null metadata, not a crash
    val mixed = Seq((1L, "not a png")).toDF("doc_id", "text")
      .withColumn("media", encode(col("text"), "UTF-8"))
    val row = Multimodal.decodeImages(mixed).select("img_width").collect()(0)
    assert(row.isNullAt(0))
  }

  test("box resize matches the brute-force block average, incl. odd edges") {
    val session = spark
    import session.implicits._
    // ids chosen for dimension shapes: 0 → 1×1 (degenerate), 4 → 5×5 (odd
    // both axes: edge blocks of 1 and 2 pixels), 63 → 64×16 (even both)
    val df = Seq(0L, 4L, 63L).toDF("doc_id")
    val out = Multimodal.decodeImages(
        Multimodal.resizeImages(Multimodal.encodePngBatches(df), 2)
          .drop("media").withColumnRenamed("resized", "media"))
      .select("doc_id", "img_width", "img_height", "pix_sum")
      .collect().map(r => r.getLong(0) -> ((r.getInt(1), r.getInt(2), r.getLong(3)))).toMap
    for (id <- Seq(0L, 4L, 63L)) {
      val w = (1 + id % 64).toInt
      val h = (1 + id % 48).toInt
      def pix(x: Int, y: Int): Long = (x * 31 + y * 17 + id) % 256
      val wO = (w + 1) / 2; val hO = (h + 1) / 2
      val expected = (for (xo <- 0 until wO; yo <- 0 until hO) yield {
        val xs = (xo * 2) until math.min(xo * 2 + 2, w)
        val ys = (yo * 2) until math.min(yo * 2 + 2, h)
        val block = for (x <- xs; y <- ys) yield pix(x, y)
        block.sum / block.length // floor average
      }).sum
      assert(out(id) == ((wO, hO, expected)), s"id $id")
    }
    // non-PNG payloads degrade to a null resized column, not a crash
    val mixed = Seq((1L, "not a png")).toDF("doc_id", "text")
      .withColumn("media", encode(col("text"), "UTF-8"))
    val row = Multimodal.resizeImages(mixed, 2).select("resized").collect()(0)
    assert(row.isNullAt(0))
  }

  test("audio downsample matches the brute-force block average, incl. odd tails") {
    val session = spark
    import session.implicits._
    // ids chosen for sample-count shapes: 0 → 1 sample (degenerate),
    // 4 → 5 samples (odd: tail block of 1), 9 → 10 samples (even)
    val df = Seq(0L, 4L, 9L).toDF("doc_id")
    val out = Multimodal.decodeAudio(
        Multimodal.downsampleAudio(Multimodal.encodeWavBatches(df), 2)
          .drop("media").withColumnRenamed("downsampled", "media"))
      .select("doc_id", "wav_sample_rate", "wav_n_samples", "sample_sum")
      .collect()
      .map(r => r.getLong(0) -> ((r.getInt(1), r.getLong(2), r.getLong(3)))).toMap
    for (id <- Seq(0L, 4L, 9L)) {
      val n = (1 + id % 1000).toInt
      def s(i: Int): Long = (i * 7 + id) % 65536 - 32768
      val nOut = (n + 1) / 2
      val expected = (0 until nOut).map { j =>
        val block = (j * 2) until math.min(j * 2 + 2, n)
        block.map(s).sum / block.length // truncated average (all-negative here)
      }.sum
      assert(out(id) == ((4000, nOut.toLong, expected)), s"id $id")
    }
    // non-WAV payloads degrade to a null downsampled column, not a crash
    val mixed = Seq((1L, "not a wav")).toDF("doc_id", "text")
      .withColumn("media", encode(col("text"), "UTF-8"))
    val row = Multimodal.downsampleAudio(mixed, 2).select("downsampled").collect()(0)
    assert(row.isNullAt(0))
  }

  test("WAV encode→decode roundtrips real format and PCM through javax.sound") {
    val session = spark
    import session.implicits._
    val df = Seq((0L, "a"), (7L, "b"), (999L, "c")).toDF("doc_id", "text")
    val out = Multimodal.decodeAudio(Multimodal.encodeWavBatches(df.select($"doc_id")))
      .select("doc_id", "wav_sample_rate", "wav_channels", "wav_n_samples", "sample_sum")
      .collect().map(r => r.getLong(0) ->
        ((r.getInt(1), r.getInt(2), r.getLong(3), r.getLong(4)))).toMap
    // closed-form expectations: n = 1+id%1000, Σ ((i·7+id)%65536 − 32768)
    for (id <- Seq(0L, 7L, 999L)) {
      val n = (1 + id % 1000).toInt
      val amp = (0 until n).map(i => ((i * 7 + id) % 65536) - 32768).sum
      assert(out(id) == ((8000, 1, n.toLong, amp)), s"id $id")
    }
    // a non-WAV payload degrades to null metadata, not a crash
    val mixed = Seq((1L, "not a wav")).toDF("doc_id", "text")
      .withColumn("media", encode(col("text"), "UTF-8"))
    val row = Multimodal.decodeAudio(mixed).select("wav_sample_rate").collect()(0)
    assert(row.isNullAt(0))
  }

  test("sniff-passing but corrupt payloads degrade to null rows, not task failures") {
    val session = spark
    import session.implicits._
    // valid magic bytes followed by garbage: the sniff admits them, the
    // decoder must reject them gracefully
    val fakePng = Array[Byte](0x89.toByte, 'P', 'N', 'G', 13, 10, 26, 10) ++
      Array.fill[Byte](32)(42)
    val fakeWav = Array[Byte]('R', 'I', 'F', 'F', 4, 0, 0, 0) ++
      "WAVEjunk".getBytes("ISO-8859-1")
    val df = Seq((1L, fakePng), (2L, fakeWav)).toDF("doc_id", "media")
    val img = Multimodal.decodeImages(df).select("doc_id", "img_width").collect()
    assert(img.forall(_.isNullAt(1)))
    val aud = Multimodal.decodeAudio(df).select("doc_id", "wav_sample_rate").collect()
    assert(aud.forall(_.isNullAt(1)))
  }

  test("stub features are unit-ranged, fixed-dim, and usable by Similarity") {
    val session = spark
    import session.implicits._
    val df = Seq((0L, "aaa"), (1L, "bbb"), (2L, "aaa")).toDF("vec_id", "text")
      .withColumn("embedding", Multimodal.featureStub(encode(col("text"), "UTF-8"), dim = 8))
    val dims = df.select(size(col("embedding"))).collect().map(_.getInt(0))
    assert(dims.forall(_ == 8))
    // identical payloads -> identical features -> cosine 1 with each other
    val top = Similarity.bruteForceTopK(df.filter(col("vec_id") === 0), df, k = 1)
      .select("neighbor_id", "cos").collect()(0)
    assert(top.getLong(0) == 2L && top.getDouble(1) == 1.0)
  }
}
