package graft.functions

import org.apache.spark.sql.{Column, DataFrame, Encoders, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal columns: image/audio/video as opaque `binary` payloads with
  * typed metadata, processed without ever leaving the engine.
  *
  * Design for 100 TB: the payload column stays opaque to Catalyst (binary),
  * so pruning/pushdown work on the metadata columns while the bytes stream
  * through; byte-level ops (frame slicing, sampling) are pure expressions
  * (codegen'd `substring` on binary — no UDF); the decode boundary is a
  * mapPartitions batch kernel ([[decodeBatches]]) shaped exactly like a
  * vectorized decode (rows in, batch out) so a real codec drops into the
  * same slot.
  *
  * STUB NOTICE: this container has no image/audio codecs, so
  * [[decodeStub]]/[[featureStub]] produce DETERMINISTIC FAKES (metadata and
  * features derived from the bytes via xxhash64). The Spark-side plumbing —
  * schema, partitioning, batch shape, expression slicing — is real and
  * tested; swap the stub body for an actual decoder to productionize.
  */
object Multimodal {

  /** Typed metadata carried next to the opaque payload. */
  val metaSchema: StructType = StructType(Seq(
    StructField("media_type", StringType),
    StructField("width", IntegerType),
    StructField("height", IntegerType),
    StructField("duration_ms", LongType)))

  /** Fixed-size frame starts over a binary payload: 0, stride, 2·stride, …
    * while inside the payload (the tail frame may be short — `substring`
    * clamps identically in Spark and DuckDB). Pure expressions.
    */
  def frames(media: Column, frameBytes: Int, strideBytes: Int): Column = {
    val len = length(media) // bytes for BinaryType
    // truncating cast == floor for the non-negative operand; `/` alone would
    // be double division feeding sequence()
    val lastStart = (greatest(len - lit(1), lit(0)).cast("double") / lit(strideBytes)).cast("long")
    val starts = sequence(lit(0L), lastStart)
    transform(starts, i => media.substr((i * strideBytes + 1).cast("int"), lit(frameBytes)))
  }

  /** Per-frame byte sizes (frame sampling audit without materializing the
    * frames downstream).
    */
  def frameSizes(media: Column, frameBytes: Int, strideBytes: Int): Column =
    transform(frames(media, frameBytes, strideBytes), f => length(f))

  /** STUB decode: deterministic fake metadata from the payload bytes (a real
    * decoder returns the same struct from the actual container headers).
    */
  def decodeStub(media: Column, mediaType: Column): Column = struct(
    mediaType.as("media_type"),
    (pmod(xxhash64(media), lit(1920L)) + 1).cast("int").as("width"),
    (pmod(xxhash64(media, lit(1)), lit(1080L)) + 1).cast("int").as("height"),
    (length(media).cast("long") * 8).as("duration_ms"))

  /** STUB feature extraction: a deterministic dim-length double vector from
    * the payload (a real extractor embeds decoded pixels/samples). The
    * output plugs straight into [[Similarity]]'s cosine/LSH operators.
    */
  def featureStub(media: Column, dim: Int = 16): Column =
    transform(sequence(lit(0), lit(dim - 1)),
      j => (pmod(xxhash64(media, j), lit(2000001L)) - lit(1000000L)).cast("double") / 1000000.0)

  /** The decode boundary as a batch kernel: rows stream through per
    * partition, the stub "decodes" each payload (here: length + first-bytes
    * checksum), and a real implementation would hand each batch to a native
    * codec. Output schema = input columns + decoded metadata + checksum.
    */
  def decodeBatches(media: DataFrame, mediaCol: String = "media"): DataFrame = {
    val inSchema = media.schema
    val outSchema = StructType(inSchema.fields ++ Seq(
      StructField("decoded_bytes", LongType),
      StructField("checksum", LongType)))
    val iM = inSchema.fieldIndex(mediaCol)
    media.mapPartitions { rows =>
      rows.map { r =>
        val bytes = r.getAs[Array[Byte]](iM)
        var sum = 0L
        var i = 0
        val n = math.min(bytes.length, 4096) // a real decoder reads headers
        while (i < n) { sum = sum * 31 + (bytes(i) & 0xff); i += 1 }
        Row.fromSeq(r.toSeq ++ Seq(bytes.length.toLong, sum))
      }
    }(Encoders.row(outSchema))
  }
}
