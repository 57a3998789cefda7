package graft.functions

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** SimHash near-duplicate detection: a 64-bit sketch whose Hamming distance
  * approximates token-multiset cosine distance. Pure column expressions per
  * document; near-dup candidate generation buckets on sub-bands sized to
  * the requested distance (pigeonhole: with B bands, Hamming distance
  * ≤ B-1 ⇒ at least one band equal), so the join is bucket-local — never
  * all-pairs.
  */
object SimHash {

  /** Bit masks 1L<<j as a literal array (Spark's shift functions only take
    * Int literals, not columns).
    */
  private val masks64: Column = array((0 until 64).map(j => lit(1L << j)): _*)

  /** 64-bit SimHash of the token array: per bit, sum ±1 over token hashes;
    * sign becomes the bit.
    *
    * This is the executable SPEC — the production path is the native
    * [[SimHash64]] expression (one compiled pass per document), pinned
    * bit-identical to this form by VectorExprsSpec.
    */
  def simhash64(tokens: Column): Column = {
    // counters: per bit j, Σ tokens (bit j set ? +1 : -1)
    val counters = aggregate(
      tokens,
      array_repeat(lit(0), 64),
      (acc, t) => zip_with(acc,
        transform(masks64,
          m => when(xxhash64(t).bitwiseAND(m) =!= 0, 1).otherwise(-1)),
        (a, b) => a + b))
    aggregate(
      zip_with(counters, masks64,
        (cnt, m) => when(cnt > 0, m).otherwise(lit(0L))),
      lit(0L), (acc, v) => acc.bitwiseOR(v))
  }

  /** Hamming distance between two 64-bit sketches. */
  def hamming(a: Column, b: Column): Column = bit_count(a.bitwiseXOR(b))

  /** (id, sh) sketch frame for a document set — exposed so callers can
    * union sketch frames from differently-derived inputs (e.g. injected
    * perturbations) WITHOUT stacking the sketch expression on top of a
    * union: the combined tree blows Spark's whole-stage-codegen method
    * limit and falls back to interpreted eval (~100× slower on the
    * aggregate-over-64-masks sketch).
    */
  def sketches(docs: DataFrame, textCol: String = "text", idCol: String = "doc_id"): DataFrame =
    docs.select(col(idCol).as("id"),
      VectorExprs.simHash64(split(TextOps.normalized(col(textCol)), " ")).as("sh"))

  /** Near-duplicate pairs with Hamming distance ≤ maxDist over the
    * documents' sketches (see [[nearDupPairsFromSketches]] for the banding
    * contract).
    */
  def nearDupPairs(docs: DataFrame, textCol: String = "text", idCol: String = "doc_id",
                   maxDist: Int = 3): DataFrame =
    nearDupPairsFromSketches(sketches(docs, textCol, idCol), maxDist)

  /** Near-dup pairs from an already-built (id, sh) sketch frame, via band
    * bucketing. The band count is derived from maxDist so the pigeonhole
    * guarantee always holds: with B bands, two sketches at distance ≤ B-1
    * must agree on at least one whole band. B = next power of two
    * ≥ maxDist+1 (so 64/B stays integral): maxDist ≤ 3 → 4×16-bit bands,
    * ≤ 7 → 8×8-bit, ≤ 15 → 16×4-bit. Narrower bands mean coarser buckets
    * (2^width values) and a bigger candidate join — the recall/cost dial.
    */
  def nearDupPairsFromSketches(sh: DataFrame, maxDist: Int): DataFrame = {
    require(maxDist >= 0 && maxDist <= 31, s"maxDist $maxDist outside [0, 31]")
    val bands = Seq(1, 2, 4, 8, 16, 32).find(_ >= maxDist + 1).get
    val width = 64 / bands
    val mask = if (width == 64) -1L else (1L << width) - 1L
    val banded = sh.select(col("id"), col("sh"),
      explode(array((0 until bands).map(b => struct(lit(b).as("band"),
        shiftright(col("sh"), b * width).bitwiseAND(lit(mask)).as("chunk"))): _*)).as("b"))
    // Rename the band key per side: a self-join condition built from the
    // same parent lineage (a("b") === bd("b")) resolves both sides to one
    // attribute — trivially true — and Spark plans an all-pairs cross join.
    val a = banded.select(col("b").as("b_a"), col("id").as("id_a"), col("sh").as("sh_a"))
    val bd = banded.select(col("b").as("b_b"), col("id").as("id_b"), col("sh").as("sh_b"))
    a.join(bd, col("b_a") === col("b_b") && col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b"), hamming(col("sh_a"), col("sh_b")).as("dist"))
      .filter(col("dist") <= maxDist)
      .distinct()
  }
}
