package graft.functions

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** MinHash + LSH fuzzy deduplication over documents, 100 TB-shaped:
  *
  *  - each shingle is hashed ONCE (xxhash64 reduced mod a prime); the
  *    numPerms permutation values derive arithmetically from that single
  *    hash as (a_p·h + b_p) mod P — the classic affine MinHash family (the
  *    same construction Spark MLlib's MinHashLSH uses). This replaces a
  *    full-string rehash per permutation with one multiply-add, cutting the
  *    signature constant factor by ~numPerms;
  *  - candidate generation is LSH banding: equal band-hash → same bucket;
  *    ONE shuffle keyed by (band, bandHash), never an all-pairs compare —
  *    within-bucket pairing is quadratic only in bucket size, and buckets
  *    are bounded because equal band-hash implies near-duplicate content.
  *    The band self-join carries ids only; the 128-long signature arrays
  *    are re-attached AFTER the distinct on the id pair, so they cross the
  *    shuffle once per side instead of once per band per side;
  *  - verification re-checks candidate pairs on full-signature agreement
  *    (estimated Jaccard), and clustering keeps the minimum doc id per
  *    connected component approximated by "representative = min candidate
  *    neighbor" (single pass; exact union-find would iterate — documented).
  *
  * With numPerms = bands × rowsPerBand = 128 = 16×8, the candidate
  * probability curve has its threshold near t ≈ (1/16)^(1/8) ≈ 0.71 Jaccard.
  */
object MinHash {

  /** Modulus of the affine permutation family; a prime just under 2^31 so
    * a·h + b stays well inside a 64-bit long (same prime as MLlib).
    */
  private val Prime = 2038074743L

  /** Deterministic per-permutation affine coefficients (a_p odd-ish in
    * [1, P), b_p in [0, P)), fixed seed — reproducible everywhere with no
    * driver-side state to ship.
    */
  private def coeffs(numPerms: Int): (Array[Long], Array[Long]) = {
    val rnd = new scala.util.Random(0x5eed)
    val as = Array.fill(numPerms)(1L + rnd.nextInt((Prime - 1).toInt))
    val bs = Array.fill(numPerms)(rnd.nextInt(Prime.toInt).toLong)
    (as, bs)
  }

  /** Word n-gram shingles of the normalized text. */
  def shingles(text: Column, n: Int = 3): Column = {
    val tokens = split(TextOps.normalized(text), " ")
    when(size(tokens) <= n, array(concat_ws(" ", tokens)))
      .otherwise(transform(sequence(lit(0), size(tokens) - n),
        i => concat_ws(" ", slice(tokens, i + 1, lit(n)))))
  }

  /** One base hash per shingle, reduced into [0, Prime). Materialize this
    * (projection + cache/checkpoint) before signatureFromHashes so the
    * string hashing runs once, not once per permutation.
    */
  def shingleHashes(shingleCol: Column): Column =
    transform(shingleCol, s => pmod(xxhash64(s), lit(Prime)))

  /** MinHash signature from pre-computed shingle hashes: a single fold over
    * the hash array, zip-min'ing the numPerms affine images of each hash
    * into the accumulator — O(shingles × numPerms) multiply-adds, zero
    * string work.
    */
  def signatureFromHashes(hashCol: Column, numPerms: Int = 128): Column = {
    val (as, bs) = coeffs(numPerms)
    val colA = array(as.map(lit): _*)
    val colB = array(bs.map(lit): _*)
    aggregate(
      hashCol,
      array_repeat(lit(Long.MaxValue), numPerms),
      (acc, h) => zip_with(
        zip_with(colA, colB, (a, b) => pmod(a * h + b, lit(Prime))),
        acc, (v, m) => least(v, m)))
  }

  /** MinHash signature straight from shingles (convenience; prefer the
    * two-step form with a materialization boundary between hashing and
    * signature when the plan reuses the signature).
    */
  def signature(shingleCol: Column, numPerms: Int = 128): Column =
    signatureFromHashes(shingleHashes(shingleCol), numPerms)

  /** (band, bandHash) rows for LSH bucketing: murmur3 of each signature
    * slice.
    */
  def bands(sig: Column, numBands: Int = 16, rowsPerBand: Int = 8): Column =
    transform(sequence(lit(0), lit(numBands - 1)),
      b => struct(b.as("band"), hash(slice(sig, b * rowsPerBand + 1, lit(rowsPerBand))).as("band_hash")))

  /** Candidate near-duplicate pairs (a < b) with their estimated Jaccard
    * (fraction of agreeing signature positions). One shuffle on the band
    * bucket + one on the scalar pair key for distinct; signatures join back
    * after the distinct.
    */
  def candidatePairs(docs: DataFrame, textCol: String = "text", idCol: String = "doc_id",
                     numPerms: Int = 128, numBands: Int = 16, rowsPerBand: Int = 8): DataFrame = {
    // Two-step materialization is load-bearing: the higher-order exprs are
    // interpreted, and without a cache boundary the projection collapse
    // re-evaluates the upstream pipeline per band / per join side. Cache
    // the per-shingle hashes (one regex + one string hash per doc), then
    // the signatures (probed by the band explode and twice by the
    // re-attach). At 100 TB the same boundary is a checkpoint to parquet.
    val hashed = docs.select(col(idCol).as("id"),
      shingleHashes(shingles(col(textCol))).as("hs")).cache()
    val sigd = hashed.select(col("id"), signatureFromHashes(col("hs"), numPerms).as("sig")).cache()
    val banded = sigd.select(col("id"), explode(bands(col("sig"), numBands, rowsPerBand)).as("b"))
    val a = banded.select(col("b"), col("id").as("id_a"))
    val bd = banded.select(col("b"), col("id").as("id_b"))
    val idPairs = a.join(bd, a("b") === bd("b") && a("id_a") < bd("id_b"))
      .select(col("id_a"), col("id_b"))
      .distinct()
    idPairs
      .join(sigd.select(col("id").as("id_a"), col("sig").as("sig_a")), "id_a")
      .join(sigd.select(col("id").as("id_b"), col("sig").as("sig_b")), "id_b")
      .select(col("id_a"), col("id_b"),
        (size(filter(zip_with(col("sig_a"), col("sig_b"), (x, y) => x === y), eq => eq))
          / lit(numPerms.toDouble)).as("est_jaccard"))
  }

  /** Fuzzy dedup: docs whose estimated Jaccard with a smaller-id candidate
    * exceeds `threshold` are dropped; returns the survivors.
    */
  def dedupFuzzy(docs: DataFrame, textCol: String = "text", idCol: String = "doc_id",
                 threshold: Double = 0.8): DataFrame =
    dedupFuzzyFromPairs(docs, candidatePairs(docs, textCol, idCol), idCol, threshold)

  /** Same, reusing an already-computed pairs frame. */
  def dedupFuzzyFromPairs(docs: DataFrame, pairs: DataFrame, idCol: String = "doc_id",
                          threshold: Double = 0.8): DataFrame = {
    val dups = pairs.filter(col("est_jaccard") >= threshold)
      .select(col("id_b").as("__dup_id")).distinct()
    docs.join(dups, docs(idCol) === dups("__dup_id"), "left_anti")
  }
}
