package graft.functions

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** MinHash + LSH fuzzy deduplication over documents, 100 TB-shaped:
  *
  *  - signatures are pure column expressions (codegen'd, zero shuffle):
  *    perm i's hash of a shingle is xxhash64(shingle, i) — the extra hashed
  *    column acts as the permutation seed;
  *  - candidate generation is LSH banding: equal band-hash → same bucket;
  *    ONE shuffle keyed by (band, bandHash), never an all-pairs compare —
  *    within-bucket pairing is quadratic only in bucket size, and buckets
  *    are bounded because equal band-hash implies near-duplicate content;
  *  - verification re-checks candidate pairs on full-signature agreement
  *    (estimated Jaccard), and clustering keeps the minimum doc id per
  *    connected component approximated by "representative = min candidate
  *    neighbor" (single pass; exact union-find would iterate — documented).
  *
  * With numPerms = bands × rowsPerBand = 128 = 16×8, the candidate
  * probability curve has its threshold near t ≈ (1/16)^(1/8) ≈ 0.71 Jaccard.
  */
object MinHash {

  /** Word n-gram shingles of the normalized text. */
  def shingles(text: Column, n: Int = 3): Column = {
    val tokens = split(TextOps.normalized(text), " ")
    when(size(tokens) <= n, array(concat_ws(" ", tokens)))
      .otherwise(transform(sequence(lit(0), size(tokens) - n),
        i => concat_ws(" ", slice(tokens, i + 1, lit(n)))))
  }

  /** MinHash signature: element p = min over shingles of xxhash64(s, p). */
  def signature(shingleCol: Column, numPerms: Int = 128): Column =
    transform(sequence(lit(0), lit(numPerms - 1)),
      p => array_min(transform(shingleCol, s => xxhash64(s, p))))

  /** (band, bandHash) rows for LSH bucketing: murmur3 of each signature
    * slice.
    */
  def bands(sig: Column, numBands: Int = 16, rowsPerBand: Int = 8): Column =
    transform(sequence(lit(0), lit(numBands - 1)),
      b => struct(b.as("band"), hash(slice(sig, b * rowsPerBand + 1, lit(rowsPerBand))).as("band_hash")))

  /** Candidate near-duplicate pairs (a < b) with their estimated Jaccard
    * (fraction of agreeing signature positions). One shuffle on the band
    * bucket + one on the pair key for distinct.
    */
  def candidatePairs(docs: DataFrame, textCol: String = "text", idCol: String = "doc_id",
                     numPerms: Int = 128, numBands: Int = 16, rowsPerBand: Int = 8): DataFrame = {
    // Two-step materialization is load-bearing: signature() is an
    // interpreted higher-order expression, and without a cache boundary the
    // projection collapse re-evaluates the whole shingle+hash pipeline once
    // per permutation, per exploded band, per join side — O(bands × perms)
    // regex passes over every document. Cache shingles (one regex per doc),
    // then cache signatures (the join probes them twice). At 100 TB the
    // same boundary is a checkpoint to parquet instead of a cache.
    val shingled = docs.select(col(idCol).as("id"), shingles(col(textCol)).as("sh")).cache()
    val sigd = shingled.select(col("id"), signature(col("sh"), numPerms).as("sig")).cache()
    val banded = sigd.select(col("id"), col("sig"),
      explode(bands(col("sig"), numBands, rowsPerBand)).as("b"))
    val a = banded.select(col("b"), col("id").as("id_a"), col("sig").as("sig_a"))
    val bd = banded.select(col("b"), col("id").as("id_b"), col("sig").as("sig_b"))
    a.join(bd, a("b") === bd("b") && a("id_a") < bd("id_b"))
      .select(col("id_a"), col("id_b"),
        (size(filter(zip_with(col("sig_a"), col("sig_b"), (x, y) => x === y), eq => eq))
          / lit(numPerms.toDouble)).as("est_jaccard"))
      .distinct()
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
