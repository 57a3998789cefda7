package graft.functions

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** SimHash near-duplicate detection: a 64-bit sketch whose Hamming distance
  * approximates token-multiset cosine distance. Pure column expressions per
  * document; near-dup candidate generation buckets on 16-bit sub-bands
  * (pigeonhole: Hamming distance ≤ 3 ⇒ at least one of 4 bands equal), so
  * the join is bucket-local — never all-pairs.
  */
object SimHash {

  /** Bit masks 1L<<j as a literal array (Spark's shift functions only take
    * Int literals, not columns).
    */
  private val masks64: Column = array((0 until 64).map(j => lit(1L << j)): _*)

  /** 64-bit SimHash of the token array: per bit, sum ±1 over token hashes;
    * sign becomes the bit.
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

  /** Near-duplicate pairs with Hamming distance ≤ maxDist, via 4×16-bit
    * band bucketing.
    */
  def nearDupPairs(docs: DataFrame, textCol: String = "text", idCol: String = "doc_id",
                   maxDist: Int = 3): DataFrame = {
    val sh = docs.select(col(idCol).as("id"),
      simhash64(split(TextOps.normalized(col(textCol)), " ")).as("sh"))
    val banded = sh.select(col("id"), col("sh"),
      explode(array((0 until 4).map(b => struct(lit(b).as("band"),
        shiftright(col("sh"), b * 16).bitwiseAND(lit(0xFFFFL)).as("chunk"))): _*)).as("b"))
    val a = banded.select(col("b"), col("id").as("id_a"), col("sh").as("sh_a"))
    val bd = banded.select(col("b"), col("id").as("id_b"), col("sh").as("sh_b"))
    a.join(bd, a("b") === bd("b") && a("id_a") < bd("id_b"))
      .select(col("id_a"), col("id_b"), hamming(col("sh_a"), col("sh_b")).as("dist"))
      .filter(col("dist") <= maxDist)
      .distinct()
  }
}
