package graft.queries

/** DuckDB SQL generators replaying Spark's hash functions EXACTLY, so the
  * production-hash queries (xxhash64 winnowing, SimHash sketches, MinHash
  * signatures, sign-projection LSH planes) get real value-checked oracles
  * instead of rows-only checks — the same shared-constants philosophy as
  * [[QueriesSketch]]'s 61-bit family, extended to the engine's own xxHash64
  * and Murmur3.
  *
  * Technique: one CTE per primitive op (a 64-bit wrap multiply, rotate,
  * xor, shift), each landing in its own named column — linear SQL size, no
  * expression blow-up. All 64-bit values ride as HUGEINT in [0, 2^64);
  * wrap-multiplies split the left operand in 32-bit halves so the 128-bit
  * intermediate never overflows DuckDB's signed HUGEINT. Validated
  * bit-for-bit against the engine on reference vectors (empty / 1 / 11 /
  * 20 / 27-byte strings, int pairs, 1/2/3/8-element long arrays — see
  * OracleHashSpec).
  *
  * Scope: string inputs up to 31 bytes (the no-stripe xxHash64 path) and
  * pure ASCII — longer or non-ASCII input hashes to NULL, turning the
  * oracle row RED rather than silently passing (the gate corpora satisfy
  * both bounds: max token 8 B, max shingle 26 B, all ASCII).
  */
object OracleHash {

  private val P1 = "11400714785074694791" // xxh64 primes (unsigned decimal)
  private val P2 = "14029467366897019727"
  private val P3 = "1609587929392839161"
  private val P4 = "9650029242287828579"
  private val P5 = "2870177450012600261"
  private val M64 = "18446744073709551616"
  private val B32 = "4294967296"

  /** CTE-per-op chain builder; every op is a fresh named column so nested
    * expressions never duplicate sub-trees.
    */
  final class Chain(src: String, prefix: String) {
    private val ctes = scala.collection.mutable.ArrayBuffer[String]()
    private var prev = src
    private var k = 0
    def step(expr: String): String = {
      k += 1
      val name = s"${prefix}c$k"
      val cte = s"${prefix}s$k"
      ctes += s"$cte AS (SELECT *, $expr AS $name FROM $prev)"
      prev = cte
      name
    }
    /** (a·b) mod 2^64; split a in 32-bit halves to stay inside HUGEINT. */
    def m64(a: String, b: String): String =
      step(s"((($a) % $B32) * ($b) + ((($a) // $B32) * ($b) % $B32) * $B32) % $M64")
    def add64(a: String, b: String): String = step(s"(($a) + ($b)) % $M64")
    def rotl64(x: String, r: Int): String =
      step(s"(($x) * ${1L << r}) % $M64 + (($x) // ${BigInt(1) << (64 - r)})")
    def xor64(a: String, b: String): String =
      step(s"CAST(xor(CAST(($a) AS UBIGINT), CAST(($b) AS UBIGINT)) AS HUGEINT)")
    def shr64(x: String, r: Int): String = step(s"(($x) // ${BigInt(1) << r})")
    def cas(cond: String, thn: String, els: String): String =
      step(s"CASE WHEN $cond THEN $thn ELSE $els END")
    def sql: String = ctes.mkString(",\n")
    def last: String = prev
  }

  private def fmix64(c: Chain, h0: String): String = {
    var h = h0
    var t = c.shr64(h, 33); t = c.xor64(h, t); h = c.m64(t, P2)
    t = c.shr64(h, 29); t = c.xor64(h, t); h = c.m64(t, P3)
    t = c.shr64(h, 32); c.xor64(h, t)
  }

  private def toSigned(c: Chain, u: String): String =
    c.step(s"CAST(CASE WHEN $u >= 9223372036854775808 THEN $u - $M64 ELSE $u END AS BIGINT)")

  /** Appends the xxhash64(seed 42) chain for VARCHAR column `sCol` (ASCII,
    * ≤ 31 bytes — else NULL) of CTE `src`. Returns (chainSql, lastCte,
    * signedCol, unsignedCol).
    */
  def xxh64String(src: String, prefix: String, sCol: String = "s")
  : (String, String, String, String) = {
    val c = new Chain(src, prefix)
    val n = c.step(s"length($sCol)")
    val guard = c.step(s"CASE WHEN $n > 31 OR strlen($sCol) <> $n THEN NULL ELSE 0 END")
    def word(i: Int, nb: Int): String =
      "(" + (0 until nb).map(j =>
        s"CASE WHEN $n >= ${i * 8 + j + 1} THEN ord(substring($sCol, ${i * 8 + j + 1}, 1)) * ${BigInt(1) << (8 * j)}::HUGEINT ELSE 0 END")
        .mkString(" + ") + ")"
    var h = c.step(s"$guard + (42 + $P5 + $n) % $M64")
    for (i <- 0 until 3) {
      val w = c.step(word(i, 8))
      var t = c.m64(w, P2)
      t = c.rotl64(t, 31)
      t = c.m64(t, P1)
      val hx = c.xor64(h, t)
      var t2 = c.rotl64(hx, 27)
      t2 = c.m64(t2, P1)
      t2 = c.add64(t2, P4)
      h = c.cas(s"$n // 8 > $i", t2, h)
    }
    val k4 = c.step("(" + (0 until 4).map(j =>
      s"CASE WHEN $n >= $n//8*8 + ${j + 1} THEN ord(substring($sCol, ($n//8*8 + ${j + 1})::INTEGER, 1)) * ${BigInt(1) << (8 * j)}::HUGEINT ELSE 0 END")
      .mkString(" + ") + ")")
    var t4 = c.m64(k4, P1)
    t4 = c.xor64(h, t4)
    t4 = c.rotl64(t4, 23)
    t4 = c.m64(t4, P2)
    t4 = c.add64(t4, P3)
    h = c.cas(s"$n % 8 >= 4", t4, h)
    val boff = c.step(s"$n//8*8 + CASE WHEN $n % 8 >= 4 THEN 4 ELSE 0 END")
    for (j <- 0 until 3) {
      val b = c.step(
        s"CASE WHEN $n > $boff + $j THEN ord(substring($sCol, ($boff + ${j + 1})::INTEGER, 1))::HUGEINT ELSE 0 END")
      var t = c.m64(b, P5)
      t = c.xor64(h, t)
      t = c.rotl64(t, 11)
      t = c.m64(t, P1)
      h = c.cas(s"$n - $boff > $j", t, h)
    }
    val u = fmix64(c, h)
    val s = toSigned(c, u)
    (c.sql, c.last, s, u)
  }

  /** hashInt(i, seed) sub-chain: i a non-negative INT expression, seed a
    * HUGEINT [0,2^64) column/literal. Returns unsigned result column.
    */
  private def hashInt(c: Chain, iExpr: String, seed: String): String = {
    var h = c.step(s"(($seed) + $P5 + 4) % $M64")
    val mixed = c.step(s"((($iExpr)::HUGEINT) * $P1) % $M64")
    h = c.xor64(h, mixed)
    h = c.rotl64(h, 23)
    h = c.m64(h, P2)
    h = c.add64(h, P3)
    fmix64(c, h)
  }

  /** xxhash64(int a, int b) — Spark's two-int chained hashInt (seed 42).
    * Returns (chainSql, lastCte, signedCol).
    */
  def xxh64IntPair(src: String, prefix: String, aCol: String, bCol: String)
  : (String, String, String) = {
    val c = new Chain(src, prefix)
    val h1 = hashInt(c, aCol, "42")
    val h2 = hashInt(c, bCol, h1)
    val s = toSigned(c, h2)
    (c.sql, c.last, s)
  }

  /** hashLong(l, seed) sub-chain — XXH64's single-8-byte-stripe path (what
    * Spark's `xxhash64` runs for a BIGINT column): l a signed BIGINT
    * expression, reinterpreted as unsigned 64-bit little-endian input.
    * Returns unsigned result column.
    */
  private def hashLong(c: Chain, lExpr: String, seed: String): String = {
    val u = c.step(s"CASE WHEN ($lExpr) < 0 THEN ($lExpr)::HUGEINT + $M64 ELSE ($lExpr)::HUGEINT END")
    var h = c.step(s"(($seed) + $P5 + 8) % $M64")
    var t = c.m64(u, P2)
    t = c.rotl64(t, 31)
    t = c.m64(t, P1)
    h = c.xor64(h, t)
    h = c.rotl64(h, 27)
    h = c.m64(h, P1)
    h = c.add64(h, P4)
    fmix64(c, h)
  }

  /** xxhash64(bigint l) — Spark's seed-42 hashLong over a single BIGINT
    * column. Returns (chainSql, lastCte, signedCol, unsignedCol).
    */
  def xxh64Long(src: String, prefix: String, lCol: String)
  : (String, String, String, String) = {
    val c = new Chain(src, prefix)
    val u = hashLong(c, lCol, "42")
    val s = toSigned(c, u)
    (c.sql, c.last, s, u)
  }

  // -------------------------------------------------- Murmur3 (32-bit ops)

  private val C1 = "3432918353" // 0xcc9e2d51
  private val C2 = "461845907"  // 0x1b873593

  private def rotl32(c: Chain, x: String, r: Int): String =
    c.step(s"(($x) * ${1 << r}) % $B32 + (($x) // ${1 << (32 - r)})")

  /** One Murmur3 hashLong(l, seed) round; l signed BIGINT expr, seed a
    * column in [0, 2^32). Returns unsigned-32 result column.
    */
  private def mmHashLong(c: Chain, lExpr: String, seed: String): String = {
    val lo = c.step(s"((($lExpr) % $B32 + $B32) % $B32)")
    val hi = c.step(s"((($lExpr) // $B32 % $B32 + $B32) % $B32)")
    def mixK1(x: String): String = {
      var k = c.step(s"(($x)::HUGEINT * $C1) % $B32")
      k = rotl32(c, k, 15)
      c.step(s"(($k)::HUGEINT * $C2) % $B32")
    }
    def mixH1(h: String, k: String): String = {
      var v = c.step(s"xor($h, $k)")
      v = rotl32(c, v, 13)
      c.step(s"(($v) * 5 + 3864292196) % $B32")
    }
    var h1 = mixH1(seed, mixK1(lo))
    h1 = mixH1(h1, mixK1(hi))
    // fmix32(h1, 8)
    var f = c.step(s"xor($h1, 8)")
    f = c.step(s"xor($f, ($f) // ${1 << 16})")
    f = c.step(s"(($f)::HUGEINT * 2246822507) % $B32")
    f = c.step(s"xor($f, ($f) // ${1 << 13})")
    f = c.step(s"(($f)::HUGEINT * 3266489909) % $B32")
    c.step(s"xor($f, ($f) // ${1 << 16})")
  }

  /** Spark `hash(array<bigint>)` (Murmur3, seed 42) over the fixed element
    * expressions. Returns (chainSql, lastCte, signedInt32Col).
    */
  def murmur3LongArray(src: String, prefix: String, elems: Seq[String])
  : (String, String, String) = {
    val c = new Chain(src, prefix)
    var h = "42"
    for (e <- elems) h = mmHashLong(c, e, h)
    val s = c.step(s"CAST(CASE WHEN $h >= 2147483648 THEN $h - $B32 ELSE $h END AS INTEGER)")
    (c.sql, c.last, s)
  }
}
