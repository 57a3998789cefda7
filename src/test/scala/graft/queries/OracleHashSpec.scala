package graft.queries

import graft.SparkSpec

/** Pins the ENGINE's hash values to the reference vectors the
  * [[OracleHash]] DuckDB chains were validated against (the chains
  * reproduce exactly these constants — proven at build time in DuckDB, and
  * continuously by the four hash-oracle CORRECTNESS rows). If Spark ever
  * changed its xxhash64 seed/algorithm or Murmur3 array folding, this spec
  * pinpoints the drift directly instead of leaving four red oracle rows to
  * bisect.
  */
class OracleHashSpec extends SparkSpec {

  test("xxhash64 string/int-pair vectors match the OracleHash reference constants") {
    val r = spark.sql(
      """SELECT xxhash64('') a, xxhash64('a') b, xxhash64('hello world') c,
        |  xxhash64('abcdefghijklmnopqrst') d, xxhash64('spark dedup corpus shingles') e,
        |  xxhash64(CAST(0 AS INT), CAST(0 AS INT)) f,
        |  xxhash64(CAST(5 AS INT), CAST(63 AS INT)) g,
        |  xxhash64(CAST(123456789 AS INT), CAST(7 AS INT)) h
        |""".stripMargin).head()
    assert(r.getLong(0) === -7444071767201028348L)
    assert(r.getLong(1) === -8582455328737087284L)
    assert(r.getLong(2) === 7620854247404556961L)
    assert(r.getLong(3) === 8917572861163453528L)
    assert(r.getLong(4) === 2540946299439953782L)
    assert(r.getLong(5) === 1151812168208346021L)
    assert(r.getLong(6) === -778342267217574980L)
    assert(r.getLong(7) === 993202015102190721L)
  }

  test("murmur3 long-array vectors match the OracleHash reference constants") {
    val r = spark.sql(
      """SELECT hash(array(CAST(1 AS BIGINT))) a,
        |  hash(array(CAST(1 AS BIGINT), CAST(2 AS BIGINT), CAST(3 AS BIGINT))) b,
        |  hash(array(CAST(-9223372036854775808 AS BIGINT), CAST(982451653 AS BIGINT))) c,
        |  hash(array(CAST(17 AS BIGINT), CAST(2038074742 AS BIGINT), CAST(0 AS BIGINT),
        |       CAST(55 AS BIGINT), CAST(1 AS BIGINT), CAST(999999999 AS BIGINT),
        |       CAST(123 AS BIGINT), CAST(456 AS BIGINT))) d
        |""".stripMargin).head()
    assert(r.getInt(0) === -1712319331)
    assert(r.getInt(1) === 1045631400)
    assert(r.getInt(2) === 1910008088)
    assert(r.getInt(3) === 43442689)
  }
}
