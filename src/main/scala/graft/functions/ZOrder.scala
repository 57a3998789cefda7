package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Z-order (Morton) curve encoding for multidimensional data layout.
  *
  * Interleaving the bits of two bucket columns gives a 1-D sort key whose
  * contiguous ranges are small axis-aligned rectangles in both dimensions —
  * so laying parquet files out in z-value order makes EVERY file's min/max
  * footer stats tight on BOTH columns at once, and a predicate on either
  * dimension prunes files (classic Delta/Iceberg `OPTIMIZE ZORDER BY`
  * layout, here as a pure engine-side expression).
  *
  * At 100 TB: `df.repartitionByRange(N, zCol).sortWithinPartitions(zCol)
  * .write.parquet(...)` clusters the lake; the z-value is a codegen'd
  * integer expression, so the only cost over a 1-D layout is the range
  * shuffle the write needed anyway. The guarantee demonstrated by the
  * `layout_zorder` manifest query: fixing the top `2k` bits of a
  * `2·bits`-wide z-value confines each dimension to a `2^(bits−k)`-wide
  * window — the data-skipping bound.
  */
object ZOrder {

  /** Morton interleave of two non-negative `bits`-bit bucket columns into
    * a `2·bits`-bit z-value: bit `i` of `x` lands at position `2i`, bit
    * `i` of `y` at `2i+1`. Pure integer arithmetic (shift/mask/add) —
    * whole-stage-codegen'd and exactly replayable in any SQL engine as
    * `((x div 2^i) mod 2) · 2^(2i)` terms.
    */
  def zValue(x: Column, y: Column, bits: Int): Column = {
    require(bits >= 1 && bits <= 31, s"bits must be in [1, 31], got $bits")
    val xs = x.cast("long")
    val ys = y.cast("long")
    (0 until bits).map { i =>
      (shiftright(xs, i).bitwiseAND(lit(1L)) * lit(1L << (2 * i))) +
        (shiftright(ys, i).bitwiseAND(lit(1L)) * lit(1L << (2 * i + 1)))
    }.reduce(_ + _)
  }

  /** The same interleave as ANSI-ish SQL over column expressions `x`,
    * `y` — the oracle replay of [[zValue]]. Uses only `//`, `%`, `*`,
    * `+` so it runs in DuckDB verbatim.
    */
  def zValueSql(x: String, y: String, bits: Int): String =
    (0 until bits).map { i =>
      val p = 1L << i
      s"((($x) // $p) % 2) * ${1L << (2 * i)} + ((($y) // $p) % 2) * ${1L << (2 * i + 1)}"
    }.mkString(" + ")
}
