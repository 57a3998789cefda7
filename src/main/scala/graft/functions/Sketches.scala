package graft.functions

import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, UnaryExpression}
import org.apache.spark.sql.types._
import org.apache.spark.sql.{Column, SparkSessionExtensions}

/** Engine-portable sketch primitives: a 61-bit universal hash plus the
  * sketch operators built on it (HyperLogLog registers, count-min cells,
  * Bloom membership — assembled into queries by
  * [[graft.queries.QueriesSketch]]).
  *
  * Design constraint driving everything here: the sketches must be EXACTLY
  * replayable by the DuckDB oracle, so the correctness gate can hash-check
  * estimate values — not just "within ε of truth". Spark's own sketch
  * aggregates (`approx_count_distinct`'s HLL++, `count_min_sketch`) hash
  * with engine-private functions DuckDB cannot reproduce, which would leave
  * the rows un-oracled. Instead every sketch hashes with the classic
  * multiply-mod-Mersenne universal family
  *
  *     h_{a,b}(x) = (a·x + b) mod M61,   M61 = 2^61 − 1
  *
  * whose 122-bit intermediate product DuckDB computes exactly in HUGEINT
  * (`(a::HUGEINT * x + b) % 2305843009213693951`) and [[Hash61Kernel]]
  * computes exactly in two 64-bit words (`Math.multiplyHigh` + the Mersenne
  * fold) — bit-identical by construction, property-tested against BigInt in
  * SketchesSpec. The reference's analytics stack has no sketch surface at
  * all (it collects pandas frames; e.g. its dedup is an exact groupby,
  * reference: aggregator_candles.py:382-396) — these operators are part of
  * the 100 TB extension surface, where exact distincts/counts on a hot
  * column are a full shuffle of the data but a sketch is a few KB per
  * partition, merged associatively.
  */
object Sketches {

  /** 2^61 − 1, the Mersenne prime modulus shared with every oracle replay. */
  val M61: Long = (1L << 61) - 1

  val Hash61Name = "graft_hash61"
  val BloomName = "graft_bloom61"

  /** Fixed (a, b) parameter pairs per sketch — arbitrary odd constants in
    * (0, M61), inlined verbatim into the oracle SQL so both engines hash
    * identically. Distinct pairs per use so the sketches are independent.
    */
  val HllParams: (Long, Long) = (971823467812345679L, 117L)
  val CmsParams: Seq[(Long, Long)] = Seq(
    (123456789012345671L, 7L),
    (234567890123456717L, 11L),
    (345678901234567189L, 13L),
    (456789012345671923L, 17L))
  val BloomParams: Seq[(Long, Long)] = Seq(
    (567890123456718901L, 19L),
    (678901234567189017L, 23L),
    (789012345671890123L, 29L))
  val KmvParams: (Long, Long) = (890123456718901235L, 31L)

  /** Register the SQL faces (`graft_hash61(x, a, b)`) on GraftSession. The
    * Bloom test carries a bitmask object and has no SQL face.
    */
  def register(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction((
      new FunctionIdentifier(Hash61Name),
      new ExpressionInfo(classOf[Hash61].getName, Hash61Name),
      (children: Seq[Expression]) => {
        require(children.length == 3, s"$Hash61Name expects (x, a, b)")
        def longArg(e: Expression, name: String): Long = {
          require(e.foldable, s"$Hash61Name: $name must be a literal")
          e.eval() match {
            case l: Long => l
            case i: Int => i.toLong
            case other => throw new IllegalArgumentException(
              s"$Hash61Name: $name must be an integer literal, got $other")
          }
        }
        Hash61(children.head, longArg(children(1), "a"), longArg(children(2), "b"))
      }))
  }

  private def expr(c: Column): Expression =
    org.apache.spark.sql.graftbridge.ColumnBridge.expression(c)

  private def toCol(e: Expression): Column =
    org.apache.spark.sql.graftbridge.ColumnBridge.column(e)

  /** h_{a,b}(x) over a long column (ints are widened). Non-negative result
    * in [0, M61).
    */
  def hash61(x: Column, a: Long, b: Long): Column =
    toCol(Hash61(expr(x.cast("long")), a, b))

  /** Bloom membership test of a long key against a pre-built bitmask — a
    * deterministic runtime filter: map-side, zero-shuffle, no false
    * negatives by construction.
    */
  def bloomMightContain(x: Column, mask: BloomMask, params: Seq[(Long, Long)]): Column =
    toCol(BloomMightContain61(expr(x.cast("long")), mask, params))

  /** Build the bitmask from bit positions (each in [0, mBits)). */
  def maskFromPositions(positions: Iterable[Long], mBits: Int): BloomMask = {
    require(mBits % 64 == 0, s"mBits must be a multiple of 64, got $mBits")
    val words = new Array[Long](mBits / 64)
    positions.foreach { p =>
      require(p >= 0 && p < mBits, s"position $p out of [0, $mBits)")
      words((p >>> 6).toInt) |= 1L << (p & 63)
    }
    BloomMask(words.toVector, mBits)
  }
}

/** Exact (a·x + b) mod (2^61 − 1) in 64-bit arithmetic: the 122-bit product
  * is (hi·2^64 + lo); 2^64 ≡ 8 (mod M61) folds it to
  * (lo & M61) + (lo >>> 61) + (hi << 3), each term < 2^61, then one more
  * fold + conditional subtract normalizes to [0, M61). Shared by eval and
  * codegen so the two paths cannot drift.
  */
object Hash61Kernel {
  import Sketches.M61

  def hash(x: Long, a: Long, b: Long): Long = {
    val xm = java.lang.Math.floorMod(x, M61)
    val hi = java.lang.Math.multiplyHigh(a, xm)
    val lo = a * xm
    var r = (lo & M61) + (lo >>> 61) + (hi << 3)
    r = (r & M61) + (r >>> 61)
    if (r >= M61) r -= M61
    r += b
    if (r >= M61) r -= M61
    r
  }
}

/** Native `h_{a,b}` expression: `doGenCode` emits a static call, so sketch
  * hashing stays inside the surrounding whole-stage-codegen span (one
  * multiply-high + a handful of shifts per row — no allocation).
  */
case class Hash61(child: Expression, a: Long, b: Long) extends UnaryExpression {

  require(a > 0 && a < Sketches.M61, s"a must be in (0, M61), got $a")
  require(b >= 0 && b < Sketches.M61, s"b must be in [0, M61), got $b")

  override def dataType: DataType = LongType
  override def nullable: Boolean = child.nullable
  override def prettyName: String = Sketches.Hash61Name

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case LongType | IntegerType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName expects an integer column, got ${other.catalogString}")
  }

  override def nullSafeEval(x: Any): Any = x match {
    case l: Long => Hash61Kernel.hash(l, a, b)
    case i: Int => Hash61Kernel.hash(i.toLong, a, b)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, x =>
      s"${ev.value} = graft.functions.Hash61Kernel.hash((long) $x, ${a}L, ${b}L);")

  override protected def withNewChildInternal(newChild: Expression): Hash61 =
    copy(child = newChild)
}

/** Value-class wrapper for the Bloom bitmask so the expression tree keeps
  * structural equality (Vector) without a 2048-word toString in every
  * explain output.
  */
final case class BloomMask(words: Vector[Long], mBits: Int) {
  require(words.length * 64 == mBits, s"mask carries ${words.length * 64} bits, expected $mBits")
  override def toString: String =
    s"BloomMask(m=$mBits, setBits=${words.map(java.lang.Long.bitCount(_).toLong).sum})"
}

/** Membership test against a fixed [[BloomMask]] with k = params.size
  * [[Hash61]] probes — the deterministic analog of Spark's runtime bloom
  * filter (`InjectRuntimeFilter`), usable as a plain map-side Filter ahead
  * of a join. False positives possible (and counted by the sk_bloom_prune
  * query), false negatives impossible.
  */
case class BloomMightContain61(child: Expression, mask: BloomMask, params: Seq[(Long, Long)])
  extends UnaryExpression {

  require(params.nonEmpty, "at least one hash function required")

  override def dataType: DataType = BooleanType
  override def nullable: Boolean = child.nullable
  override def prettyName: String = Sketches.BloomName

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case LongType | IntegerType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName expects an integer column, got ${other.catalogString}")
  }

  @transient private lazy val kernel =
    new BloomKernel(mask.words.toArray, mask.mBits,
      params.map(_._1).toArray, params.map(_._2).toArray)

  override def nullSafeEval(x: Any): Any = x match {
    case l: Long => kernel.test(l)
    case i: Int => kernel.test(i.toLong)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val k = ctx.addReferenceObj("bloomKernel", kernel, classOf[BloomKernel].getName)
    nullSafeCodeGen(ctx, ev, x => s"${ev.value} = $k.test((long) $x);")
  }

  override protected def withNewChildInternal(newChild: Expression): BloomMightContain61 =
    copy(child = newChild)
}

/** Compiled core of [[BloomMightContain61]], shared by eval and codegen. */
final class BloomKernel(words: Array[Long], mBits: Int, as: Array[Long], bs: Array[Long])
  extends Serializable {

  def test(x: Long): Boolean = {
    var j = 0
    while (j < as.length) {
      val pos = (Hash61Kernel.hash(x, as(j), bs(j)) % mBits).toInt
      if ((words(pos >>> 6) & (1L << (pos & 63))) == 0L) return false
      j += 1
    }
    true
  }
}
