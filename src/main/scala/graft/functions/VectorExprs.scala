package graft.functions

import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, ExpressionInfo, UnaryExpression}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.sql.{Column, SparkSessionExtensions}

/** Native Catalyst expressions for the vector-similarity hot path.
  *
  * The embedding operators' inner loop is Σ aᵢ·bᵢ over float/double arrays.
  * Spark's higher-order route (`aggregate(zip_with(...))`) expresses it
  * declaratively but never reaches whole-stage codegen — each multiply-add
  * evaluates interpreted, with per-element lambda-variable boxing, and at
  * bench scale the candidate-verify stage of the LSH dedup spent ~4.4 s of a
  * 9.7 s query in exactly that loop. [[DotProduct]] is the same reduction as
  * a first-class `BinaryExpression` WITH `doGenCode`: the generated Java is a
  * primitive while-loop over the two `ArrayData`, so it fuses into the
  * surrounding whole-stage-codegen span (preference order per the design
  * brief: native expression > kernel > UDF).
  *
  * Bit-compatibility contract (the DuckDB oracles hang on it): elements are
  * widened to double and accumulated LEFT-TO-RIGHT, exactly like the
  * higher-order form `aggregate(zip_with(a, b, (x, y) => x.cast(double) *
  * y.cast(double)), 0.0, _ + _)` it replaces; mismatched lengths or a null
  * element yield NULL, mirroring zip_with's null padding through the sum.
  */
object VectorExprs {

  val DotName = "graft_dot"
  val L2Name = "graft_l2sq"
  val SignBucketsName = "graft_sign_buckets"
  val SimHashName = "graft_simhash64"
  val SortedIntersectName = "graft_sorted_intersect_count"

  /** Register the native functions on a session builder via the public
    * extensions API — every [[graft.core.GraftSession]] gets them.
    */
  def register(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction((
      new FunctionIdentifier(DotName),
      new ExpressionInfo(classOf[DotProduct].getName, DotName),
      (children: Seq[Expression]) => {
        require(children.length == 2, s"$DotName expects exactly 2 arguments")
        DotProduct(children.head, children(1))
      }))
    ext.injectFunction((
      new FunctionIdentifier(L2Name),
      new ExpressionInfo(classOf[L2SqDistance].getName, L2Name),
      (children: Seq[Expression]) => {
        require(children.length == 2, s"$L2Name expects exactly 2 arguments")
        L2SqDistance(children.head, children(1))
      }))
    ext.injectFunction((
      new FunctionIdentifier(SimHashName),
      new ExpressionInfo(classOf[SimHash64].getName, SimHashName),
      (children: Seq[Expression]) => {
        require(children.length == 1, s"$SimHashName expects exactly 1 argument")
        SimHash64(children.head)
      }))
    ext.injectFunction((
      new FunctionIdentifier(SignBucketsName),
      new ExpressionInfo(classOf[SignProjectionBuckets].getName, SignBucketsName),
      (children: Seq[Expression]) => {
        require(children.length == 3, s"$SignBucketsName expects (embedding, bits, tables)")
        def intArg(e: Expression, name: String): Int = {
          require(e.foldable, s"$SignBucketsName: $name must be a literal")
          e.eval() match {
            case i: Int => i
            case other => throw new IllegalArgumentException(
              s"$SignBucketsName: $name must be an int literal, got $other")
          }
        }
        SignProjectionBuckets(children.head,
          intArg(children(1), "bits"), intArg(children(2), "tables"))
      }))
  }

  // The Column faces build their expressions DIRECTLY (via the classic-mode
  // bridge), so they work on ANY SparkSession — the registry injection above
  // exists solely so the same expressions also resolve from SQL text
  // ("SELECT graft_dot(a, b)") on GraftSession-built sessions.

  private def expr(c: Column): Expression =
    org.apache.spark.sql.graftbridge.ColumnBridge.expression(c)

  private def toCol(e: Expression): Column =
    org.apache.spark.sql.graftbridge.ColumnBridge.column(e)

  /** Column-API face of [[DotProduct]]. */
  def dotProduct(a: Column, b: Column): Column = toCol(DotProduct(expr(a), expr(b)))

  /** Column-API face of [[L2SqDistance]]. */
  def l2Sq(a: Column, b: Column): Column = toCol(L2SqDistance(expr(a), expr(b)))

  /** Column-API face of [[SimHash64]]. */
  def simHash64(tokens: Column): Column = toCol(SimHash64(expr(tokens)))

  /** Column-API face of [[SignProjectionBuckets]]: all `tables` LSH buckets
    * of an embedding in one native pass.
    */
  def signBuckets(embedding: Column, bits: Int, tables: Int): Column =
    toCol(SignProjectionBuckets(expr(embedding), bits, tables))

  /** Column-API face of [[SortedIntersectCount]] — |A∩B| of two sorted,
    * distinct long arrays by one allocation-free merge scan.
    */
  def sortedIntersectCount(a: Column, b: Column): Column =
    toCol(SortedIntersectCount(expr(a), expr(b)))
}

/** Shared scaffolding for the element-wise array folds ([[DotProduct]],
  * [[L2SqDistance]]): two float/double arrays reduce LEFT-TO-RIGHT into a
  * double, NULL on null input, length mismatch, or any null element (the
  * zip_with-mirroring contract — see [[VectorExprs]]). Subclasses supply
  * only the per-element combine step, once for eval and once as a Java
  * snippet, so the null/mismatch semantics can never drift between the
  * operators.
  */
abstract class BinaryArrayFold extends BinaryExpression {

  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true

  /** acc-update for one element pair (eval path). */
  protected def foldStep(acc: Double, x: Double, y: Double): Double

  /** Java statements updating `acc` from element expressions `x`, `y`
    * (codegen path — MUST mirror [[foldStep]]).
    */
  protected def foldStepJava(ctx: CodegenContext, acc: String, x: String, y: String): String

  private def elem(e: Expression): DataType = e.dataType match {
    case ArrayType(et, _) => et
    case _ => NullType
  }

  override def checkInputDataTypes(): TypeCheckResult = {
    def ok(e: Expression): Boolean = e.dataType match {
      case ArrayType(FloatType | DoubleType, _) => true
      case _ => false
    }
    if (ok(left) && ok(right)) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName expects (array<float|double>, array<float|double>), got " +
        s"${left.dataType.catalogString} and ${right.dataType.catalogString}")
  }

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = x.numElements()
    if (n != y.numElements()) return null
    val xf = elem(left) == FloatType
    val yf = elem(right) == FloatType
    var s = 0.0
    var i = 0
    while (i < n) {
      if (x.isNullAt(i) || y.isNullAt(i)) return null
      val xv = if (xf) x.getFloat(i).toDouble else x.getDouble(i)
      val yv = if (yf) y.getFloat(i).toDouble else y.getDouble(i)
      s = foldStep(s, xv, yv)
      i += 1
    }
    s
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val s = ctx.freshName("s")
      def read(arr: String, idx: String, side: Expression): String =
        if (elem(side) == FloatType) s"(double) $arr.getFloat($idx)" else s"$arr.getDouble($idx)"
      s"""
         |final int $n = $a.numElements();
         |if ($n != $b.numElements()) {
         |  ${ev.isNull} = true;
         |} else {
         |  double $s = 0.0;
         |  for (int $i = 0; $i < $n; $i++) {
         |    if ($a.isNullAt($i) || $b.isNullAt($i)) { ${ev.isNull} = true; break; }
         |    ${foldStepJava(ctx, s, read(a, i, left), read(b, i, right))}
         |  }
         |  if (!${ev.isNull}) ${ev.value} = $s;
         |}
       """.stripMargin
    })
}

/** |A ∩ B| over two SORTED, DISTINCT long arrays — the exact-Jaccard
  * verify kernel (r17). `size(array_intersect(a, b))` built a hash set AND
  * materialized the intersected array per pair (and `array_union` a second
  * set) — pure allocation on a path that's Θ(candidates); the sorted-merge
  * scan is allocation-free and O(|A|+|B|) sequential long compares. The
  * producer ([[MinHash.withShingleHashSets]]) sorts each set once per doc;
  * a candidate doc is verified against hundreds of partners, so the
  * corpus-side sort amortizes immediately. |A ∪ B| is then
  * |A|+|B|−|A∩B| by distinctness — no second pass anywhere.
  *
  * PRECONDITION (callers'): both arrays ascending-sorted, duplicate-free,
  * no null elements — exactly what withShingleHashSets emits. Null
  * ARRAY → null, mirroring array_intersect.
  */
case class SortedIntersectCount(left: Expression, right: Expression)
  extends BinaryExpression {

  override def dataType: DataType = IntegerType
  override def nullable: Boolean = true
  override def prettyName: String = VectorExprs.SortedIntersectName

  override def checkInputDataTypes(): TypeCheckResult = (left.dataType, right.dataType) match {
    case (ArrayType(LongType, _), ArrayType(LongType, _)) => TypeCheckResult.TypeCheckSuccess
    case (l, r) => TypeCheckResult.TypeCheckFailure(
      s"$prettyName expects two array<bigint>, got ${l.catalogString}, ${r.catalogString}")
  }

  @transient private lazy val kernel = new SortedIntersectKernel

  override def nullSafeEval(a: Any, b: Any): Any =
    kernel.compute(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val k = ctx.addReferenceObj("sortedIntersect", kernel,
      classOf[SortedIntersectKernel].getName)
    nullSafeCodeGen(ctx, ev, (a, b) => s"${ev.value} = $k.compute($a, $b);")
  }

  override protected def withNewChildrenInternal(newLeft: Expression,
                                                 newRight: Expression): SortedIntersectCount =
    copy(left = newLeft, right = newRight)
}

/** Compiled core of [[SortedIntersectCount]], shared by eval and codegen. */
final class SortedIntersectKernel extends Serializable {
  def compute(a: ArrayData, b: ArrayData): Int = {
    val na = a.numElements()
    val nb = b.numElements()
    var i = 0
    var j = 0
    var c = 0
    while (i < na && j < nb) {
      val x = a.getLong(i)
      val y = b.getLong(j)
      if (x == y) { c += 1; i += 1; j += 1 }
      else if (x < y) i += 1
      else j += 1
    }
    c
  }
}

/** Σ aᵢ·bᵢ — see [[BinaryArrayFold]] for the shared fold/null contract. */
case class DotProduct(left: Expression, right: Expression) extends BinaryArrayFold {
  override def prettyName: String = VectorExprs.DotName

  override protected def foldStep(acc: Double, x: Double, y: Double): Double = acc + x * y

  override protected def foldStepJava(ctx: CodegenContext, acc: String, x: String, y: String): String =
    s"$acc += $x * $y;"

  override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): DotProduct =
    copy(left = newLeft, right = newRight)
}

/** Σ (aᵢ−bᵢ)² — the IVF coarse quantizer's distance (centroid literals ride
  * as the right child); see [[BinaryArrayFold]] for the shared contract.
  */
case class L2SqDistance(left: Expression, right: Expression) extends BinaryArrayFold {
  override def prettyName: String = VectorExprs.L2Name

  override protected def foldStep(acc: Double, x: Double, y: Double): Double = {
    val d = x - y
    acc + d * d
  }

  override protected def foldStepJava(ctx: CodegenContext, acc: String, x: String, y: String): String = {
    val d = ctx.freshName("d")
    s"double $d = $x - $y; $acc += $d * $d;"
  }

  override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): L2SqDistance =
    copy(left = newLeft, right = newRight)
}

/** 64-bit SimHash of a token array, one native pass — value-identical to
  * [[SimHash.simhash64]]'s higher-order form (per token, ±1 per bit of
  * `xxhash64(token)`; positive counter ⇒ bit set), which evaluated
  * interpreted at tokens × 64 lambda invocations per document. Null
  * semantics mirror that form: null array → null; a null TOKEN hashes like
  * Spark's `xxhash64(NULL)` (the unchanged seed, 42), contributing that bit
  * pattern's ±1s, exactly as the expression did.
  */
case class SimHash64(child: Expression) extends UnaryExpression {

  override def dataType: DataType = LongType
  override def nullable: Boolean = true
  override def prettyName: String = VectorExprs.SimHashName

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName expects array<string>, got ${other.catalogString}")
  }

  @transient private lazy val kernel = new SimHashKernel

  override def nullSafeEval(a: Any): Any = kernel.compute(a.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val k = ctx.addReferenceObj("simhashKernel", kernel, classOf[SimHashKernel].getName)
    nullSafeCodeGen(ctx, ev, a => s"${ev.value} = $k.compute($a);")
  }

  override protected def withNewChildInternal(newChild: Expression): SimHash64 =
    copy(child = newChild)
}

/** Compiled core of [[SimHash64]], shared by eval and codegen. */
final class SimHashKernel extends Serializable {

  import org.apache.spark.sql.catalyst.expressions.XxHash64Function

  def compute(arr: ArrayData): Long = {
    val n = arr.numElements()
    val counters = new Array[Int](64)
    var i = 0
    while (i < n) {
      // Spark's xxhash64 of a NULL value leaves the seed untouched — a null
      // token therefore "hashes" to 42, same as the expression form
      val h =
        if (arr.isNullAt(i)) 42L
        else XxHash64Function.hash(arr.getUTF8String(i), StringType, 42L)
      var j = 0
      while (j < 64) {
        if ((h & (1L << j)) != 0) counters(j) += 1 else counters(j) -= 1
        j += 1
      }
      i += 1
    }
    var sketch = 0L
    var j = 0
    while (j < 64) {
      if (counters(j) > 0) sketch |= 1L << j
      j += 1
    }
    sketch
  }
}

/** All `tables` sign-random-projection LSH buckets of an embedding, as one
  * native pass: element `t` of the result is the b-bit bucket whose bit `j`
  * is the sign of the dot product with deterministic pseudo-random
  * hyperplane `p = t·bits + j` (components derived per (plane, dim) from
  * xxhash64, exactly like [[Similarity.lshBucket]] — the two are pinned
  * bit-identical by VectorExprsSpec, so every bucket-dependent oracle keeps
  * its meaning).
  *
  * Why native: the higher-order form nests aggregate∘zip_with∘aggregate and
  * evaluates interpreted — tables × bits × dims lambda invocations with an
  * xxhash64 expression eval per element, PER ROW. Here the hyperplane matrix
  * is derived once per executor and cached (the hashes depend only on
  * (plane, dim), never on data), and each row costs tables × bits × dims
  * primitive multiply-adds in compiled loops. `doGenCode` emits a call into
  * the cached helper, so surrounding expressions stay inside the
  * whole-stage-codegen span.
  *
  * Null semantics mirror the higher-order form: null array → null; a null
  * ELEMENT nulls every projection it touches, which leaves those sign bits
  * unset (`when(proj >= 0, m).otherwise(0)` on a null proj takes the
  * otherwise branch).
  */
case class SignProjectionBuckets(child: Expression, bits: Int, tables: Int)
  extends UnaryExpression {

  require(bits >= 1 && bits <= 63, s"bits must be in [1, 63], got $bits")
  require(tables >= 1, s"tables must be >= 1, got $tables")

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = true
  override def prettyName: String = VectorExprs.SignBucketsName

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType | DoubleType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName expects array<float|double>, got ${other.catalogString}")
  }

  @transient private lazy val helper = {
    val isFloat = child.dataType match {
      case ArrayType(FloatType, _) => true
      case _ => false
    }
    new SignProjectionHelper(bits, tables, isFloat)
  }

  override def nullSafeEval(a: Any): Any = helper.compute(a.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val h = ctx.addReferenceObj("signProj", helper, classOf[SignProjectionHelper].getName)
    nullSafeCodeGen(ctx, ev, a => s"${ev.value} = $h.compute($a);")
  }

  override protected def withNewChildInternal(newChild: Expression): SignProjectionBuckets =
    copy(child = newChild)
}

/** The compiled core of [[SignProjectionBuckets]], shared between the
  * interpreted and codegen paths. Thread-safe lazy hyperplane cache: the
  * matrix depends only on (plane, dim) and is rebuilt solely when a wider
  * embedding appears (never in practice — corpora are fixed-dim).
  */
final class SignProjectionHelper(bits: Int, tables: Int, floatElems: Boolean)
  extends Serializable {

  import org.apache.spark.sql.catalyst.expressions.XXH64

  @transient @volatile private var planes: Array[Double] = _
  @transient private var dims: Int = -1

  /** Exactly Spark's `xxhash64(p, d)` over two int columns (seed 42,
    * chained), reduced the way [[Similarity.planeComponent]] reduces it.
    */
  private def component(p: Int, d: Int): Double = {
    val h = XXH64.hashInt(d, XXH64.hashInt(p, 42L))
    val m = ((h % 2000001L) + 2000001L) % 2000001L
    (m - 1000000L).toDouble / 1000000.0
  }

  private def ensure(n: Int): Array[Double] = {
    var pl = planes
    if (pl == null || n > dims) synchronized {
      pl = planes
      if (pl == null || n > dims) {
        val np = tables * bits
        pl = new Array[Double](np * n)
        var p = 0
        while (p < np) {
          var d = 0
          while (d < n) { pl(p * n + d) = component(p, d); d += 1 }
          p += 1
        }
        dims = n
        planes = pl
      }
    }
    pl
  }

  def compute(arr: ArrayData): GenericArrayData = {
    val n = arr.numElements()
    val pl = ensure(n)
    // derive the layout width from the matrix itself (>= n): `dims` could
    // be concurrently widened by another thread after `ensure` returns
    val stride = pl.length / (tables * bits)
    val out = new Array[Long](tables)
    // Copy the vector to a primitive array ONCE per row (r17): the former
    // per-projection loop paid tables × bits virtual isNullAt/getFloat
    // calls per ELEMENT (1204 re-reads of each element at the sf10
    // geometry); over a plain double[] the inner loop is branch-free FMA
    // work the JIT auto-vectorizes. Bit-identical: the multiply-add order
    // per projection is unchanged (d ascending), and a null element still
    // yields bucket 0 in every table — any null means every projection's
    // sum was null in the Column spec, so no sign bit is ever set.
    val v = new Array[Double](n)
    var d0 = 0
    while (d0 < n) {
      if (arr.isNullAt(d0)) return new GenericArrayData(out)
      v(d0) = if (floatElems) arr.getFloat(d0).toDouble else arr.getDouble(d0)
      d0 += 1
    }
    var t = 0
    while (t < tables) {
      var bucket = 0L
      var j = 0
      while (j < bits) {
        val p = t * bits + j
        val off = p * stride
        var s = 0.0
        var d = 0
        while (d < n) {
          s += v(d) * pl(off + d)
          d += 1
        }
        // !(s < 0) rather than s >= 0: Spark SQL's GreaterThanOrEqual orders
        // NaN above every double, so the Column spec `when(proj >= 0, m)` sets
        // the bit for a NaN projection; Java's `NaN >= 0` is false. `!(s < 0)`
        // is bit-identical to Spark for NaN, -0.0, and +/-Inf alike.
        if (!(s < 0)) bucket |= 1L << j
        j += 1
      }
      out(t) = bucket
      t += 1
    }
    new GenericArrayData(out)
  }
}
