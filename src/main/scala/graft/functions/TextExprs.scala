package graft.functions

import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, UnaryExpression}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.sql.{Column, SparkSessionExtensions}

/** Native text-kernel expressions (same preference order as [[VectorExprs]]:
  * native expression > composed functions > UDF).
  *
  * [[TokenWindowHashes]] is the hot map-side step of substring-level dedup
  * ([[SubstringDedup]]): 64-bit hashes of every k-token sliding window of a
  * token array. The composed form — `transform(sequence(...), i ->
  * xxhash64(concat_ws(" ", slice(toks, i+1, k))))` — materializes each
  * window STRING (k× the document bytes in transient UTF8 copies) and
  * re-hashes every token k times: O(tokens × k) bytes hashed per document.
  * The kernel hashes each token ONCE and combines them with a polynomial
  * rolling hash — O(tokens) multiply-adds, zero window-string
  * materialization.
  *
  * Hash contract: equal token windows ⇒ equal hash (the candidate set is a
  * superset of true duplicates — completeness); UNequal windows may collide
  * (soundness is NOT assumed: [[SubstringDedup]] re-verifies candidates on
  * the full window string, so correctness never rides on this hash). The
  * hash is a polynomial in an odd 64-bit multiplier over per-token
  * xxhash64 values, mod 2⁶⁴ via natural long overflow. A null token hashes
  * to the untouched seed 42, mirroring Spark's xxhash64-of-NULL convention
  * (same as [[SimHashKernel]]).
  */
object TextExprs {

  val WindowHashesName = "graft_window_hashes"

  def register(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction((
      new FunctionIdentifier(WindowHashesName),
      new ExpressionInfo(classOf[TokenWindowHashes].getName, WindowHashesName),
      (children: Seq[Expression]) => {
        require(children.length == 2, s"$WindowHashesName expects (tokens, k)")
        val kExpr = children(1)
        require(kExpr.foldable, s"$WindowHashesName: k must be a literal")
        val k = kExpr.eval() match {
          case i: Int => i
          case other => throw new IllegalArgumentException(
            s"$WindowHashesName: k must be an int literal, got $other")
        }
        TokenWindowHashes(children.head, k)
      }))
  }

  private def expr(c: Column): Expression =
    org.apache.spark.sql.graftbridge.ColumnBridge.expression(c)

  private def toCol(e: Expression): Column =
    org.apache.spark.sql.graftbridge.ColumnBridge.column(e)

  /** Column-API face of [[TokenWindowHashes]]. */
  def windowHashes(tokens: Column, k: Int): Column =
    toCol(TokenWindowHashes(expr(tokens), k))
}

/** See [[TextExprs]]. Output: array<long> of length max(0, n − k + 1);
  * element i (0-based) hashes tokens [i, i+k). Null array → null; an array
  * shorter than k → empty array.
  */
case class TokenWindowHashes(child: Expression, k: Int) extends UnaryExpression {

  require(k >= 1, s"window size must be >= 1, got $k")

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = true
  override def prettyName: String = TextExprs.WindowHashesName

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName expects array<string>, got ${other.catalogString}")
  }

  @transient private lazy val kernel = new WindowHashKernel(k)

  override def nullSafeEval(a: Any): Any = kernel.compute(a.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val kern = ctx.addReferenceObj("windowHashKernel", kernel,
      classOf[WindowHashKernel].getName)
    nullSafeCodeGen(ctx, ev, a => s"${ev.value} = $kern.compute($a);")
  }

  override protected def withNewChildInternal(newChild: Expression): TokenWindowHashes =
    copy(child = newChild)
}

/** Compiled core of [[TokenWindowHashes]], shared by eval and codegen. */
final class WindowHashKernel(k: Int) extends Serializable {

  import org.apache.spark.sql.catalyst.expressions.XxHash64Function

  // odd multiplier (the 64-bit golden-ratio constant) — invertible mod 2^64,
  // so distinct token positions keep distinct weights
  private val B = 0x9E3779B97F4A7C15L
  // B^(k-1) mod 2^64, for the rolling subtract-leading-term step
  private val Bk1: Long = {
    var p = 1L
    var i = 1
    while (i < k) { p *= B; i += 1 }
    p
  }

  def compute(arr: ArrayData): ArrayData = {
    val n = arr.numElements()
    if (n < k) return new GenericArrayData(Array.empty[Long])
    // hash every token once
    val th = new Array[Long](n)
    var i = 0
    while (i < n) {
      th(i) =
        if (arr.isNullAt(i)) 42L
        else XxHash64Function.hash(arr.getUTF8String(i), StringType, 42L)
      i += 1
    }
    val out = new Array[Long](n - k + 1)
    // h(0) = Σ th(j)·B^(k-1-j); then h(i+1) = (h(i) − th(i)·B^(k-1))·B + th(i+k)
    var h = 0L
    i = 0
    while (i < k) { h = h * B + th(i); i += 1 }
    out(0) = h
    i = 0
    while (i + k < n) {
      h = (h - th(i) * Bk1) * B + th(i + k)
      out(i + 1) = h
      i += 1
    }
    new GenericArrayData(out)
  }
}
