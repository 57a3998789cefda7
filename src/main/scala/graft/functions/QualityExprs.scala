package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, DoubleType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native one-scan kernel for [[TextOps.qualityScore]].
  *
  * The composed Column form evaluates 4 regex passes and materializes 3
  * token arrays PER ROW (~1.5 ms/row measured at sf1 — it was the whole
  * cost of the quality rows at sf10). This expression computes the same
  * score in one pass over the string with zero allocations beyond token
  * slices, ~50× faster, and stays inside whole-stage codegen via a static
  * call. [[TextOps.qualityScoreComposed]] keeps the original expression
  * form, and `QualitySpec` pins kernel ≡ composition over randomized
  * texts — whitespace variants, blank/empty, non-ASCII — so every DuckDB
  * oracle that replays the composed semantics keeps hash-matching.
  *
  * Semantics reproduced EXACTLY (quirks included):
  *  - `alphaRatio = (max(chars,1) − chars_not_in[a-zA-Z ]) / max(chars,1)`
  *    — empty text scores alphaRatio 1.0 (the greatest(…,1) quirk);
  *  - token count = `size(split(trim(text), "\\s+", -1))` on the RAW text,
  *    0 for blank — trim removes 0x20 only, Java `\s` is `[ \t\n\x0B\f\r]`,
  *    and limit −1 keeps leading/trailing empty tokens (a tab-led string
  *    counts one extra token — preserved);
  *  - stop ratio over `split(regexp_replace(lower(trim(text)),"\\s+"," "),
  *    " ")` — lowercasing via [[UTF8String.toLowerCase]] itself, so
  *    non-ASCII case folding cannot diverge from Spark's `lower`;
  *  - `lengthOk × (0.5·alphaRatio + 0.5·min(stopRatio·5, 1))` with the
  *    same floating-point operation order.
  */
object QualityKernel {

  private val stopSet: java.util.HashSet[String] = {
    val s = new java.util.HashSet[String]()
    TextOps.stopwords.head._2.foreach(s.add)
    s
  }

  /** Java-regex `\s` (default mode): exactly [ \t\n\x0B\f\r]. */
  @inline private def isWs(c: Char): Boolean =
    c == ' ' || c == '\t' || c == '\n' || c == '\u000B' || c == '\f' || c == '\r'

  def score(text: UTF8String): Double = {
    // ---- alphaRatio over the raw text (codepoint counts, like length())
    val raw = text.toString
    var i = 0
    var chars = 0
    var alpha = 0
    while (i < raw.length) {
      val cp = raw.codePointAt(i)
      chars += 1
      if ((cp >= 'a' && cp <= 'z') || (cp >= 'A' && cp <= 'Z') || cp == ' ') alpha += 1
      i += Character.charCount(cp)
    }
    val denom = math.max(chars, 1)
    // length(regexp_replace(text,"[a-zA-Z ]","")) = chars − alpha
    val alphaRatio = (denom - (chars - alpha)).toDouble / denom

    // ---- token count on trim(text) (space-only trim), split "\s+" limit −1:
    // pieces = (number of maximal \s runs) + 1; blank → 0
    val trimmed = text.trim() // UTF8String.trim: strips 0x20 only, like Catalyst StringTrim
    val t = trimmed.toString
    val tc =
      if (t.isEmpty) 0
      else {
        var runs = 0
        var inRun = false
        var j = 0
        while (j < t.length) {
          val ws = isWs(t.charAt(j)) // \s is ASCII-only: char test suffices
          if (ws && !inRun) { runs += 1; inRun = true }
          else if (!ws) inRun = false
          j += 1
        }
        runs + 1
      }
    val lengthOk = if (tc >= 5 && tc <= 100000) 1.0 else 0.0

    // ---- stop ratio over split(regexp_replace(lower(trim)),"\s+"," "), " ")
    // = pieces of the lowered trimmed text separated by \s runs (each run
    // collapses to one space; empties at the ends are preserved pieces)
    val low = trimmed.toLowerCase.toString // UTF8String.toLowerCase — same as Spark's lower()
    var nTok = 0
    var stopHits = 0
    val n = low.length
    var start = 0
    var j = 0
    while (j <= n) {
      if (j == n) {
        // final piece [start, n) — empty when the string ends in a \s run
        // (trailing empty kept, limit −1 semantics); "" → one empty token
        nTok += 1
        if (n > start && stopSet.contains(low.substring(start, n))) stopHits += 1
        j += 1
      } else if (isWs(low.charAt(j))) {
        // a \s run closes the piece before it (leading run → empty piece)
        nTok += 1
        if (j > start && stopSet.contains(low.substring(start, j))) stopHits += 1
        while (j < n && isWs(low.charAt(j))) j += 1
        start = j
      } else j += 1
    }
    val stopRatio = stopHits.toDouble / math.max(nTok, 1)
    lengthOk * (0.5 * alphaRatio + 0.5 * math.min(stopRatio * 5, 1.0))
  }
}

/** Codegen'd face of [[QualityKernel.score]]: a static call inside
  * whole-stage codegen, null-safe like the composed form (null text →
  * null score).
  */
case class QualityScoreExpr(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (child.dataType == StringType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
      s"quality_score needs a string input, got ${child.dataType}")

  override def dataType: DataType = DoubleType

  override protected def nullSafeEval(input: Any): Any =
    QualityKernel.score(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.QualityKernel.score($c)")

  override protected def withNewChildInternal(newChild: Expression): QualityScoreExpr =
    copy(child = newChild)
}

object QualityExprs {
  private def expr(c: Column): Expression =
    org.apache.spark.sql.graftbridge.ColumnBridge.expression(c)
  private def toCol(e: Expression): Column =
    org.apache.spark.sql.graftbridge.ColumnBridge.column(e)

  /** Column-API face of [[QualityScoreExpr]]. */
  def qualityScore(text: Column): Column = toCol(QualityScoreExpr(expr(text)))
}
