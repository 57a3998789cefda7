package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.SparkStrategy
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Ascending, Attribute, AttributeReference, JoinedRow, SortOrder, UnsafeProjection}
import org.apache.spark.sql.catalyst.plans.logical.{LogicalPlan, UnaryNode}
import org.apache.spark.sql.catalyst.plans.physical.{ClusteredDistribution, Distribution, Partitioning}
import org.apache.spark.sql.execution.{SparkPlan, UnaryExecNode}

import graft.calc.IndicatorPass

/** The H-family indicator/pattern pass as a NATIVE Catalyst operator —
  * logical node + planner strategy + physical exec, the (c) tier of the
  * extension preference order (compose > Expression > LogicalPlan+Strategy+
  * SparkPlan > mapPartitions).
  *
  * Why not mapPartitions: the typed kernel itself is cheap (~3.5 s for the
  * 79-kernel pass over 1M rows), but the Dataset mapPartitions route pays
  * the generic external-Row encoder on BOTH sides — deserialize every input
  * row to a GenericRowWithSchema, then validate-and-serialize an 89-column
  * `Row` back to UnsafeRow per output row. Measured at sf1: 23.2 s
  * materialized vs 3.8 s with the encoder column-pruned away — the encoder
  * was 5× the actual work. This operator consumes the sort's InternalRows
  * directly and emits through one codegen'd [[UnsafeProjection]] over a
  * [[JoinedRow]] (input ++ kernel output) — the WindowExec emission pattern
  * — so the per-row cost is the kernel plus ~89 generated field moves, no
  * boxing validation, no external rows.
  *
  * Distribution/ordering are DECLARED ([[IndicatorPassExec.requiredChildDistribution]]),
  * not hand-scheduled: EnsureRequirements plans the same exchange+sort the
  * old repartition+sortWithinPartitions forced, but AQE remains free to
  * size the exchange, and a child already partitioned by symbol (e.g. a
  * bucketed scan) skips the shuffle entirely — the declarative win.
  *
  * Semantics unchanged from [[IndicatorPass.withIndicators]] (reference:
  * candle_to_calcs.py:381-515): per (symbol[, bucket]) time-ordered state
  * machine appending 20 indicator columns (+ 59 CDL patterns +
  * candle_pattern_sum when `patterns`); in bucketed mode warm-up rows
  * (`__w`) replay into the kernel but are not emitted, and the `__b`/`__w`
  * bookkeeping columns are dropped from the output.
  */
final case class IndicatorPassPlan(
    child: LogicalPlan,
    patterns: Boolean,
    bucketed: Boolean,
    outAttrs: Seq[Attribute]) extends UnaryNode {

  /** Bucketed children carry (__b, __w) as their LAST two columns. */
  private def passThrough: Seq[Attribute] =
    if (bucketed) child.output.dropRight(2) else child.output

  override def output: Seq[Attribute] = passThrough ++ outAttrs

  /** The kernel columns originate HERE — without this, CheckAnalysis counts
    * them as unresolved references missing from the child.
    */
  override def producedAttributes: org.apache.spark.sql.catalyst.expressions.AttributeSet =
    org.apache.spark.sql.catalyst.expressions.AttributeSet(outAttrs)

  /** Consumes the ENTIRE child row (kernel inputs + pass-through), so column
    * pruning must not strip the child below this node.
    */
  override def references: org.apache.spark.sql.catalyst.expressions.AttributeSet =
    child.outputSet

  override protected def withNewChildInternal(newChild: LogicalPlan): IndicatorPassPlan =
    copy(child = newChild)
}

object IndicatorPassPlan {
  /** Fresh output attributes for one node instance (stable exprIds). */
  def mkOutAttrs(patterns: Boolean): Seq[Attribute] =
    (IndicatorPass.indicatorFields ++
      (if (patterns) IndicatorPass.patternFields else Seq.empty))
      .map(f => AttributeReference(f.name, f.dataType, nullable = false)())
}

/** Plans [[IndicatorPassPlan]] → [[IndicatorPassExec]]. Injected via
  * `SparkSessionExtensions.injectPlannerStrategy` (GraftSession).
  */
object IndicatorPassStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case IndicatorPassPlan(child, patterns, bucketed, outAttrs) =>
      IndicatorPassExec(planLater(child), patterns, bucketed, outAttrs) :: Nil
    case _ => Nil
  }
}

final case class IndicatorPassExec(
    child: SparkPlan,
    patterns: Boolean,
    bucketed: Boolean,
    outAttrs: Seq[Attribute]) extends UnaryExecNode {

  private def passThrough: Seq[Attribute] =
    if (bucketed) child.output.dropRight(2) else child.output

  override def output: Seq[Attribute] = passThrough ++ outAttrs

  override def producedAttributes: org.apache.spark.sql.catalyst.expressions.AttributeSet =
    org.apache.spark.sql.catalyst.expressions.AttributeSet(outAttrs)

  private def attr(name: String): Attribute =
    child.output.find(_.name == name).getOrElse(
      throw new IllegalStateException(s"IndicatorPassExec child lacks column '$name'"))

  private def groupKeys: Seq[Attribute] =
    if (bucketed) Seq(attr("symbol"), attr("__b")) else Seq(attr("symbol"))

  /** One hash exchange on (symbol[, __b]) — the planner inserts it only when
    * the child isn't already co-partitioned.
    */
  override def requiredChildDistribution: Seq[Distribution] =
    ClusteredDistribution(groupKeys) :: Nil

  override def requiredChildOrdering: Seq[Seq[SortOrder]] =
    Seq((groupKeys :+ attr("timestamp")).map(SortOrder(_, Ascending)))

  override def outputPartitioning: Partitioning = child.outputPartitioning

  /** Flat mode preserves the child's (symbol, timestamp) sort for downstream
    * windows; bucketed mode drops __b from the output, invalidating the
    * child's ordering expression list, so it declares none.
    */
  override def outputOrdering: Seq[SortOrder] =
    if (bucketed) Nil else child.outputOrdering

  override protected def doExecute(): RDD[InternalRow] = {
    val childOutput = child.output
    val iSym = childOutput.indexWhere(_.name == "symbol")
    val iO = childOutput.indexWhere(_.name == "open")
    val iH = childOutput.indexWhere(_.name == "high")
    val iL = childOutput.indexWhere(_.name == "low")
    val iC = childOutput.indexWhere(_.name == "close")
    val iB = if (bucketed) childOutput.indexWhere(_.name == "__b") else -1
    val iW = if (bucketed) childOutput.indexWhere(_.name == "__w") else -1
    val resultExprs = output
    val joinedSchema = childOutput ++ outAttrs
    val usePatterns = patterns
    val useBucketed = bucketed
    val nOut = outAttrs.length

    child.execute().mapPartitions({ iter =>
      val join = new JoinedRow
      val project = UnsafeProjection.create(resultExprs, joinedSchema)
      val outValues = new Array[Any](nOut)
      val outRow = new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(outValues)
      var sym: org.apache.spark.unsafe.types.UTF8String = null
      var bkt = Long.MinValue
      var st: IndicatorPass.SymbolState = null

      val computed = iter.map { r =>
        val s = r.getUTF8String(iSym)
        val b = if (useBucketed) r.getLong(iB) else 0L
        if (st == null || sym == null || !(sym == s) || b != bkt) {
          sym = s.clone() // r is a reused UnsafeRow; the group key must own its bytes
          bkt = b
          st = new IndicatorPass.SymbolState(patterns = usePatterns)
        }
        st.nextInto(r.getDouble(iO), r.getDouble(iH), r.getDouble(iL), r.getDouble(iC),
          outValues, 0)
        r
      }
      val emitted =
        if (useBucketed) computed.filter(r => !r.getBoolean(iW)) else computed
      emitted.map(r => project(join(r, outRow)))
    }, preservesPartitioning = true)
  }

  override protected def withNewChildInternal(newChild: SparkPlan): IndicatorPassExec =
    copy(child = newChild)
}
