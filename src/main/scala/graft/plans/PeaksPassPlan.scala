package graft.plans

import scala.collection.mutable.ArrayBuffer

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.execution.SparkStrategy
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Ascending, Attribute, AttributeReference, GenericInternalRow, JoinedRow, SortOrder, UnsafeProjection, UnsafeRow}
import org.apache.spark.sql.catalyst.plans.logical.{LogicalPlan, UnaryNode}
import org.apache.spark.sql.catalyst.plans.physical.{ClusteredDistribution, Distribution, Partitioning}
import org.apache.spark.sql.execution.{SparkPlan, UnaryExecNode}

import graft.calc.PeaksPass

/** The W11 peak/valley flag pass as a NATIVE Catalyst operator — same tier
  * and same rationale as [[IndicatorPassPlan]]: the old Dataset
  * mapPartitions route paid the generic external-Row encoder on both sides
  * of the kernel (deserialize every ~28-column candle row to a
  * GenericRowWithSchema, re-validate and re-serialize after appending 6
  * ints), and, because mapPartitions erases partitioning info, the
  * (symbol, chunk) windows immediately downstream re-exchanged AND
  * re-sorted the whole frame. This node consumes the sort's InternalRows
  * directly, emits through one codegen'd [[UnsafeProjection]] over a
  * [[JoinedRow]], and DECLARES its distribution/ordering — so the planner
  * inserts one exchange+sort and downstream (symbol, chunk) windows reuse
  * it instead of adding their own.
  *
  * Unlike the streaming H-state kernel, find_peaks is inherently
  * whole-group (prominence is a two-sided unbounded scan), so each
  * (symbol[, extraGroupCols]) group IS buffered — the reference has the
  * same shape per 30-day chunk (candle_to_calcs.py:528-558), which is
  * exactly why the group key must include a time chunk at scale: it bounds
  * the buffered group, and the flags near chunk edges match the
  * reference's own chunked output.
  */
final case class PeaksPassPlan(
    child: LogicalPlan,
    extraGroupCols: Seq[String],
    outAttrs: Seq[Attribute]) extends UnaryNode {

  override def output: Seq[Attribute] = child.output ++ outAttrs

  override def producedAttributes: org.apache.spark.sql.catalyst.expressions.AttributeSet =
    org.apache.spark.sql.catalyst.expressions.AttributeSet(outAttrs)

  /** Pass-through of the entire child row — column pruning must not strip
    * the child below this node.
    */
  override def references: org.apache.spark.sql.catalyst.expressions.AttributeSet =
    child.outputSet

  override protected def withNewChildInternal(newChild: LogicalPlan): PeaksPassPlan =
    copy(child = newChild)
}

object PeaksPassPlan {
  /** Fresh output attributes for one node instance (stable exprIds). */
  def mkOutAttrs: Seq[Attribute] =
    PeaksPass.peakFields.map(f =>
      AttributeReference(f.name, f.dataType, nullable = false)())
}

/** Plans [[PeaksPassPlan]] → [[PeaksPassExec]]. Injected via
  * `SparkSessionExtensions.injectPlannerStrategy` (GraftSession).
  */
object PeaksPassStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case PeaksPassPlan(child, extraGroupCols, outAttrs) =>
      PeaksPassExec(planLater(child), extraGroupCols, outAttrs) :: Nil
    case _ => Nil
  }
}

final case class PeaksPassExec(
    child: SparkPlan,
    extraGroupCols: Seq[String],
    outAttrs: Seq[Attribute]) extends UnaryExecNode {

  override def output: Seq[Attribute] = child.output ++ outAttrs

  override def producedAttributes: org.apache.spark.sql.catalyst.expressions.AttributeSet =
    org.apache.spark.sql.catalyst.expressions.AttributeSet(outAttrs)

  private def attr(name: String): Attribute =
    child.output.find(_.name == name).getOrElse(
      throw new IllegalStateException(s"PeaksPassExec child lacks column '$name'"))

  private def groupKeys: Seq[Attribute] = attr("symbol") +: extraGroupCols.map(attr)

  override def requiredChildDistribution: Seq[Distribution] =
    ClusteredDistribution(groupKeys) :: Nil

  override def requiredChildOrdering: Seq[Seq[SortOrder]] =
    Seq((groupKeys :+ attr("timestamp")).map(SortOrder(_, Ascending)))

  override def outputPartitioning: Partitioning = child.outputPartitioning

  /** Flat append — the child's (group, timestamp) sort survives, so the
    * downstream (symbol, chunk) windows skip their sort too.
    */
  override def outputOrdering: Seq[SortOrder] = child.outputOrdering

  override protected def doExecute(): RDD[InternalRow] = {
    val childOutput = child.output
    val iH = childOutput.indexWhere(_.name == "high")
    val iL = childOutput.indexWhere(_.name == "low")
    val keys = groupKeys
    val resultExprs = output
    val joinedSchema = childOutput ++ outAttrs
    val nOut = outAttrs.length

    child.execute().mapPartitions({ iter =>
      val keyProj = UnsafeProjection.create(keys, childOutput)
      val project = UnsafeProjection.create(resultExprs, joinedSchema)
      val join = new JoinedRow
      val flagVals = new Array[Any](nOut)
      val flagRow = new GenericInternalRow(flagVals)

      new Iterator[InternalRow] {
        private var out: Iterator[InternalRow] = Iterator.empty
        private var pending: InternalRow = null // already copied

        private def fill(): Unit = {
          while (!out.hasNext && (pending != null || iter.hasNext)) {
            val rows = ArrayBuffer.empty[InternalRow]
            val highs = new scala.collection.mutable.ArrayBuilder.ofDouble
            val lows = new scala.collection.mutable.ArrayBuilder.ofDouble
            val first = if (pending != null) pending else iter.next().copy()
            pending = null
            val key: UnsafeRow = keyProj(first).copy()
            rows += first
            highs += first.getDouble(iH)
            lows += first.getDouble(iL)
            var done = false
            while (!done && iter.hasNext) {
              val r = iter.next()
              if (keyProj(r) == key) {
                val c = r.copy()
                rows += c
                highs += c.getDouble(iH)
                lows += c.getDouble(iL)
              } else {
                pending = r.copy()
                done = true
              }
            }
            val fl = PeaksPass.flags(highs.result(), lows.result())
            var i = -1
            out = rows.iterator.map { r =>
              i += 1
              var j = 0
              while (j < nOut) { flagVals(j) = fl(j)(i); j += 1 }
              project(join(r, flagRow))
            }
          }
        }

        override def hasNext: Boolean = { fill(); out.hasNext }
        override def next(): InternalRow = { fill(); out.next() }
      }
    }, preservesPartitioning = true)
  }

  override protected def withNewChildInternal(newChild: SparkPlan): PeaksPassExec =
    copy(child = newChild)
}
