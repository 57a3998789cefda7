package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Ascending, Attribute, AttributeReference, AttributeSet, GenericInternalRow, JoinedRow, SortOrder, UnsafeProjection}
import org.apache.spark.sql.catalyst.plans.logical.{LogicalPlan, UnaryNode}
import org.apache.spark.sql.catalyst.plans.physical.{Distribution, OrderedDistribution, Partitioning}
import org.apache.spark.sql.execution.{SparkPlan, SparkStrategy, UnaryExecNode}
import org.apache.spark.sql.types.LongType

/** Global 0-based order index by `sortCols` as a NATIVE Catalyst operator —
  * the third node in the [[IndicatorPassPlan]]/[[PeaksPassPlan]] tier, built
  * for [[graft.operators.SuffixArray]]'s per-round re-rank (8 calls per
  * build). The two public-API forms both paid structural overhead the
  * operator doesn't need: `RDD.zipWithIndex` over `df.rdd` decodes every
  * row InternalRow→external Row and re-encodes after appending the index
  * (the r14-flagged cost — six decode passes per build), while the
  * checkpoint+offsets-join DataFrame form (tried first in r15) materializes
  * the whole frame per call and adds a broadcast join per round (measured
  * 3.3 s → 5.7 s at sf0.1 — WORSE). This node declares
  * [[OrderedDistribution]] so the planner inserts the one range exchange +
  * sort, then zips the sorted InternalRows directly: one bounded count job
  * for the partition offsets (zipWithIndex's own mechanism — #partitions
  * longs to the driver), and the append is a codegen'd [[UnsafeProjection]]
  * over a [[JoinedRow]] — zero external-Row traffic.
  *
  * Determinism note: the count job and the downstream consumption share ONE
  * RDD instance (one lazy shuffle dependency), so the range-partition
  * bounds — sampled once when the dependency is created — are identical in
  * both, the property the DataFrame re-plan form had to buy with a
  * checkpoint.
  */
final case class GlobalIndexPlan(
    child: LogicalPlan,
    sortCols: Seq[String],
    outAttr: Attribute) extends UnaryNode {

  override def output: Seq[Attribute] = child.output :+ outAttr

  override def producedAttributes: AttributeSet = AttributeSet(Seq(outAttr))

  /** Pass-through of the entire child row — column pruning must not strip
    * the child below this node.
    */
  override def references: AttributeSet = child.outputSet

  override protected def withNewChildInternal(newChild: LogicalPlan): GlobalIndexPlan =
    copy(child = newChild)
}

object GlobalIndexPlan {
  /** Fresh output attribute for one node instance (stable exprId). */
  def mkOutAttr(name: String): Attribute =
    AttributeReference(name, LongType, nullable = false)()
}

/** Plans [[GlobalIndexPlan]] → [[GlobalIndexExec]]. Injected via
  * `SparkSessionExtensions.injectPlannerStrategy` (GraftSession).
  */
object GlobalIndexStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case GlobalIndexPlan(child, sortCols, outAttr) =>
      GlobalIndexExec(planLater(child), sortCols, outAttr) :: Nil
    case _ => Nil
  }
}

final case class GlobalIndexExec(
    child: SparkPlan,
    sortCols: Seq[String],
    outAttr: Attribute) extends UnaryExecNode {

  override def output: Seq[Attribute] = child.output :+ outAttr

  override def producedAttributes: AttributeSet = AttributeSet(Seq(outAttr))

  private def attr(name: String): Attribute =
    child.output.find(_.name == name).getOrElse(
      throw new IllegalStateException(s"GlobalIndexExec child lacks column '$name'"))

  private def ordering: Seq[SortOrder] =
    sortCols.map(c => SortOrder(attr(c), Ascending))

  /** [[OrderedDistribution]] = range partitioning on the sort key: global
    * order across partitions, no single partition anywhere.
    */
  override def requiredChildDistribution: Seq[Distribution] =
    OrderedDistribution(ordering) :: Nil

  override def requiredChildOrdering: Seq[Seq[SortOrder]] = Seq(ordering)

  override def outputPartitioning: Partitioning = child.outputPartitioning

  /** The child's range sort survives the append, and the index itself is
    * monotone in it.
    */
  override def outputOrdering: Seq[SortOrder] =
    child.outputOrdering :+ SortOrder(outAttr, Ascending)

  override protected def doExecute(): RDD[InternalRow] = {
    val childOutput = child.output
    val resultExprs = output
    val joinedSchema = childOutput :+ outAttr
    child.execute().zipWithIndex().mapPartitions { it =>
      val project = UnsafeProjection.create(resultExprs, joinedSchema)
      val join = new JoinedRow
      val idxVals = new Array[Any](1)
      val idxRow = new GenericInternalRow(idxVals)
      it.map { case (r, i) =>
        idxVals(0) = i
        project(join(r, idxRow))
      }
    }
  }

  override protected def withNewChildInternal(newChild: SparkPlan): GlobalIndexExec =
    copy(child = newChild)
}
