package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Add, Ascending, Attribute, AttributeReference, AttributeSet, Expression, GenericInternalRow, If, IsNaN, JoinedRow, Literal, SortOrder, UnsafeProjection}
import org.apache.spark.sql.catalyst.plans.logical.{LogicalPlan, UnaryNode}
import org.apache.spark.sql.catalyst.plans.physical.{Distribution, OrderedDistribution, Partitioning}
import org.apache.spark.sql.execution.{SparkPlan, SparkStrategy, UnaryExecNode}
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType, LongType, MapType, StructType}

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

/** Global run-start rank by `keyCols` as a native operator — the segmented
  * scan that collapses [[graft.operators.SuffixArray]]'s per-round re-rank
  * from THREE plan stages (global index + `groupBy(min)` + key join — two
  * hash exchanges over the full frame per doubling round) to the ONE range
  * exchange the global sort already needs. Each output row carries
  * `outAttr` = the global 0-based index of the FIRST row of its equal-key
  * run — exactly `min(__idx) over equal keys`, the sparse rank the prefix-
  * doubling recurrence consumes.
  *
  * Mechanism: after the planner's range exchange + sort (required via
  * [[OrderedDistribution]], so equal keys are contiguous ACROSS partitions
  * too — a range partitioner assigns equal keys to one partition
  * deterministically), ranks are computable per-partition given only where
  * each partition's LEADING run began globally. One bounded boundary job
  * collects per partition (row count, first key, last key, local start of
  * the trailing run) — #partitions rows of key-width bytes to the driver —
  * and a driver scan threads the open run across partition boundaries.
  * The main pass then assigns ranks in one forward scan per partition:
  * zero extra exchanges, no array/driver traffic proportional to data.
  *
  * Determinism: both jobs consume ONE child RDD instance (one lazy range-
  * shuffle dependency — bounds sampled once, the [[GlobalIndexExec]]
  * argument), and per-partition row COUNTS and key runs are functions of
  * the key alone, so intra-run row order differences between the two jobs
  * cannot change any rank.
  */
final case class GlobalRankPlan(
    child: LogicalPlan,
    keyCols: Seq[String],
    outAttr: Attribute) extends UnaryNode {

  override def output: Seq[Attribute] = child.output :+ outAttr

  override def producedAttributes: AttributeSet = AttributeSet(Seq(outAttr))

  /** Pass-through of the entire child row — column pruning must not strip
    * the child below this node.
    */
  override def references: AttributeSet = child.outputSet

  override protected def withNewChildInternal(newChild: LogicalPlan): GlobalRankPlan =
    copy(child = newChild)
}

/** Plans [[GlobalRankPlan]] → [[GlobalRankExec]]. Injected via
  * `SparkSessionExtensions.injectPlannerStrategy` (GraftSession).
  */
object GlobalRankStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case GlobalRankPlan(child, keyCols, outAttr) =>
      GlobalRankExec(planLater(child), keyCols, outAttr) :: Nil
    case _ => Nil
  }
}

final case class GlobalRankExec(
    child: SparkPlan,
    keyCols: Seq[String],
    outAttr: Attribute) extends UnaryExecNode {

  override def output: Seq[Attribute] = child.output :+ outAttr

  override def producedAttributes: AttributeSet = AttributeSet(Seq(outAttr))

  private def attr(name: String): Attribute =
    child.output.find(_.name == name).getOrElse(
      throw new IllegalStateException(s"GlobalRankExec child lacks column '$name'"))

  /** Run detection compares projected keys by raw UnsafeRow bytes, so
    * floating keys are normalized (-0.0 → 0.0, NaN payloads → canonical
    * NaN) before projection — without this, key values the range sort
    * treats as equal (distinct NaN bit patterns) would be binary-unequal
    * here and split one logical run into two ranks (r16 advice; the
    * optimizer's NormalizeFloatingNumbers is private[sql], so the
    * normalization is spelled out: NaN → canonical literal, else x + 0.0,
    * which maps -0.0 to 0.0 and is identity on every other value). Nested
    * floating key types are rejected loudly rather than silently
    * mis-ranked; long-keyed callers (SuffixArray) see an identity
    * transform.
    */
  private def keyExprs: Seq[Expression] = keyCols.map { c =>
    val a = attr(c)
    a.dataType match {
      case DoubleType =>
        If(IsNaN(a), Literal(Double.NaN, DoubleType), Add(a, Literal(0.0, DoubleType)))
      case FloatType =>
        If(IsNaN(a), Literal(Float.NaN, FloatType), Add(a, Literal(0.0f, FloatType)))
      case t if hasFloating(t) =>
        throw new IllegalStateException(
          s"GlobalRankExec: nested floating-point key type $t for '$c' is not " +
            "supported (raw-byte run detection cannot normalize it)")
      case _ => a
    }
  }

  private def hasFloating(t: DataType): Boolean = t match {
    case DoubleType | FloatType => true
    case ArrayType(e, _) => hasFloating(e)
    case MapType(k, v, _) => hasFloating(k) || hasFloating(v)
    case StructType(fields) => fields.exists(f => hasFloating(f.dataType))
    case _ => false
  }

  private def ordering: Seq[SortOrder] =
    keyCols.map(c => SortOrder(attr(c), Ascending))

  override def requiredChildDistribution: Seq[Distribution] =
    OrderedDistribution(ordering) :: Nil

  override def requiredChildOrdering: Seq[Seq[SortOrder]] = Seq(ordering)

  override def outputPartitioning: Partitioning = child.outputPartitioning

  /** The child's range sort survives the append, and the run-start rank is
    * monotone (non-strictly) in it.
    */
  override def outputOrdering: Seq[SortOrder] = child.outputOrdering

  override protected def doExecute(): RDD[InternalRow] = {
    val childOutput = child.output
    val resultExprs = output
    val joinedSchema = childOutput :+ outAttr
    val keys = keyExprs
    val rdd = child.execute()
    // Boundary job: one forward scan per partition, emitting (count,
    // first key, last key, local index where the trailing run starts).
    // Plain tuples of serializable UnsafeRow copies — a nested case class
    // would drag this whole exec node (and its non-serializable runtime
    // state) into the task result.
    val bounds: Array[Option[(Long, InternalRow, InternalRow, Long)]] = rdd
      .mapPartitionsWithIndex { (pid, it) =>
        val proj = UnsafeProjection.create(keys, childOutput)
        var i = 0L
        var first: InternalRow = null
        var cur: InternalRow = null
        var trailStart = 0L
        while (it.hasNext) {
          val k = proj(it.next())
          if (i == 0L) { first = k.copy(); cur = first }
          else if (k != cur) { cur = k.copy(); trailStart = i }
          i += 1L
        }
        Iterator.single((pid, if (i == 0L) None
          else Some((i, first, cur, trailStart))))
      }.collect().sortBy(_._1).map(_._2)
    val nParts = bounds.length
    val offsets = new Array[Long](nParts)
    var acc = 0L
    var p = 0
    while (p < nParts) {
      offsets(p) = acc
      acc += bounds(p).map(_._1).getOrElse(0L)
      p += 1
    }
    // Driver scan: thread the open run across partitions. carried(p) >= 0
    // means partition p's leading run began at that GLOBAL index.
    val carried = Array.fill(nParts)(-1L)
    var prevLast: InternalRow = null
    var prevOpen = -1L
    p = 0
    while (p < nParts) {
      bounds(p) match {
        case Some((_, firstKey, lastKey, trailStartLocal)) =>
          val continues = prevLast != null && firstKey == prevLast
          if (continues) carried(p) = prevOpen
          prevOpen =
            if (trailStartLocal == 0L && continues) prevOpen
            else offsets(p) + trailStartLocal
          prevLast = lastKey
        case None => () // empty partition: carry the open run through
      }
      p += 1
    }
    rdd.mapPartitionsWithIndex { (pid, it) =>
      val proj = UnsafeProjection.create(keys, childOutput)
      val project = UnsafeProjection.create(resultExprs, joinedSchema)
      val join = new JoinedRow
      val rankVals = new Array[Any](1)
      val rankRow = new GenericInternalRow(rankVals)
      val base = offsets(pid)
      val lead = carried(pid)
      var i = 0L
      var cur: InternalRow = null
      var runStart = 0L
      it.map { r =>
        val k = proj(r)
        if (i == 0L) {
          cur = k.copy()
          runStart = if (lead >= 0L) lead else base
        } else if (k != cur) {
          cur = k.copy()
          runStart = base + i
        }
        i += 1L
        rankVals(0) = runStart
        project(join(r, rankRow))
      }
    }
  }

  override protected def withNewChildInternal(newChild: SparkPlan): GlobalRankExec =
    copy(child = newChild)
}
