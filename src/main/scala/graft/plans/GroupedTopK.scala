package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.logical
import org.apache.spark.sql.catalyst.plans.logical.{Filter, LogicalPlan}
import org.apache.spark.sql.catalyst.plans.physical.{AllTuples, ClusteredDistribution, Distribution, UnspecifiedDistribution}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.execution.{SparkPlan, UnaryExecNode}
import org.apache.spark.sql.internal.SQLConf

/** GROUPED TOP-K as a first-class PHYSICAL operator — the third rung
  * of the extension ladder (beside the rewrite-only rules
  * [[BandedRangeJoin]] / [[MaterializedViewRewrite]] and the native
  * expressions): a custom `LogicalPlan` node, an optimizer `Rule` that
  * recognizes the everyday window spelling, a `Strategy` that plans
  * it, and a `SparkPlan` that executes it with BOUNDED STATE.
  *
  * What it buys: Spark executes
  *
  * {{{ row_number() OVER (PARTITION BY g ORDER BY s) <= k }}}
  *
  * as Exchange → FULL SORT of every row of every group → Window →
  * Filter. This operator keeps a k-row heap per group on BOTH sides
  * of the exchange: the partial exec prunes each input partition to ≤
  * k rows per group BEFORE the shuffle (the top-k analogue of a
  * partial aggregate), the final exec merges heaps and emits rows
  * with their rank. The shuffle carries k·partitions rows per group
  * instead of the group's whole extent, and nothing is ever globally
  * sorted — at 100 TB the difference between "sort the table" and
  * "stream it through k-row heaps". Exactness is the bounded-merge
  * identity: a row outside its partition's per-group top k cannot be
  * in the global top k.
  *
  * The REWRITE is deliberately narrow (the [[BandedRangeJoin]]
  * posture): opt-in via [[GroupedTopK.RewriteConf]], and only the
  * unambiguous pattern — a Filter whose ONLY predicate (beyond an
  * inferred IsNotNull) bounds a lone `row_number()` window column by a
  * literal — is replaced; rank/dense_rank (ties duplicate), extra
  * window functions, or any other use of the rank column keep the
  * stock plan. Users keep the standard SQL text either way.
  */
object GroupedTopK {

  /** Set "true" to arm the rewrite (inert by default). */
  val RewriteConf = "spark.graft.topk.rewrite"

  /** Hard cap on the literal k the rewrite accepts: a giant k makes
    * the per-group heap the problem the operator exists to avoid. */
  val MaxK = 1 << 20

  /** Idempotently hook rule + strategy into an existing session. */
  def install(spark: org.apache.spark.sql.SparkSession): Unit = {
    val curO = spark.experimental.extraOptimizations
    if (!curO.contains(GroupedTopKRewrite))
      spark.experimental.extraOptimizations = curO :+ GroupedTopKRewrite
    val curS = spark.experimental.extraStrategies
    if (!curS.contains(GroupedTopKStrategy))
      spark.experimental.extraStrategies = curS :+ GroupedTopKStrategy
  }
}

/** Logical node: output = child.output :+ the (IntegerType) rank
  * attribute the window alias produced — SAME attribute id, so the
  * swap is invisible to everything above the Filter. */
case class GroupedTopKPlan(
    partitionExprs: Seq[Expression],
    orderSpec: Seq[SortOrder],
    limit: Int,
    rankAttr: Attribute,
    child: LogicalPlan)
    extends logical.UnaryNode {
  override def output: Seq[Attribute] = child.output :+ rankAttr
  override def producedAttributes: AttributeSet = AttributeSet(rankAttr)
  override def maxRows: Option[Long] = child.maxRows
  override protected def withNewChildInternal(newChild: LogicalPlan): GroupedTopKPlan =
    copy(child = newChild)
}

/** Filter(rn <= k, Window(row_number() rn OVER (...))) → GroupedTopKPlan. */
object GroupedTopKRewrite extends Rule[LogicalPlan] with PredicateHelper {

  override def apply(plan: LogicalPlan): LogicalPlan = {
    if (SQLConf.get.getConfString(GroupedTopK.RewriteConf, "false") != "true") return plan
    plan.transformUp {
      case f @ Filter(cond, w: logical.Window) =>
        rewrite(f, cond, w).getOrElse(f)
    }
  }

  private def rewrite(f: Filter, cond: Expression, w: logical.Window): Option[LogicalPlan] = {
    // exactly one window expression: row_number() with a resolved spec
    val (rankAttr, _) = w.windowExpressions match {
      case Seq(a @ Alias(WindowExpression(RowNumber(), spec), _))
          if spec.partitionSpec == w.partitionSpec && spec.orderSpec == w.orderSpec =>
        (a.toAttribute, spec)
      case _ => return None
    }
    // the predicate set must be "rn <= k" (or < k+1), possibly beside
    // an optimizer-inferred IsNotNull(rn) — nothing else
    val conjuncts = splitConjuncts(cond).filterNot {
      case IsNotNull(a: Attribute) => a.exprId == rankAttr.exprId
      case _ => false
    }
    val k: Int = conjuncts match {
      case Seq(LessThanOrEqual(a: Attribute, Literal(v: Int, _)))
          if a.exprId == rankAttr.exprId => v
      case Seq(LessThan(a: Attribute, Literal(v: Int, _)))
          if a.exprId == rankAttr.exprId => v - 1
      case _ => return None
    }
    if (k < 1 || k > GroupedTopK.MaxK) return None
    if (w.orderSpec.isEmpty) return None // row_number needs an order
    // Spark's own InferWindowGroupLimit may already have inserted a
    // WindowGroupLimit below the Window (its partial rank-limit
    // pushdown, planned as Sort + WindowGroupLimit on both shuffle
    // sides). Our operator subsumes it — strip a matching one so the
    // final plan has NO residual sorts.
    val child = w.child match {
      case wgl: logical.WindowGroupLimit
          if wgl.partitionSpec == w.partitionSpec &&
            wgl.orderSpec == w.orderSpec && wgl.limit >= k => wgl.child
      case other => other
    }
    Some(GroupedTopKPlan(w.partitionSpec, w.orderSpec, k, rankAttr, child))
  }

  private def splitConjuncts(e: Expression): Seq[Expression] = e match {
    case And(l, r) => splitConjuncts(l) ++ splitConjuncts(r)
    case other => Seq(other)
  }
}

/** Plans the logical node as partial → (exchange via required
  * distribution) → final. */
object GroupedTopKStrategy extends org.apache.spark.sql.execution.SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case g: GroupedTopKPlan =>
      val pre = GroupedTopKExec(g.partitionExprs, g.orderSpec, g.limit,
        g.rankAttr, partial = true, planLater(g.child))
      GroupedTopKExec(g.partitionExprs, g.orderSpec, g.limit,
        g.rankAttr, partial = false, pre) :: Nil
    case _ => Nil
  }
}

/** The bounded-state executor. Partial: prune each input partition to
  * ≤ k rows per group (no rank — ranks are only known globally).
  * Final: requires clustering on the group keys, merges the pruned
  * streams and emits rows with their 1-based rank.
  *
  * Memory: k copied rows × live groups per task, held in a plain
  * on-heap map with NO spill path — unlike the Sort/HashAggregate
  * operators, which fall back to disk under pressure. That is the
  * deal the opt-in conf signs: right when k·(groups per task) is far
  * below the sort buffer (the top-k regime), wrong for huge k or
  * pathological group cardinality per task — which is why the rewrite
  * caps k ([[GroupedTopK.MaxK]]) and stays conf-gated rather than on
  * by default. */
case class GroupedTopKExec(
    partitionExprs: Seq[Expression],
    orderSpec: Seq[SortOrder],
    limit: Int,
    rankAttr: Attribute,
    partial: Boolean,
    child: SparkPlan)
    extends UnaryExecNode {

  override def output: Seq[Attribute] =
    if (partial) child.output else child.output :+ rankAttr

  override def outputPartitioning = child.outputPartitioning

  // the rank attribute is PRODUCED here (it has no source below) —
  // without this the node reports a missing input and prints as '!'
  override def producedAttributes: AttributeSet = AttributeSet(rankAttr)

  override def requiredChildDistribution: Seq[Distribution] =
    if (partial) Seq(UnspecifiedDistribution)
    else if (partitionExprs.isEmpty) Seq(AllTuples)
    else Seq(ClusteredDistribution(partitionExprs))

  override protected def withNewChildInternal(newChild: SparkPlan): GroupedTopKExec =
    copy(child = newChild)

  override protected def doExecute(): RDD[InternalRow] = {
    val childOutput = child.output
    val pExprs = partitionExprs
    val oSpec = orderSpec
    val k = limit
    val isPartial = partial
    val rank = rankAttr
    child.execute().mapPartitions { iter =>
      val groupProj = UnsafeProjection.create(pExprs, childOutput)
      val ordering = RowOrdering.create(oSpec, childOutput)
      // max-heap on the ordering: peek() is the WORST kept row
      val heaps = new java.util.HashMap[UnsafeRow, java.util.PriorityQueue[InternalRow]]()
      while (iter.hasNext) {
        val row = iter.next()
        val key = groupProj(row)
        var heap = heaps.get(key)
        if (heap == null) {
          heap = new java.util.PriorityQueue[InternalRow](k + 1, ordering.reverse)
          heaps.put(key.copy(), heap)
        }
        if (heap.size() < k) { heap.add(row.copy()); () }
        else if (ordering.compare(row, heap.peek()) < 0) {
          heap.poll(); heap.add(row.copy()); ()
        }
      }
      import scala.jdk.CollectionConverters._
      if (isPartial)
        heaps.values().iterator().asScala.flatMap(_.iterator().asScala)
      else {
        val resultProj = UnsafeProjection.create(childOutput :+ rank, childOutput :+ rank)
        val rankRow = new GenericInternalRow(1)
        val joined = new JoinedRow
        heaps.values().iterator().asScala.flatMap { heap =>
          val rows = heap.toArray(new Array[InternalRow](heap.size()))
          java.util.Arrays.sort(rows, ordering)
          rows.iterator.zipWithIndex.map { case (r, i) =>
            rankRow.setInt(0, i + 1)
            resultProj(joined(r, rankRow))
          }
        }
      }
    }
  }
}
