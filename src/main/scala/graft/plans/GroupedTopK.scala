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
  * inferred IsNotNull) bounds a lone rank-family window column by a
  * literal — is replaced. All three rank spellings compile:
  * `row_number()` (exactly k rows per group), `rank()` (boundary ties
  * kept, gap ranks), and `dense_rank()` (every row of the k best
  * DISTINCT order-value classes — rows per group unbounded by k, so
  * its keep-set bounds CLASSES and the row budget's flush/spill
  * machinery bounds memory). Extra window functions or any other use
  * of the rank column keep the stock plan. Users keep the standard
  * SQL text either way.
  */
object GroupedTopK {

  /** Set "true" to arm the rewrite (inert by default). With the
    * per-task row budget (partial flush / final spill) and the
    * ties-aware rank() mode, the operator is memory-safe on any input
    * — the remaining reason it ships opt-in is PLAN STABILITY, not
    * safety: arming it swaps executed plans under existing queries,
    * which a library should not do silently under a version bump. */
  val RewriteConf = "spark.graft.topk.rewrite"

  /** Hard cap on the literal k the rewrite accepts: a giant k makes
    * the per-group heap the problem the operator exists to avoid. */
  val MaxK = 1 << 20

  /** Per-task kept-row budget before the exec stops trusting memory:
    * the partial side FLUSHES its heaps downstream and restarts (the
    * prune is an optimization — a flushed superset is still correct),
    * the final side SPILLS key-sorted runs to local disk and
    * merge-groups them at the end. Both paths keep exact answers with
    * bounded memory, which is what makes the operator safe beyond the
    * happy k·groups-fits regime. */
  val TaskRowBudgetConf = "spark.graft.topk.taskRowBudget"
  val DefaultTaskRowBudget: Long = 4L * 1024 * 1024

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
  * swap is invisible to everything above the Filter. `ties = false`
  * is the `row_number` reading (exactly k rows per group); `ties =
  * true` is the `rank` reading (every row tying at the k-th boundary
  * is kept and ranks carry gaps).
  *
  * The k bounds are REQUIRED ON THE NODE, not just checked by the
  * Filter-pattern rewrite — a programmatic construction cannot bypass
  * them. */
case class GroupedTopKPlan(
    partitionExprs: Seq[Expression],
    orderSpec: Seq[SortOrder],
    limit: Int,
    rankAttr: Attribute,
    child: LogicalPlan,
    ties: Boolean = false,
    dense: Boolean = false)
    extends logical.UnaryNode {
  require(limit >= 1 && limit <= GroupedTopK.MaxK,
    s"GroupedTopKPlan limit must be in [1, ${GroupedTopK.MaxK}], got $limit")
  require(!(ties && dense), "ties (rank) and dense (dense_rank) are exclusive modes")
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
    // exactly one window expression with a resolved spec: row_number()
    // (exact-k), rank() (ties kept, gap ranks) or dense_rank() (k
    // distinct classes, rows-per-group unbounded — the keep-set
    // bounds classes and the row budget bounds memory)
    val (rankAttr, ties, dense) = w.windowExpressions match {
      case Seq(a @ Alias(WindowExpression(RowNumber(), spec), _))
          if spec.partitionSpec == w.partitionSpec && spec.orderSpec == w.orderSpec =>
        (a.toAttribute, false, false)
      case Seq(a @ Alias(WindowExpression(_: Rank, spec), _))
          if spec.partitionSpec == w.partitionSpec && spec.orderSpec == w.orderSpec =>
        (a.toAttribute, true, false)
      case Seq(a @ Alias(WindowExpression(_: DenseRank, spec), _))
          if spec.partitionSpec == w.partitionSpec && spec.orderSpec == w.orderSpec =>
        (a.toAttribute, false, true)
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
    Some(GroupedTopKPlan(w.partitionSpec, w.orderSpec, k, rankAttr, child, ties, dense))
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
      val budget = SQLConf.get.getConfString(GroupedTopK.TaskRowBudgetConf,
        GroupedTopK.DefaultTaskRowBudget.toString).toLong
      val pre = GroupedTopKExec(g.partitionExprs, g.orderSpec, g.limit,
        g.rankAttr, partial = true, planLater(g.child), g.ties, budget, g.dense)
      GroupedTopKExec(g.partitionExprs, g.orderSpec, g.limit,
        g.rankAttr, partial = false, pre, g.ties, budget, g.dense) :: Nil
    case _ => Nil
  }
}

/** The bounded-state executor. Partial: prune each input partition to
  * the per-group top set (no rank — ranks are only known globally).
  * Final: requires clustering on the group keys, merges the pruned
  * streams and emits rows with their 1-based rank (gap ranks in
  * `ties` mode, `row_number` semantics otherwise).
  *
  * Memory is BUDGETED (`rowBudget` kept rows per task), so pressure
  * degrades instead of OOMing:
  *
  *  - the partial side FLUSHES its heaps downstream and restarts — a
  *    flushed superset is still a correct prune (any globally-top row
  *    is in the top set of every chunk that contains it);
  *  - the final side SPILLS its heaps as a group-key-sorted run to
  *    local disk and merge-groups all runs at the end — exact
  *    answers, ≤ budget rows in memory, the same deal the stock
  *    Sort makes.
  */
case class GroupedTopKExec(
    partitionExprs: Seq[Expression],
    orderSpec: Seq[SortOrder],
    limit: Int,
    rankAttr: Attribute,
    partial: Boolean,
    child: SparkPlan,
    ties: Boolean = false,
    rowBudget: Long = GroupedTopK.DefaultTaskRowBudget,
    dense: Boolean = false)
    extends UnaryExecNode {

  require(limit >= 1 && limit <= GroupedTopK.MaxK,
    s"GroupedTopKExec limit must be in [1, ${GroupedTopK.MaxK}], got $limit")
  require(rowBudget >= limit,
    s"rowBudget ($rowBudget) must be >= limit ($limit) — one group's keep-set must fit")
  require(!(ties && dense), "ties (rank) and dense (dense_rank) are exclusive modes")

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
    val keepTies = ties
    val keepDense = dense
    val budget = rowBudget
    val nFields = childOutput.size
    val nKeyFields = pExprs.size
    child.execute().mapPartitions { iter =>
      val groupProj = UnsafeProjection.create(pExprs, childOutput)
      val toUnsafe = UnsafeProjection.create(childOutput.map(_.dataType).toArray)
      val ordering = RowOrdering.create(oSpec, childOutput)

      sealed trait KeepSet {
        /** Fold one row in; returns the net kept-row-count change. */
        def add(row: InternalRow): Int
        def rows: Iterator[InternalRow]
      }

      /** One group's keep-set: a max-heap (peek = worst kept row).
        * Exact-k mode keeps ≤ k rows; ties mode keeps every row whose
        * gap-rank is ≤ k (k + boundary ties — pruned lazily so the
        * invariant "every kept row has < k kept rows strictly better"
        * always holds). Returns the net row-count change. */
      final class Keep extends KeepSet {
        val heap = new java.util.PriorityQueue[InternalRow](k + 1, ordering.reverse)
        override def rows: Iterator[InternalRow] = {
          import scala.jdk.CollectionConverters._
          heap.iterator().asScala
        }
        override def add(row: InternalRow): Int =
          if (heap.size() < k) { heap.add(row.copy()); 1 }
          else {
            val cmp = ordering.compare(row, heap.peek())
            if (!keepTies) {
              if (cmp < 0) { heap.poll(); heap.add(row.copy()); 0 } else 0
            } else if (cmp > 0) 0
            else if (cmp == 0) { heap.add(row.copy()); 1 } // ties the worst kept row
            else { // strictly better: add, then evict the worst tie-class if safe
              heap.add(row.copy())
              var delta = 1
              var pruning = true
              while (pruning) {
                val worst = heap.peek()
                val buf = new java.util.ArrayList[InternalRow]()
                while (heap.size() > 0 && ordering.compare(heap.peek(), worst) == 0) {
                  buf.add(heap.poll()); ()
                }
                if (heap.size() >= k) delta -= buf.size() // rank(worst) > k: drop the class
                else { heap.addAll(buf); pruning = false }
              }
              delta
            }
          }
      }

      /** dense_rank keep-set: the k best DISTINCT order-value CLASSES
        * (rows within a kept class are unbounded by k — the task row
        * budget's flush/spill machinery bounds memory instead). A
        * TreeMap under the row ordering buckets ties into one class;
        * a new class evicts the worst whole class once k exist. */
      final class DenseKeep extends KeepSet {
        private val classes =
          new java.util.TreeMap[InternalRow, java.util.ArrayList[InternalRow]](ordering)
        override def add(row: InternalRow): Int = {
          val existing = classes.get(row)
          if (existing != null) { existing.add(row.copy()); 1 }
          else if (classes.size() < k) {
            val c = row.copy()
            val l = new java.util.ArrayList[InternalRow](); l.add(c)
            classes.put(c, l); 1
          } else if (ordering.compare(row, classes.lastKey()) < 0) {
            val dropped = classes.remove(classes.lastKey()).size()
            val c = row.copy()
            val l = new java.util.ArrayList[InternalRow](); l.add(c)
            classes.put(c, l); 1 - dropped
          } else 0
        }
        override def rows: Iterator[InternalRow] = {
          import scala.jdk.CollectionConverters._
          classes.values().iterator().asScala.flatMap(_.iterator().asScala)
        }
      }

      def newKeep(): KeepSet = if (keepDense) new DenseKeep else new Keep

      val heaps = new java.util.HashMap[UnsafeRow, KeepSet]()
      var kept = 0L
      def insert(row: InternalRow): Unit = {
        val key = groupProj(row)
        var keep = heaps.get(key)
        if (keep == null) { keep = newKeep(); heaps.put(key.copy(), keep) }
        kept += keep.add(row)
      }

      import scala.jdk.CollectionConverters._
      def drain(): Iterator[InternalRow] = {
        val out = heaps.values().asScala.toArray.iterator.flatMap(_.rows)
        heaps.clear(); kept = 0
        out
      }

      if (isPartial) {
        // streaming chunks: consume until budget breach or input end,
        // flush, repeat — memory ≤ budget kept rows at all times
        new Iterator[InternalRow] {
          private var cur: Iterator[InternalRow] = Iterator.empty
          private var done = false
          override def hasNext: Boolean = {
            while (!cur.hasNext && !done) {
              while (iter.hasNext && kept <= budget) insert(iter.next())
              done = !iter.hasNext
              cur = drain()
            }
            cur.hasNext
          }
          override def next(): InternalRow = { if (!hasNext) throw new NoSuchElementException; cur.next() }
        }
      } else {
        // FINAL: all of a group's candidates are in this task (the
        // exchange clustered on the group keys), but groups arrive
        // interleaved — accumulate per-group keep-sets, spilling
        // key-sorted runs when the budget breaks
        val spills = new java.util.ArrayList[java.io.File]()
        // runs sort by (group key, ORDER SPEC): the merge then delivers
        // each group's rows already in rank order, so ranks stream with
        // O(1) memory — no per-group re-fold, whose keep-set a giant
        // boundary tie class (rank() over a low-cardinality order key)
        // could legitimately grow to the WHOLE group
        val sortA = new UnsafeRow(nFields); val sortB = new UnsafeRow(nFields)
        def compareEntry(ak: Array[Byte], ar: Array[Byte],
                         bk: Array[Byte], br: Array[Byte]): Int = {
          val c = java.util.Arrays.compareUnsigned(ak, bk)
          if (c != 0) c
          else {
            sortA.pointTo(ar, ar.length); sortB.pointTo(br, br.length)
            ordering.compare(sortA, sortB)
          }
        }
        def spillRun(): Unit = {
          val entries = heaps.entrySet().asScala.iterator.flatMap { e =>
            val kb = e.getKey.getBytes
            e.getValue.rows.map(r => (kb, toUnsafe(r).copy().getBytes))
          }.toArray
          java.util.Arrays.sort(entries,
            (a: (Array[Byte], Array[Byte]), b: (Array[Byte], Array[Byte])) =>
              compareEntry(a._1, a._2, b._1, b._2))
          val f = java.io.File.createTempFile("graft_topk_spill", ".run")
          f.deleteOnExit()
          val out = new java.io.DataOutputStream(new java.io.BufferedOutputStream(
            new java.io.FileOutputStream(f), 1 << 16))
          try entries.foreach { case (kb, rb) =>
            out.writeInt(kb.length); out.write(kb)
            out.writeInt(rb.length); out.write(rb)
          } finally out.close()
          spills.add(f); ()
        }
        Option(org.apache.spark.TaskContext.get()).foreach(
          _.addTaskCompletionListener[Unit](_ =>
            spills.asScala.foreach { f => f.delete(); () }))

        while (iter.hasNext) {
          insert(iter.next())
          if (kept > budget) { spillRun(); heaps.clear(); kept = 0 }
        }

        val resultProj = UnsafeProjection.create(childOutput :+ rank, childOutput :+ rank)
        val rankRow = new GenericInternalRow(1)
        val joined = new JoinedRow
        /** Emit one completed group: sort, then rank per mode —
          * row_number position, gap rank, or dense class index. */
        def emit(keep: KeepSet): Iterator[InternalRow] = {
          val rows = keep.rows.toArray
          java.util.Arrays.sort(rows, ordering)
          var r = 0
          rows.iterator.zipWithIndex.map { case (row, i) =>
            val boundary = i == 0 || ordering.compare(row, rows(i - 1)) != 0
            if (keepDense) { if (boundary) r += 1 }
            else if (!keepTies) r = i + 1
            else if (boundary) r = i + 1
            rankRow.setInt(0, r)
            resultProj(joined(row, rankRow))
          }.filter { _ => r <= k } // belt: the keep-set invariant already bounds ranks at k
        }

        if (spills.isEmpty)
          heaps.values().iterator().asScala.flatMap(emit)
        else {
          // k-way merge of the (key, orderSpec)-sorted runs + the
          // in-memory remainder (written as one more run for
          // uniformity): rows arrive per group IN RANK ORDER, so the
          // rank streams — position plus tie-class boundary — and
          // emission is O(1) memory even when an entire group
          // legitimately ties at the k-th boundary (the case a
          // re-folded per-group keep-set would have to hold whole)
          if (kept > 0) spillRun()
          final class Run(f: java.io.File) {
            private val in = new java.io.DataInputStream(new java.io.BufferedInputStream(
              new java.io.FileInputStream(f), 1 << 16))
            var key: Array[Byte] = _
            var row: Array[Byte] = _
            advance()
            def advance(): Unit = {
              try {
                val kl = in.readInt(); val kb = new Array[Byte](kl); in.readFully(kb)
                val rl = in.readInt(); val rb = new Array[Byte](rl); in.readFully(rb)
                key = kb; row = rb
              } catch { case _: java.io.EOFException => key = null; row = null; in.close() }
            }
          }
          val runs = spills.asScala.map(new Run(_)).filter(_.key != null)
          val pq = new java.util.PriorityQueue[Run](math.max(1, runs.size),
            (a: Run, b: Run) => compareEntry(a.key, a.row, b.key, b.row))
          runs.foreach { r => pq.add(r); () }
          new Iterator[InternalRow] {
            private var curKey: Array[Byte] = null
            private var pos = 0
            private var r = 0
            private var prev: UnsafeRow = null // last row of the current group (owned bytes)
            private val cur = new UnsafeRow(nFields)
            private var pending: InternalRow = null
            private def advanceToEmit(): Unit = {
              while (pending == null && !pq.isEmpty) {
                val run = pq.poll()
                val keyBytes = run.key; val rowBytes = run.row
                run.advance()
                if (run.key != null) { pq.add(run); () }
                if (curKey == null ||
                    java.util.Arrays.compareUnsigned(keyBytes, curKey) != 0) {
                  curKey = keyBytes; pos = 0; r = 0; prev = null
                }
                pos += 1
                cur.pointTo(rowBytes, rowBytes.length)
                val boundary = prev == null || ordering.compare(cur, prev) != 0
                if (keepDense) { if (boundary) r += 1 }
                else if (!keepTies) r = pos
                else if (boundary) r = pos
                if (keepTies || keepDense) {
                  // rowBytes is a fresh per-record array — safe to own
                  if (prev == null) prev = new UnsafeRow(nFields)
                  prev.pointTo(rowBytes, rowBytes.length)
                }
                if (r <= k) {
                  rankRow.setInt(0, r)
                  pending = resultProj(joined(cur, rankRow))
                }
                // r > k: skip — the run may carry flushed-superset rows
              }
            }
            override def hasNext: Boolean = { advanceToEmit(); pending != null }
            override def next(): InternalRow = {
              if (!hasNext) throw new NoSuchElementException
              val out = pending; pending = null; out
            }
          }
        }
      }
    }
  }
}
