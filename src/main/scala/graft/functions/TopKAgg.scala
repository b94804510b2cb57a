package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.{AggregateExpression, Complete, TypedImperativeAggregate}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._

/** EXACT mergeable grouped top-k — the aggregate that changes the
  * SHUFFLE SHAPE of "top k rows per group": the window formulation
  * (`row_number() OVER (PARTITION BY g ORDER BY s DESC) <= k`)
  * shuffles and sorts EVERY row of every group; this aggregate keeps a
  * bounded k-pair buffer per (group, partition), so map-side combine
  * reduces each partition's contribution to ≤ k pairs BEFORE the
  * exchange — at 100 TB the shuffle carries k·partitions rows instead
  * of the table. Exactness is the bounded-merge identity (same as the
  * KMV bottom-k): top-k of a union of per-partition top-k sets IS the
  * union's top-k, because a row outside its own partition's top k can
  * never be in the global top k.
  *
  * Ordering: score DESC, id ASC on ties — a TOTAL order when `id` is
  * unique (the caller's contract), so results are deterministic and
  * the window-formulation oracle matches row-for-row. Pairs with
  * identical (score, id) collapse (set semantics on the total order),
  * which under the unique-id contract is the identity.
  *
  * NULL handling: rows with a NULL score or id are IGNORED (SQL
  * aggregate semantics), which DIVERGES from the window formulation —
  * `ORDER BY score DESC` is NULLS LAST in Spark, so the window keeps
  * NULL-score rows when a group has fewer than k non-null ones. Feed
  * `coalesce(score, Long.MinValue)` if NULL rows must rank.
  */
case class TopKPairsAgg(
    score: Expression,
    id: Expression,
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[java.util.TreeSet[(Long, Long)]] {

  require(k >= 1, s"topk_pairs: k must be >= 1, got $k")

  override def children: Seq[Expression] = Seq(score, id)
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(
    StructType(Seq(StructField("score", LongType, nullable = false),
      StructField("id", LongType, nullable = false))), containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult =
    (score.dataType, id.dataType) match {
      case (LongType, LongType) => TypeCheckResult.TypeCheckSuccess
      case (s, i) => TypeCheckResult.TypeCheckFailure(
        s"topk_pairs expects (BIGINT score, BIGINT id), got (${s.sql}, ${i.sql})")
    }

  /** score DESC, id ASC — buffer.last() is the WORST kept pair.
    * (A named Serializable class, NOT a lambda: the comparator rides
    * inside the TreeSet buffer, which Spark serializes with the task.) */
  private def ord: java.util.Comparator[(Long, Long)] = TopKPairsAgg.PairOrd

  override def createAggregationBuffer(): java.util.TreeSet[(Long, Long)] =
    new java.util.TreeSet[(Long, Long)](ord)

  private def add(buf: java.util.TreeSet[(Long, Long)], p: (Long, Long)): Unit = {
    if (buf.size() < k) { buf.add(p); () }
    else if (ord.compare(p, buf.last()) < 0) {
      if (buf.add(p)) { buf.pollLast(); () }
    }
  }

  override def update(buf: java.util.TreeSet[(Long, Long)], input: InternalRow)
      : java.util.TreeSet[(Long, Long)] = {
    val s = score.eval(input)
    val i = id.eval(input)
    if (s != null && i != null)
      add(buf, (s.asInstanceOf[Long], i.asInstanceOf[Long]))
    buf
  }

  override def merge(a: java.util.TreeSet[(Long, Long)],
                     b: java.util.TreeSet[(Long, Long)])
      : java.util.TreeSet[(Long, Long)] = {
    val it = b.iterator()
    while (it.hasNext) add(a, it.next())
    a
  }

  override def eval(buf: java.util.TreeSet[(Long, Long)]): Any = {
    val arr = new Array[Any](buf.size())
    val it = buf.iterator(); var i = 0
    while (it.hasNext) {
      val p = it.next()
      arr(i) = InternalRow(p._1, p._2); i += 1
    }
    new GenericArrayData(arr)
  }

  override def serialize(buf: java.util.TreeSet[(Long, Long)]): Array[Byte] = {
    val bb = java.nio.ByteBuffer.allocate(4 + 16 * buf.size())
    bb.putInt(buf.size())
    val it = buf.iterator()
    while (it.hasNext) { val p = it.next(); bb.putLong(p._1); bb.putLong(p._2) }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): java.util.TreeSet[(Long, Long)] = {
    val bb = java.nio.ByteBuffer.wrap(bytes)
    val n = bb.getInt
    val out = createAggregationBuffer()
    var i = 0
    while (i < n) { out.add((bb.getLong, bb.getLong)); i += 1 }
    out
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): TopKPairsAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): TopKPairsAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(newChildren: IndexedSeq[Expression]): TopKPairsAgg =
    copy(score = newChildren(0), id = newChildren(1))
  override def prettyName: String = "topk_pairs"
}

object TopKPairsAgg {
  /** score DESC, id ASC total order. */
  object PairOrd extends java.util.Comparator[(Long, Long)] with Serializable {
    override def compare(a: (Long, Long), b: (Long, Long)): Int =
      if (a._1 != b._1) java.lang.Long.compare(b._1, a._1)
      else java.lang.Long.compare(a._2, b._2)
  }
}

/** Re-aggregates [[TopKPairsAgg]] arrays — top-k AS DATA, the rollup
  * side of partial-aggregation-as-data (the [[graft.functions.KmvMergeSketchAgg]]
  * pattern applied to rankings): persist per-day top-k arrays, merge
  * them later into the month's top-k WITHOUT re-reading raw rows.
  * EXACT at every level by the same bounded-merge identity — top-k of
  * a union of top-k sets is the union's top-k — so a rollup tree of
  * any shape yields the same ranking as a direct pass. */
case class TopKMergeAgg(
    child: Expression,
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[java.util.TreeSet[(Long, Long)]] {

  require(k >= 1, s"topk_merge: k must be >= 1, got $k")

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(
    StructType(Seq(StructField("score", LongType, nullable = false),
      StructField("id", LongType, nullable = false))), containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(st: StructType, _)
        if st.fields.length == 2 && st.fields.forall(_.dataType == LongType) =>
      TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"topk_merge expects ARRAY<STRUCT<BIGINT, BIGINT>> (from topk_pairs), got ${other.sql}")
  }

  private def ord = TopKPairsAgg.PairOrd
  override def createAggregationBuffer(): java.util.TreeSet[(Long, Long)] =
    new java.util.TreeSet[(Long, Long)](ord)

  private def add(buf: java.util.TreeSet[(Long, Long)], p: (Long, Long)): Unit = {
    if (buf.size() < k) { buf.add(p); () }
    else if (ord.compare(p, buf.last()) < 0) {
      if (buf.add(p)) { buf.pollLast(); () }
    }
  }

  override def update(buf: java.util.TreeSet[(Long, Long)], input: InternalRow)
      : java.util.TreeSet[(Long, Long)] = {
    val a = child.eval(input)
    if (a != null) {
      val arr = a.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData]
      var i = 0
      while (i < arr.numElements()) {
        // arrays round-tripped through parquet/tables come back with
        // nullable elements and fields — skip NULLs (the same "ignored"
        // contract as topk_pairs) instead of NPEing or ranking a 0
        if (!arr.isNullAt(i)) {
          val s = arr.getStruct(i, 2)
          if (!s.isNullAt(0) && !s.isNullAt(1))
            add(buf, (s.getLong(0), s.getLong(1)))
        }
        i += 1
      }
    }
    buf
  }

  override def merge(a: java.util.TreeSet[(Long, Long)],
                     b: java.util.TreeSet[(Long, Long)])
      : java.util.TreeSet[(Long, Long)] = {
    val it = b.iterator()
    while (it.hasNext) add(a, it.next())
    a
  }

  override def eval(buf: java.util.TreeSet[(Long, Long)]): Any = {
    val arr = new Array[Any](buf.size())
    val it = buf.iterator(); var i = 0
    while (it.hasNext) {
      val p = it.next()
      arr(i) = InternalRow(p._1, p._2); i += 1
    }
    new GenericArrayData(arr)
  }

  override def serialize(buf: java.util.TreeSet[(Long, Long)]): Array[Byte] = {
    val bb = java.nio.ByteBuffer.allocate(4 + 16 * buf.size())
    bb.putInt(buf.size())
    val it = buf.iterator()
    while (it.hasNext) { val p = it.next(); bb.putLong(p._1); bb.putLong(p._2) }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): java.util.TreeSet[(Long, Long)] = {
    val bb = java.nio.ByteBuffer.wrap(bytes)
    val n = bb.getInt
    val out = createAggregationBuffer()
    var i = 0
    while (i < n) { out.add((bb.getLong, bb.getLong)); i += 1 }
    out
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): TopKMergeAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): TopKMergeAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(newChildren: IndexedSeq[Expression]): TopKMergeAgg =
    copy(child = newChildren.head)
  override def prettyName: String = "topk_merge"
}

object TopKAgg {
  import org.apache.spark.sql.GraftBridge

  /** Column API: `topk_pairs(score, id, k)` inside an `agg(...)` —
    * returns ARRAY<STRUCT<score, id>> in rank order (score DESC, id
    * ASC), ready for `posexplode`. */
  def topk_pairs(score: Column, id: Column, k: Int): Column =
    GraftBridge.toColumn(AggregateExpression(
      TopKPairsAgg(GraftBridge.toExpression(score), GraftBridge.toExpression(id), k),
      Complete, isDistinct = false))

  /** Column API: `topk_merge(topArray, k)` — rollup of stored
    * [[topk_pairs]] arrays (daily partials → monthly ranking). */
  def topk_merge(c: Column, k: Int): Column =
    GraftBridge.toColumn(AggregateExpression(
      TopKMergeAgg(GraftBridge.toExpression(c), k),
      Complete, isDistinct = false))
}
