package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.{AggregateExpression, Complete, TypedImperativeAggregate}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, LongType}

/** Shared state machine of the four KMV aggregates: a bottom-k set of
  * distinct 60-bit hashes. ONE implementation of add/merge/serde —
  * the four public aggregates differ only in what they ingest (raw
  * hashes vs sketch arrays) and what they emit (the estimate vs the
  * sketch itself), so those are the only per-subclass methods. The
  * wire format (int32 count + big-endian longs in ascending order) is
  * THE contract between `kmv_sketch` output stored as data and the
  * merge aggregates that later re-ingest it — keeping it in one place
  * is what guarantees the four can never desync.
  */
sealed abstract class KmvBottomKAgg
    extends TypedImperativeAggregate[java.util.TreeSet[java.lang.Long]] {

  def child: Expression
  def k: Int

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = false

  override def createAggregationBuffer(): java.util.TreeSet[java.lang.Long] =
    new java.util.TreeSet[java.lang.Long]()

  /** Keep only the k smallest distinct hashes: skip values past the
    * current kth minimum, evict the largest on overflow — O(log k). */
  protected final def add(buf: java.util.TreeSet[java.lang.Long], v: Long): Unit = {
    if (buf.size() < k) { buf.add(v); () }
    else if (v < buf.last()) {
      if (buf.add(v)) { buf.pollLast(); () }
    }
  }

  override final def merge(a: java.util.TreeSet[java.lang.Long],
                           b: java.util.TreeSet[java.lang.Long])
      : java.util.TreeSet[java.lang.Long] = {
    val it = b.iterator()
    while (it.hasNext) add(a, it.next())
    a
  }

  override final def serialize(buf: java.util.TreeSet[java.lang.Long]): Array[Byte] = {
    val bb = java.nio.ByteBuffer.allocate(4 + 8 * buf.size())
    bb.putInt(buf.size())
    val it = buf.iterator()
    while (it.hasNext) bb.putLong(it.next())
    bb.array()
  }

  override final def deserialize(bytes: Array[Byte]): java.util.TreeSet[java.lang.Long] = {
    val bb = java.nio.ByteBuffer.wrap(bytes)
    val n = bb.getInt
    val out = new java.util.TreeSet[java.lang.Long]()
    var i = 0
    while (i < n) { out.add(bb.getLong); i += 1 }
    out
  }

  // ---- ingest flavors ----------------------------------------------

  /** update() for the raw-hash side (`kmv_distinct`, `kmv_sketch`). */
  protected final def updateFromHash(buf: java.util.TreeSet[java.lang.Long],
                                     input: InternalRow)
      : java.util.TreeSet[java.lang.Long] = {
    val h = child.eval(input)
    if (h != null) add(buf, h.asInstanceOf[Long])
    buf
  }

  /** update() for the sketch-array side (`kmv_merge*`). */
  protected final def updateFromSketch(buf: java.util.TreeSet[java.lang.Long],
                                       input: InternalRow)
      : java.util.TreeSet[java.lang.Long] = {
    val a = child.eval(input)
    if (a != null) {
      val arr = a.asInstanceOf[ArrayData]
      var i = 0
      while (i < arr.numElements()) { add(buf, arr.getLong(i)); i += 1 }
    }
    buf
  }

  /** Analysis-time check for the raw-hash side: SQL misuse
    * (`kmv_distinct(md5(x), k)` — a string, the natural slip given the
    * md5 bridge convention) must fail at ANALYSIS with a named error,
    * not as a per-task ClassCastException in update(). */
  protected final def requireHashInput(fname: String): TypeCheckResult =
    child.dataType match {
      case LongType => TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"$fname expects a BIGINT hash (use the md5→long bridge: " +
          s"CAST(conv(substring(md5(x), 1, 15), 16, 10) AS BIGINT)), got ${other.sql}")
    }

  /** Analysis-time check for the sketch-array side. */
  protected final def requireSketchInput(fname: String): TypeCheckResult =
    child.dataType match {
      case ArrayType(LongType, _) => TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"$fname expects an ARRAY<BIGINT> sketch (from kmv_sketch), got ${other.sql}")
    }

  // ---- emit flavors ------------------------------------------------

  /** 2^60 — the hash-space size of the 15-hex-digit md5 prefix. */
  protected final val HashSpace = 1152921504606846976.0

  /** The classic unbiased estimator (k−1)/θ, θ = kth smallest hash
    * normalized by the hash-space size (Bar-Yossef et al., RANDOM
    * 2002); below k distinct hashes the sketch IS the exact count. */
  protected final def evalEstimate(buf: java.util.TreeSet[java.lang.Long]): Any =
    if (buf.size() < k) buf.size().toDouble
    else (k - 1).toDouble * HashSpace / buf.last().toDouble

  /** The sketch itself as a sorted ARRAY<BIGINT> value. */
  protected final def evalSketch(buf: java.util.TreeSet[java.lang.Long]): Any = {
    val arr = new Array[Any](buf.size())
    val it = buf.iterator(); var i = 0
    while (it.hasNext) { arr(i) = it.next().longValue(); i += 1 }
    new GenericArrayData(arr)
  }
}

/** KMV (k-minimum-values) distinct-count sketch — a MERGEABLE
  * bounded-state alternative to exact `COUNT(DISTINCT x)`: the exact
  * form shuffles every distinct value to its group; this shuffles at
  * most k longs per (group, partition) no matter how many distinct
  * values exist — the cardinality-estimation shape that matters at
  * corpus scale (same role as the reference ecosystem's HLL counters,
  * but with a closed-form, engine-mirrorable estimator).
  *
  * State is the k smallest DISTINCT values of a uniform 60-bit hash
  * (callers feed `conv(substr(md5(x),1,15),16,10)` — the repo's
  * standard md5→long bridge, mirrored in DuckDB as
  * `('0x' || substr(md5(x),1,15))::BIGINT`).
  *
  * Determinism: the estimate is one IEEE-754 double division of two
  * exactly-representable operands ((k−1)·2^60 needs ≤ 6 significand
  * bits; θ rounds long→double identically in the JVM and C++), so the
  * DuckDB oracle's value hash matches bit-for-bit.
  */
case class KmvDistinctAgg(
    child: Expression,
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
    extends KmvBottomKAgg {
  require(k >= 2, s"kmv_distinct: k must be >= 2, got $k")
  override def dataType: DataType = DoubleType
  override def checkInputDataTypes(): TypeCheckResult = requireHashInput("kmv_distinct")
  override def update(buf: java.util.TreeSet[java.lang.Long], input: InternalRow)
      : java.util.TreeSet[java.lang.Long] = updateFromHash(buf, input)
  override def eval(buf: java.util.TreeSet[java.lang.Long]): Any = evalEstimate(buf)
  override def withNewMutableAggBufferOffset(newOffset: Int): KmvDistinctAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): KmvDistinctAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(newChildren: IndexedSeq[Expression]): KmvDistinctAgg =
    copy(child = newChildren.head)
  override def prettyName: String = "kmv_distinct"
}

/** The SKETCH-VALUED sibling of [[KmvDistinctAgg]]: same k-minimum
  * state, but `eval` returns the sorted hash array itself instead of
  * the estimate — so sketches become DATA that a query can store
  * (daily partials) and re-aggregate later ([[KmvMergeAgg]]). The
  * merge is EXACT: bottom-k of a union of bottom-k sets equals the
  * bottom-k of the union, so a rollup of sketches estimates exactly
  * what a direct sketch of the union would. */
case class KmvSketchAgg(
    child: Expression,
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
    extends KmvBottomKAgg {
  require(k >= 2, s"kmv_sketch: k must be >= 2, got $k")
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def checkInputDataTypes(): TypeCheckResult = requireHashInput("kmv_sketch")
  override def update(buf: java.util.TreeSet[java.lang.Long], input: InternalRow)
      : java.util.TreeSet[java.lang.Long] = updateFromHash(buf, input)
  override def eval(buf: java.util.TreeSet[java.lang.Long]): Any = evalSketch(buf)
  override def withNewMutableAggBufferOffset(newOffset: Int): KmvSketchAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): KmvSketchAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(newChildren: IndexedSeq[Expression]): KmvSketchAgg =
    copy(child = newChildren.head)
  override def prettyName: String = "kmv_sketch"
}

/** Merges [[KmvSketchAgg]] arrays into a MERGED SKETCH (not an
  * estimate) — the intermediate level of a rollup TREE: daily sketches
  * → weekly sketches → … → final estimate ([[KmvMergeAgg]]). Exact at
  * every level: bottom-k of a union of bottom-k sets is the union's
  * bottom-k, so any rollup shape yields the same sketch as a direct
  * pass. */
case class KmvMergeSketchAgg(
    child: Expression,
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
    extends KmvBottomKAgg {
  require(k >= 2, s"kmv_merge_sketch: k must be >= 2, got $k")
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def checkInputDataTypes(): TypeCheckResult = requireSketchInput("kmv_merge_sketch")
  override def update(buf: java.util.TreeSet[java.lang.Long], input: InternalRow)
      : java.util.TreeSet[java.lang.Long] = updateFromSketch(buf, input)
  override def eval(buf: java.util.TreeSet[java.lang.Long]): Any = evalSketch(buf)
  override def withNewMutableAggBufferOffset(newOffset: Int): KmvMergeSketchAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): KmvMergeSketchAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(newChildren: IndexedSeq[Expression]): KmvMergeSketchAgg =
    copy(child = newChildren.head)
  override def prettyName: String = "kmv_merge_sketch"
}

/** Re-aggregates [[KmvSketchAgg]] arrays (the rollup side of
  * partial-aggregation-as-data): folds every element of every input
  * sketch through the same bottom-k state and evaluates the
  * [[KmvDistinctAgg]] estimator. */
case class KmvMergeAgg(
    child: Expression,
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
    extends KmvBottomKAgg {
  require(k >= 2, s"kmv_merge: k must be >= 2, got $k")
  override def dataType: DataType = DoubleType
  override def checkInputDataTypes(): TypeCheckResult = requireSketchInput("kmv_merge")
  override def update(buf: java.util.TreeSet[java.lang.Long], input: InternalRow)
      : java.util.TreeSet[java.lang.Long] = updateFromSketch(buf, input)
  override def eval(buf: java.util.TreeSet[java.lang.Long]): Any = evalEstimate(buf)
  override def withNewMutableAggBufferOffset(newOffset: Int): KmvMergeAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): KmvMergeAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(newChildren: IndexedSeq[Expression]): KmvMergeAgg =
    copy(child = newChildren.head)
  override def prettyName: String = "kmv_merge"
}

object KmvDistinctAgg {
  import org.apache.spark.sql.GraftBridge

  /** Column API: `kmv_distinct(hash60, k)` inside an `agg(...)`. */
  def kmv_distinct(c: Column, k: Int): Column =
    GraftBridge.toColumn(AggregateExpression(
      KmvDistinctAgg(GraftBridge.toExpression(c), k), Complete, isDistinct = false))

  /** Column API: `kmv_sketch(hash60, k)` — the sketch as a value. */
  def kmv_sketch(c: Column, k: Int): Column =
    GraftBridge.toColumn(AggregateExpression(
      KmvSketchAgg(GraftBridge.toExpression(c), k), Complete, isDistinct = false))

  /** Column API: `kmv_merge_estimate(sketch, k)` — rollup of sketches. */
  def kmv_merge_estimate(c: Column, k: Int): Column =
    GraftBridge.toColumn(AggregateExpression(
      KmvMergeAgg(GraftBridge.toExpression(c), k), Complete, isDistinct = false))

  /** Column API: `kmv_merge_sketch(sketch, k)` — sketch-valued merge,
    * the intermediate level of a rollup tree. */
  def kmv_merge_sketch(c: Column, k: Int): Column =
    GraftBridge.toColumn(AggregateExpression(
      KmvMergeSketchAgg(GraftBridge.toExpression(c), k), Complete, isDistinct = false))

  /** The estimator's DuckDB mirror for an input hashed the standard
    * way (`hashSql` must be the md5→60-bit-long bridge of the SAME
    * expression the Spark side hashes). */
  def oracleSql(table: String, groupCols: Seq[String], hashSql: String, k: Int,
                estAlias: String, where: String = ""): String = {
    val g = groupCols.mkString(", ")
    s"""SELECT $g,
       | CASE WHEN count(*) < $k THEN CAST(count(*) AS DOUBLE)
       |      ELSE ($k - 1) * 1152921504606846976.0 / CAST(max(h) AS DOUBLE) END AS $estAlias
       |FROM (
       |  SELECT $g, h, row_number() OVER (PARTITION BY $g ORDER BY h) AS rn
       |  FROM (SELECT DISTINCT $g, $hashSql AS h FROM $table $where)
       |) WHERE rn <= $k
       |GROUP BY $g""".stripMargin
  }
}
