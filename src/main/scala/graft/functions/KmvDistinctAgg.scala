package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.{AggregateExpression, Complete, TypedImperativeAggregate}
import org.apache.spark.sql.types.{DataType, DoubleType, LongType}

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
  * `('0x' || substr(md5(x),1,15))::BIGINT`). With fewer than k
  * distinct hashes the sketch IS the exact count; otherwise the
  * classic unbiased estimator (k−1) / θ applies, θ = kth smallest
  * hash normalized by the 2^60 hash-space size (Bar-Yossef et al.,
  * "Counting distinct elements in a data stream", RANDOM 2002).
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
    extends TypedImperativeAggregate[java.util.TreeSet[java.lang.Long]] {

  require(k >= 2, s"kmv_distinct: k must be >= 2, got $k")

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = false
  override def dataType: DataType = DoubleType

  // SQL misuse (`kmv_distinct(md5(x), k)` — a string, the natural slip
  // given the md5 bridge convention) must fail at ANALYSIS with a
  // named error, not as a per-task ClassCastException in update()
  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case LongType => org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other => org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"kmv_distinct expects a BIGINT hash (use the md5→long bridge: " +
          s"CAST(conv(substring(md5(x), 1, 15), 16, 10) AS BIGINT)), got ${other.sql}")
    }

  override def createAggregationBuffer(): java.util.TreeSet[java.lang.Long] =
    new java.util.TreeSet[java.lang.Long]()

  private def add(buf: java.util.TreeSet[java.lang.Long], v: Long): Unit = {
    // keep only the k smallest distinct hashes: skip values past the
    // current kth minimum, evict the largest on overflow — O(log k)
    if (buf.size() < k) { buf.add(v); () }
    else if (v < buf.last()) {
      if (buf.add(v)) { buf.pollLast(); () }
    }
  }

  override def update(buf: java.util.TreeSet[java.lang.Long], input: InternalRow)
      : java.util.TreeSet[java.lang.Long] = {
    val h = child.eval(input)
    if (h != null) add(buf, h.asInstanceOf[Long])
    buf
  }

  override def merge(a: java.util.TreeSet[java.lang.Long], b: java.util.TreeSet[java.lang.Long])
      : java.util.TreeSet[java.lang.Long] = {
    val it = b.iterator()
    while (it.hasNext) add(a, it.next())
    a
  }

  /** 2^60 — the hash-space size of the 15-hex-digit md5 prefix. */
  private val HashSpace = 1152921504606846976.0

  override def eval(buf: java.util.TreeSet[java.lang.Long]): Any =
    if (buf.size() < k) buf.size().toDouble
    else (k - 1).toDouble * HashSpace / buf.last().toDouble

  override def serialize(buf: java.util.TreeSet[java.lang.Long]): Array[Byte] = {
    val bb = java.nio.ByteBuffer.allocate(4 + 8 * buf.size())
    bb.putInt(buf.size())
    val it = buf.iterator()
    while (it.hasNext) bb.putLong(it.next())
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): java.util.TreeSet[java.lang.Long] = {
    val bb = java.nio.ByteBuffer.wrap(bytes)
    val n = bb.getInt
    val out = new java.util.TreeSet[java.lang.Long]()
    var i = 0
    while (i < n) { out.add(bb.getLong); i += 1 }
    out
  }

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
    extends TypedImperativeAggregate[java.util.TreeSet[java.lang.Long]] {
  require(k >= 2, s"kmv_sketch: k must be >= 2, got $k")
  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = false
  override def dataType: DataType =
    org.apache.spark.sql.types.ArrayType(LongType, containsNull = false)
  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case LongType => org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other => org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"kmv_sketch expects a BIGINT hash, got ${other.sql}")
    }
  override def createAggregationBuffer(): java.util.TreeSet[java.lang.Long] =
    new java.util.TreeSet[java.lang.Long]()
  private def add(buf: java.util.TreeSet[java.lang.Long], v: Long): Unit = {
    if (buf.size() < k) { buf.add(v); () }
    else if (v < buf.last()) { if (buf.add(v)) { buf.pollLast(); () } }
  }
  override def update(buf: java.util.TreeSet[java.lang.Long], input: InternalRow)
      : java.util.TreeSet[java.lang.Long] = {
    val h = child.eval(input)
    if (h != null) add(buf, h.asInstanceOf[Long])
    buf
  }
  override def merge(a: java.util.TreeSet[java.lang.Long], b: java.util.TreeSet[java.lang.Long])
      : java.util.TreeSet[java.lang.Long] = {
    val it = b.iterator(); while (it.hasNext) add(a, it.next()); a
  }
  override def eval(buf: java.util.TreeSet[java.lang.Long]): Any = {
    val arr = new Array[Any](buf.size())
    val it = buf.iterator(); var i = 0
    while (it.hasNext) { arr(i) = it.next().longValue(); i += 1 }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(arr)
  }
  override def serialize(buf: java.util.TreeSet[java.lang.Long]): Array[Byte] = {
    val bb = java.nio.ByteBuffer.allocate(4 + 8 * buf.size())
    bb.putInt(buf.size())
    val it = buf.iterator()
    while (it.hasNext) bb.putLong(it.next())
    bb.array()
  }
  override def deserialize(bytes: Array[Byte]): java.util.TreeSet[java.lang.Long] = {
    val bb = java.nio.ByteBuffer.wrap(bytes)
    val n = bb.getInt
    val out = new java.util.TreeSet[java.lang.Long]()
    var i = 0
    while (i < n) { out.add(bb.getLong); i += 1 }
    out
  }
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
    extends TypedImperativeAggregate[java.util.TreeSet[java.lang.Long]] {
  require(k >= 2, s"kmv_merge_sketch: k must be >= 2, got $k")
  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = false
  override def dataType: DataType =
    org.apache.spark.sql.types.ArrayType(LongType, containsNull = false)
  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case org.apache.spark.sql.types.ArrayType(LongType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other => org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"kmv_merge_sketch expects an ARRAY<BIGINT> sketch (from kmv_sketch), got ${other.sql}")
    }
  override def createAggregationBuffer(): java.util.TreeSet[java.lang.Long] =
    new java.util.TreeSet[java.lang.Long]()
  private def add(buf: java.util.TreeSet[java.lang.Long], v: Long): Unit = {
    if (buf.size() < k) { buf.add(v); () }
    else if (v < buf.last()) { if (buf.add(v)) { buf.pollLast(); () } }
  }
  override def update(buf: java.util.TreeSet[java.lang.Long], input: InternalRow)
      : java.util.TreeSet[java.lang.Long] = {
    val a = child.eval(input)
    if (a != null) {
      val arr = a.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData]
      var i = 0
      while (i < arr.numElements()) { add(buf, arr.getLong(i)); i += 1 }
    }
    buf
  }
  override def merge(a: java.util.TreeSet[java.lang.Long], b: java.util.TreeSet[java.lang.Long])
      : java.util.TreeSet[java.lang.Long] = {
    val it = b.iterator(); while (it.hasNext) add(a, it.next()); a
  }
  override def eval(buf: java.util.TreeSet[java.lang.Long]): Any = {
    val arr = new Array[Any](buf.size())
    val it = buf.iterator(); var i = 0
    while (it.hasNext) { arr(i) = it.next().longValue(); i += 1 }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(arr)
  }
  override def serialize(buf: java.util.TreeSet[java.lang.Long]): Array[Byte] = {
    val bb = java.nio.ByteBuffer.allocate(4 + 8 * buf.size())
    bb.putInt(buf.size())
    val it = buf.iterator()
    while (it.hasNext) bb.putLong(it.next())
    bb.array()
  }
  override def deserialize(bytes: Array[Byte]): java.util.TreeSet[java.lang.Long] = {
    val bb = java.nio.ByteBuffer.wrap(bytes)
    val n = bb.getInt
    val out = new java.util.TreeSet[java.lang.Long]()
    var i = 0
    while (i < n) { out.add(bb.getLong); i += 1 }
    out
  }
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
    extends TypedImperativeAggregate[java.util.TreeSet[java.lang.Long]] {
  require(k >= 2, s"kmv_merge: k must be >= 2, got $k")
  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = false
  override def dataType: DataType = DoubleType
  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case org.apache.spark.sql.types.ArrayType(LongType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other => org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"kmv_merge expects an ARRAY<BIGINT> sketch (from kmv_sketch), got ${other.sql}")
    }
  override def createAggregationBuffer(): java.util.TreeSet[java.lang.Long] =
    new java.util.TreeSet[java.lang.Long]()
  private def add(buf: java.util.TreeSet[java.lang.Long], v: Long): Unit = {
    if (buf.size() < k) { buf.add(v); () }
    else if (v < buf.last()) { if (buf.add(v)) { buf.pollLast(); () } }
  }
  override def update(buf: java.util.TreeSet[java.lang.Long], input: InternalRow)
      : java.util.TreeSet[java.lang.Long] = {
    val a = child.eval(input)
    if (a != null) {
      val arr = a.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData]
      var i = 0
      while (i < arr.numElements()) { add(buf, arr.getLong(i)); i += 1 }
    }
    buf
  }
  override def merge(a: java.util.TreeSet[java.lang.Long], b: java.util.TreeSet[java.lang.Long])
      : java.util.TreeSet[java.lang.Long] = {
    val it = b.iterator(); while (it.hasNext) add(a, it.next()); a
  }
  private val HashSpace = 1152921504606846976.0
  override def eval(buf: java.util.TreeSet[java.lang.Long]): Any =
    if (buf.size() < k) buf.size().toDouble
    else (k - 1).toDouble * HashSpace / buf.last().toDouble
  override def serialize(buf: java.util.TreeSet[java.lang.Long]): Array[Byte] = {
    val bb = java.nio.ByteBuffer.allocate(4 + 8 * buf.size())
    bb.putInt(buf.size())
    val it = buf.iterator()
    while (it.hasNext) bb.putLong(it.next())
    bb.array()
  }
  override def deserialize(bytes: Array[Byte]): java.util.TreeSet[java.lang.Long] = {
    val bb = java.nio.ByteBuffer.wrap(bytes)
    val n = bb.getInt
    val out = new java.util.TreeSet[java.lang.Long]()
    var i = 0
    while (i < n) { out.add(bb.getLong); i += 1 }
    out
  }
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
