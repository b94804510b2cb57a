package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.{AggregateExpression, Complete, TypedImperativeAggregate}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/** MERGEABLE QUANTILE SKETCH as data — the quantile twin of the KMV
  * rollup tree ([[KmvDistinctAgg]]): persist per-day sketches, derive
  * weekly/monthly percentiles WITHOUT re-reading raw events.
  *
  * Representation: a QUANTIZED HISTOGRAM over integer-scaled values —
  * bucket = value >> shift (arithmetic shift ≡ floor division by
  * 2^shift, identical to DuckDB's `//`), state = sorted (bucket →
  * count). The caller bounds state by choosing `shift` against the
  * value domain (e.g. e2-scaled amounts in [0, 5e4] at shift 4 →
  * ≤ ~3·10³ buckets, a few KB per group), exactly as it already
  * chooses the decimal scale for exact folds.
  *
  * Why not KLL/t-digest: those trade DETERMINISM for rank-error
  * bounds — their state depends on sampling randomness or merge
  * order, so two runs (or Spark vs the DuckDB oracle) can disagree
  * at the ulp that flips a gated hash. The quantized histogram is the
  * opposite trade: ZERO rank error and bit-exact mergeability (count
  * addition is associative+commutative), with a bounded VALUE error
  * (≤ 2^shift quantization units) that the caller sets explicitly.
  * Same discipline as the repo's scaled-integer revenue folds.
  *
  * Three flavors mirroring the KMV surface:
  *  - `q_sketch(vLong, shift)`       → ARRAY<BIGINT> [b₀,c₀,b₁,c₁,…]
  *  - `q_merge_sketch(sketch)`       → the merged interleaved array
  *  - `q_merge_quantile(sketch, p‰, shift)` → BIGINT value lower bound
  *    at EXACT integer rank ⌈p·N/1000⌉ (ceil in integer arithmetic —
  *    no double rank interpolation anywhere).
  *
  * The interleaved ascending-bucket array is the wire contract between
  * a stored sketch and the merge aggregates, like the KMV sorted-hash
  * array.
  */
sealed abstract class QuantileHistAgg
    extends TypedImperativeAggregate[java.util.TreeMap[java.lang.Long, java.lang.Long]] {

  def child: Expression

  override def children: Seq[Expression] = Seq(child)

  override def createAggregationBuffer(): java.util.TreeMap[java.lang.Long, java.lang.Long] =
    new java.util.TreeMap[java.lang.Long, java.lang.Long]()

  protected final def add(buf: java.util.TreeMap[java.lang.Long, java.lang.Long],
                          bucket: Long, n: Long): Unit = {
    val prev = buf.get(bucket)
    buf.put(bucket, if (prev == null) n else prev + n): Unit
  }

  override final def merge(a: java.util.TreeMap[java.lang.Long, java.lang.Long],
                           b: java.util.TreeMap[java.lang.Long, java.lang.Long])
      : java.util.TreeMap[java.lang.Long, java.lang.Long] = {
    val it = b.entrySet().iterator()
    while (it.hasNext) { val e = it.next(); add(a, e.getKey, e.getValue) }
    a
  }

  override final def serialize(buf: java.util.TreeMap[java.lang.Long, java.lang.Long]): Array[Byte] = {
    val bb = java.nio.ByteBuffer.allocate(4 + 16 * buf.size())
    bb.putInt(buf.size())
    val it = buf.entrySet().iterator()
    while (it.hasNext) { val e = it.next(); bb.putLong(e.getKey); bb.putLong(e.getValue) }
    bb.array()
  }

  override final def deserialize(bytes: Array[Byte]): java.util.TreeMap[java.lang.Long, java.lang.Long] = {
    val bb = java.nio.ByteBuffer.wrap(bytes)
    val n = bb.getInt
    val out = new java.util.TreeMap[java.lang.Long, java.lang.Long]()
    var i = 0
    while (i < n) { out.put(bb.getLong, bb.getLong); i += 1 }
    out
  }

  /** update() for the sketch-array side: interleaved [b,c,b,c,…]. */
  protected final def updateFromSketch(buf: java.util.TreeMap[java.lang.Long, java.lang.Long],
                                       input: InternalRow)
      : java.util.TreeMap[java.lang.Long, java.lang.Long] = {
    val a = child.eval(input)
    if (a != null) {
      val arr = a.asInstanceOf[ArrayData]
      var i = 0
      while (i + 1 < arr.numElements()) {
        add(buf, arr.getLong(i), arr.getLong(i + 1)); i += 2
      }
    }
    buf
  }

  protected final def requireSketchInput(fname: String): TypeCheckResult =
    child.dataType match {
      case ArrayType(LongType, _) => TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"$fname expects an interleaved ARRAY<BIGINT> sketch (from q_sketch), got ${other.sql}")
    }

  /** The sketch as an interleaved ascending-bucket array value. */
  protected final def evalSketch(buf: java.util.TreeMap[java.lang.Long, java.lang.Long]): Any = {
    val arr = new Array[Any](2 * buf.size())
    val it = buf.entrySet().iterator(); var i = 0
    while (it.hasNext) {
      val e = it.next()
      arr(i) = e.getKey.longValue(); arr(i + 1) = e.getValue.longValue(); i += 2
    }
    new GenericArrayData(arr)
  }
}

/** Sketch builder: ingests integer-scaled values, buckets at 2^shift
  * resolution. See [[QuantileHistAgg]]. */
case class QuantileSketchAgg(
    child: Expression,
    shift: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
    extends QuantileHistAgg {
  require(shift >= 0 && shift < 63, s"q_sketch: shift must be in [0,63), got $shift")
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case LongType => TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"q_sketch expects a BIGINT integer-scaled value " +
          s"(e.g. CAST(FLOOR(x * 100 + 0.5) AS BIGINT)), got ${other.sql}")
    }
  override def update(buf: java.util.TreeMap[java.lang.Long, java.lang.Long], input: InternalRow)
      : java.util.TreeMap[java.lang.Long, java.lang.Long] = {
    val v = child.eval(input)
    if (v != null) add(buf, v.asInstanceOf[Long] >> shift, 1L)
    buf
  }
  override def eval(buf: java.util.TreeMap[java.lang.Long, java.lang.Long]): Any = evalSketch(buf)
  override def withNewMutableAggBufferOffset(newOffset: Int): QuantileSketchAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): QuantileSketchAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(newChildren: IndexedSeq[Expression]): QuantileSketchAgg =
    copy(child = newChildren.head)
  override def prettyName: String = "q_sketch"
}

/** Sketch-valued merge — the intermediate level of a rollup tree
  * (daily → weekly sketches). Count addition: exact at every level. */
case class QuantileMergeSketchAgg(
    child: Expression,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
    extends QuantileHistAgg {
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def checkInputDataTypes(): TypeCheckResult = requireSketchInput("q_merge_sketch")
  override def update(buf: java.util.TreeMap[java.lang.Long, java.lang.Long], input: InternalRow)
      : java.util.TreeMap[java.lang.Long, java.lang.Long] = updateFromSketch(buf, input)
  override def eval(buf: java.util.TreeMap[java.lang.Long, java.lang.Long]): Any = evalSketch(buf)
  override def withNewMutableAggBufferOffset(newOffset: Int): QuantileMergeSketchAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): QuantileMergeSketchAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(newChildren: IndexedSeq[Expression]): QuantileMergeSketchAgg =
    copy(child = newChildren.head)
  override def prettyName: String = "q_merge_sketch"
}

/** Terminal rollup: merges sketches and evaluates the `permille`
  * quantile at exact integer rank ⌈p·N/1000⌉, returning the bucket's
  * value lower bound (`bucket << shift`, the same `shift` the sketches
  * were built with). NULL on an empty group (no rank exists). */
case class QuantileMergeQuantileAgg(
    child: Expression,
    permille: Int,
    shift: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
    extends QuantileHistAgg {
  require(permille >= 1 && permille <= 1000,
    s"q_merge_quantile: permille must be in [1,1000], got $permille")
  require(shift >= 0 && shift < 63, s"q_merge_quantile: shift must be in [0,63), got $shift")
  override def nullable: Boolean = true
  override def dataType: DataType = LongType
  override def checkInputDataTypes(): TypeCheckResult = requireSketchInput("q_merge_quantile")
  override def update(buf: java.util.TreeMap[java.lang.Long, java.lang.Long], input: InternalRow)
      : java.util.TreeMap[java.lang.Long, java.lang.Long] = updateFromSketch(buf, input)
  override def eval(buf: java.util.TreeMap[java.lang.Long, java.lang.Long]): Any = {
    var total = 0L
    val it0 = buf.values().iterator()
    while (it0.hasNext) total += it0.next()
    if (total == 0L) null
    else {
      val rank = (total * permille + 999L) / 1000L   // ⌈p·N/1000⌉, ≥ 1
      var cum = 0L
      var out: Any = null
      val it = buf.entrySet().iterator()
      while (out == null && it.hasNext) {
        val e = it.next()
        cum += e.getValue
        if (cum >= rank) out = e.getKey.longValue() << shift
      }
      out
    }
  }
  override def withNewMutableAggBufferOffset(newOffset: Int): QuantileMergeQuantileAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): QuantileMergeQuantileAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(newChildren: IndexedSeq[Expression]): QuantileMergeQuantileAgg =
    copy(child = newChildren.head)
  override def prettyName: String = "q_merge_quantile"
}

object QuantileSketchAgg {
  import org.apache.spark.sql.GraftBridge

  /** Column API: `q_sketch(intScaledValue, shift)` inside `agg(...)`. */
  def q_sketch(c: Column, shift: Int): Column =
    GraftBridge.toColumn(AggregateExpression(
      QuantileSketchAgg(GraftBridge.toExpression(c), shift), Complete, isDistinct = false))

  /** Column API: `q_merge_sketch(sketch)` — sketch-valued merge. */
  def q_merge_sketch(c: Column): Column =
    GraftBridge.toColumn(AggregateExpression(
      QuantileMergeSketchAgg(GraftBridge.toExpression(c)), Complete, isDistinct = false))

  /** Column API: `q_merge_quantile(sketch, permille, shift)`. */
  def q_merge_quantile(c: Column, permille: Int, shift: Int): Column =
    GraftBridge.toColumn(AggregateExpression(
      QuantileMergeQuantileAgg(GraftBridge.toExpression(c), permille, shift),
      Complete, isDistinct = false))
}
