package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.{AggregateExpression, Complete, TypedImperativeAggregate}
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** One-pass 64-bit SimHash vote aggregate over md5-hex token rows.
  *
  * Semantically identical to the 64-column composed form
  *
  * {{{ SUM(CASE WHEN ((instr('0123456789abcdef', substr(h, b/4+1, 1)) - 1)
  *       >> (3 - b%4)) & 1 = 1 THEN 1 ELSE -1 END) AS v_b   -- b = 0..63 }}}
  *
  * followed by the bit-majority hex assembly — but each input row
  * decodes its 16 leading hex nibbles ONCE into 64 int-buffer
  * bumps, instead of running 64 substr/instr string expressions per
  * row. Map-side partials merge elementwise, so the shuffle carries
  * one 256-byte buffer per (group, partition) regardless of token
  * count — the shape that matters at corpus scale.
  */
case class SimHashAgg(
    child: Expression,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[Array[Int]] {

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = false
  override def dataType: DataType = StringType

  override def createAggregationBuffer(): Array[Int] = new Array[Int](64)

  override def update(buf: Array[Int], input: org.apache.spark.sql.catalyst.InternalRow): Array[Int] = {
    val h = child.eval(input)
    if (h != null) {
      val s = h.asInstanceOf[UTF8String].toString
      var d = 0
      while (d < 16 && d < s.length) {
        val c = s.charAt(d)
        val nib =
          if (c >= '0' && c <= '9') c - '0'
          else if (c >= 'a' && c <= 'f') c - 'a' + 10
          else if (c >= 'A' && c <= 'F') c - 'A' + 10
          else 0
        var k = 0
        while (k < 4) {
          // bit b = 4d + k reads nibble bit (3 - k), matching voteExpr
          buf(4 * d + k) += (if (((nib >> (3 - k)) & 1) == 1) 1 else -1)
          k += 1
        }
        d += 1
      }
    }
    buf
  }

  override def merge(a: Array[Int], b: Array[Int]): Array[Int] = {
    var i = 0
    while (i < 64) { a(i) += b(i); i += 1 }
    a
  }

  override def eval(buf: Array[Int]): Any = {
    val sb = new java.lang.StringBuilder(16)
    var d = 0
    while (d < 16) {
      var digit = 0
      var k = 0
      while (k < 4) {
        if (buf(4 * d + k) > 0) digit += (8 >> k)
        k += 1
      }
      sb.append("0123456789abcdef".charAt(digit))
      d += 1
    }
    UTF8String.fromString(sb.toString)
  }

  override def serialize(buf: Array[Int]): Array[Byte] = {
    val bb = java.nio.ByteBuffer.allocate(256)
    bb.asIntBuffer().put(buf)
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): Array[Int] = {
    val out = new Array[Int](64)
    java.nio.ByteBuffer.wrap(bytes).asIntBuffer().get(out)
    out
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): SimHashAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): SimHashAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(newChildren: IndexedSeq[Expression]): SimHashAgg =
    copy(child = newChildren.head)
  override def prettyName: String = "simhash_agg"
}

object SimHashAgg {
  import org.apache.spark.sql.GraftBridge

  /** Column API: `simhash_agg(md5Hex)` inside an `agg(...)`. */
  def simhash_agg(c: Column): Column =
    GraftBridge.toColumn(AggregateExpression(
      SimHashAgg(GraftBridge.toExpression(c)), Complete, isDistinct = false))
}
