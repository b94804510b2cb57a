package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Distinct character n-grams of a string, in first-occurrence order:
  * `"abcd"` → `["abc","bcd"]` for n=3; strings shorter than n yield an
  * empty array. Semantically identical to
  *
  * {{{
  * array_distinct(transform(sequence(1, length(text)-n+1),
  *   i -> substr(text, i, n)))
  * }}}
  *
  * but one LINEAR byte pass. The composed form is O(chars²) per row:
  * each `substr(text, i, n)` call seeks from the start of the UTF-8
  * buffer to codepoint i, inside an interpreted higher-order-function
  * lambda. Grams are codepoint windows (same unit `substr` uses), so
  * the output matches DuckDB's substr-based formulation on any input,
  * not just ASCII.
  */
case class CharNgrams(child: Expression, n: Int)
    extends UnaryExpression {

  override def dataType: DataType = ArrayType(StringType, containsNull = false)

  override def checkInputDataTypes() =
    child.dataType match {
      case StringType if n >= 1 =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case _ =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"char_ngrams expects STRING and n >= 1, got ${child.dataType}, n=$n")
    }

  override def nullSafeEval(input: Any): Any =
    CharNgrams.ngrams(input.asInstanceOf[UTF8String], n)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.CharNgrams.ngrams($c, $n);")

  override protected def withNewChildInternal(newChild: Expression): CharNgrams =
    copy(child = newChild)
  override def prettyName: String = "char_ngrams"
}

object CharNgrams {

  /** UTF-8 continuation bytes have the top two bits `10`. */
  private def isContinuation(b: Byte): Boolean = (b & 0xC0) == 0x80

  def ngrams(s: UTF8String, n: Int): ArrayData = {
    val bytes = s.getBytes
    // byte offset of each codepoint start, plus the end sentinel
    var count = 0
    var i = 0
    while (i < bytes.length) {
      if (!isContinuation(bytes(i))) count += 1
      i += 1
    }
    if (count < n) return new GenericArrayData(Array.empty[Any])
    val offs = new Array[Int](count + 1)
    var ci = 0
    i = 0
    while (i < bytes.length) {
      if (!isContinuation(bytes(i))) { offs(ci) = i; ci += 1 }
      i += 1
    }
    offs(count) = bytes.length
    val seen = new java.util.LinkedHashSet[UTF8String]()
    var w = 0
    while (w + n <= count) {
      val from = offs(w)
      val until = offs(w + n)
      seen.add(UTF8String.fromBytes(bytes, from, until - from))
      w += 1
    }
    val out = new Array[Any](seen.size)
    val it = seen.iterator()
    var j = 0
    while (it.hasNext) { out(j) = it.next(); j += 1 }
    new GenericArrayData(out)
  }

  import org.apache.spark.sql.GraftBridge

  /** Column API: `char_ngrams($"text", 3)`. */
  def char_ngrams(c: Column, n: Int): Column =
    GraftBridge.toColumn(CharNgrams(GraftBridge.toExpression(c), n))
}
