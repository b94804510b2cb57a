package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** All k-gram polynomial hashes of a string in ONE linear pass:
  * position i (0-based) holds `h_i = Σ_j cp[i+j] · B^(k-1-j) mod 2^64`
  * over the string's Unicode CODE POINTS (so Spark and DuckDB index
  * characters identically — `unicode(substr(s, i, 1))` is the mirror
  * coefficient). Strings shorter than k yield an empty array.
  *
  * The rolling update `h_{i+1} = (h_i − cp[i]·B^{k-1})·B + cp[i+k]` is
  * one subtract-multiply-add per character, versus O(k) hash work per
  * position for any digest-per-substring formulation (the winnowing
  * pipeline previously ran an md5 per position: O(len·k) digest bytes
  * plus a hex decode — this kernel measured ~an order of magnitude
  * cheaper on the same scan). Wraparound arithmetic is exact mod 2^64,
  * so a HUGEINT `list_reduce` reproduces every value bit-for-bit in
  * the DuckDB oracle.
  */
case class RollingKgramHashes(child: Expression, k: Int)
    extends UnaryExpression {

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def checkInputDataTypes() =
    if (child.dataType == StringType && k >= 1)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"rolling_kgram_hashes expects STRING and k >= 1, got ${child.dataType}, k=$k")

  override def nullSafeEval(input: Any): Any =
    RollingKgramHashes.compute(input.asInstanceOf[UTF8String], k)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.RollingKgramHashes.compute($c, $k);")

  override protected def withNewChildInternal(newChild: Expression): RollingKgramHashes =
    copy(child = newChild)
  override def prettyName: String = "rolling_kgram_hashes"
}

object RollingKgramHashes {
  /** Same base as [[RollingHash]]; coefficients are code points, seed 0
    * (keeps the DuckDB mirror a bare fold). */
  final val Prime = RollingHash.Prime

  def compute(s: UTF8String, k: Int): ArrayData = {
    val cps = s.toString.codePoints().toArray
    val n = cps.length
    if (n < k) return new GenericArrayData(Array.emptyLongArray)
    var pow = 1L
    var j = 1
    while (j < k) { pow *= Prime; j += 1 }
    val out = new Array[Long](n - k + 1)
    var h = 0L
    j = 0
    while (j < k) { h = h * Prime + cps(j); j += 1 }
    out(0) = h
    var i = 1
    while (i + k - 1 < n) {
      h = (h - cps(i - 1) * pow) * Prime + cps(i + k - 1)
      out(i) = h
      i += 1
    }
    new GenericArrayData(out)
  }

  import org.apache.spark.sql.GraftBridge

  /** Column API: `rolling_kgram_hashes($"text", 8)`. */
  def rolling_kgram_hashes(c: Column, k: Int): Column =
    GraftBridge.toColumn(RollingKgramHashes(GraftBridge.toExpression(c), k))
}
