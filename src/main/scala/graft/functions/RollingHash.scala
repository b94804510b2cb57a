package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** 64-bit polynomial rolling hash over a string's UTF-8 bytes:
  * `h = h * 1000003 + byte` (unsigned wraparound). A native Catalyst
  * expression with real `doGenCode`, so document fingerprinting stays
  * inside WholeStageCodegen instead of breaking the stage the way a
  * Scala UDF would — at 100 TB the fingerprint pass is scan-bound and
  * must not fall off the codegen path.
  *
  * This is the engine-native counterpart of the md5 fingerprint used
  * by the oracle-checked `text_fingerprint` query (md5 is compared
  * against DuckDB; this one is cheaper — one multiply-add per byte,
  * no digest allocation — and is unit-tested against a reference
  * implementation instead).
  */
case class RollingHash(child: Expression)
    extends UnaryExpression {

  override def dataType: DataType = LongType
  override def checkInputDataTypes() =
    if (child.dataType == StringType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"rolling_hash expects STRING, got ${child.dataType}")

  override def nullSafeEval(input: Any): Any =
    RollingHash.hashBytes(input.asInstanceOf[UTF8String].getBytes)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      val bytes = ctx.freshName("bytes")
      val i = ctx.freshName("i")
      val h = ctx.freshName("h")
      s"""
         |byte[] $bytes = $c.getBytes();
         |long $h = ${RollingHash.Seed}L;
         |for (int $i = 0; $i < $bytes.length; $i++) {
         |  $h = $h * ${RollingHash.Prime}L + ($bytes[$i] & 0xffL);
         |}
         |${ev.value} = $h;
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): RollingHash =
    copy(child = newChild)
  override def prettyName: String = "rolling_hash"
}

object RollingHash {
  final val Seed = 1469598103934665603L  // FNV offset basis
  final val Prime = 1000003L

  def hashBytes(bytes: Array[Byte]): Long = {
    var h = Seed
    var i = 0
    while (i < bytes.length) {
      h = h * Prime + (bytes(i) & 0xffL)
      i += 1
    }
    h
  }

  import org.apache.spark.sql.GraftBridge

  /** Column API: `rolling_hash($"text")`. */
  def rolling_hash(c: Column): Column =
    GraftBridge.toColumn(RollingHash(GraftBridge.toExpression(c)))
}
