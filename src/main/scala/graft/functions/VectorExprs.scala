package graft.functions

import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType}

/** Native sequential-fold vector kernels over `array<double>`.
  *
  * Bit-identical to the higher-order-function formulations
  * (`aggregate(zip_with(a, b, (x,y) => x*y), 0.0, (acc,x) => acc+x)`
  * and the DuckDB `list_cosine_similarity` element order): the fold is
  * strictly element-sequential, so the IEEE rounding sequence is the
  * same. The HOF forms run interpreted with per-element closure
  * dispatch and a materialized intermediate array from `zip_with`; at
  * 12.5M candidate pairs that is the entire runtime of the
  * embedding-dedup pass. These are plain codegen'd loops.
  *
  * Null semantics mirror the HOF forms: a dot over different-length
  * vectors is null (zip_with pads with null, null*x → null poisons the
  * sum).
  */
case class VecDot(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true

  override def checkInputDataTypes() =
    (left.dataType, right.dataType) match {
      case (ArrayType(DoubleType, _), ArrayType(DoubleType, _)) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"vec_dot expects (ARRAY<DOUBLE>, ARRAY<DOUBLE>), got $other")
    }

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = x.numElements()
    if (n != y.numElements()) null
    else {
      var acc = 0.0
      var i = 0
      while (i < n) {
        if (x.isNullAt(i) || y.isNullAt(i)) return null // null poisons, like the HOF fold
        acc += x.getDouble(i) * y.getDouble(i)
        i += 1
      }
      acc
    }
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      // fresh names: two vector expressions in one projection must not
      // collide in the generated locals
      val acc = ctx.freshName("acc")
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      s"""
         |int $n = $a.numElements();
         |if ($n != $b.numElements()) {
         |  ${ev.isNull} = true;
         |} else {
         |  double $acc = 0.0;
         |  for (int $i = 0; $i < $n && !${ev.isNull}; $i++) {
         |    if ($a.isNullAt($i) || $b.isNullAt($i)) {
         |      ${ev.isNull} = true;
         |    } else {
         |      $acc += $a.getDouble($i) * $b.getDouble($i);
         |    }
         |  }
         |  ${ev.value} = $acc;
         |}
       """.stripMargin
    })

  override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): VecDot =
    copy(left = newLeft, right = newRight)
  override def prettyName: String = "vec_dot"
}

/** Σ x² over an `array<double>` — the squared L2 norm, sequential. */
case class VecNormSq(child: Expression)
    extends UnaryExpression {

  override def dataType: DataType = DoubleType

  override def checkInputDataTypes() =
    child.dataType match {
      case ArrayType(DoubleType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"vec_norm_sq expects ARRAY<DOUBLE>, got $other")
    }

  override def nullable: Boolean = true

  override def nullSafeEval(a: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    var acc = 0.0
    var i = 0
    val n = x.numElements()
    while (i < n) {
      if (x.isNullAt(i)) return null // null poisons, like the HOF fold
      val v = x.getDouble(i)
      acc += v * v
      i += 1
    }
    acc
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val acc = ctx.freshName("acc")
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val v = ctx.freshName("v")
      s"""
         |double $acc = 0.0;
         |int $n = $a.numElements();
         |for (int $i = 0; $i < $n && !${ev.isNull}; $i++) {
         |  if ($a.isNullAt($i)) {
         |    ${ev.isNull} = true;
         |  } else {
         |    double $v = $a.getDouble($i);
         |    $acc += $v * $v;
         |  }
         |}
         |${ev.value} = $acc;
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): VecNormSq =
    copy(child = newChild)
  override def prettyName: String = "vec_norm_sq"
}
