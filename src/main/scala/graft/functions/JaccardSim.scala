package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Set-Jaccard similarity of two string arrays:
  * `|A ∩ B| / |A ∪ B|` over the element SETS. Semantically identical
  * to
  *
  * {{{
  * size(array_intersect(a, b)) / size(array_distinct(concat(a, b)))
  * }}}
  *
  * (same integers, so bit-identical doubles) but without materializing
  * the intersection and union ARRAYS that the composed form allocates
  * per row — at 300k candidate pairs per block-join that allocation
  * churn is the dominant cost. One hash set per side, sizes only.
  */
/** @param sortedDistinct when true, both inputs are PROMISED to be
  *   duplicate-free and sorted by UTF8String binary order (e.g.
  *   `array_sort(char_ngrams(...))`): the kernel then runs a
  *   zero-allocation linear merge instead of building two hash sets
  *   per row — the per-pair cost in a candidate-verify join drops to
  *   pure byte compares. Results are WRONG if the promise is broken;
  *   callers own the invariant. */
case class JaccardSim(left: Expression, right: Expression,
    sortedDistinct: Boolean = false)
    extends BinaryExpression {

  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true

  override def checkInputDataTypes() =
    (left.dataType, right.dataType) match {
      case (ArrayType(StringType, _), ArrayType(StringType, _)) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"jaccard_sim expects (ARRAY<STRING>, ARRAY<STRING>), got $other")
    }

  override def nullSafeEval(a: Any, b: Any): Any = {
    val r =
      if (sortedDistinct)
        JaccardSim.jaccardSorted(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])
      else
        JaccardSim.jaccard(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])
    if (r.isNaN) null else r // 0/0 (both sets empty) → NULL, like Divide
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val fn = if (sortedDistinct) "jaccardSorted" else "jaccard"
    nullSafeCodeGen(ctx, ev, (a, b) =>
      s"""
         |${ev.value} = graft.functions.JaccardSim.$fn($a, $b);
         |if (Double.isNaN(${ev.value})) { ${ev.isNull} = true; }
       """.stripMargin)
  }

  override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): JaccardSim =
    copy(left = newLeft, right = newRight)
  override def prettyName: String = "jaccard_sim"
}

object JaccardSim {

  /** Null elements are ignored (treated as absent), matching how
    * array_intersect/array_distinct handle them for our all-non-null
    * inputs. */
  def jaccard(a: ArrayData, b: ArrayData): Double = {
    val setA = new java.util.HashSet[UTF8String](Math.max(8, a.numElements() * 2))
    var i = 0
    while (i < a.numElements()) {
      val e = a.getUTF8String(i)
      if (e != null) setA.add(e)
      i += 1
    }
    val na = setA.size
    val seenB = new java.util.HashSet[UTF8String](Math.max(8, b.numElements() * 2))
    var ni = 0
    var j = 0
    while (j < b.numElements()) {
      val e = b.getUTF8String(j)
      if (e != null && seenB.add(e) && setA.contains(e)) ni += 1
      j += 1
    }
    val nb = seenB.size
    ni.toDouble / (na + nb - ni)
  }

  /** Merge-count intersection of two sorted duplicate-free arrays —
    * the [[JaccardSim.sortedDistinct]] fast path. Same integers as
    * [[jaccard]] when the promise holds (UTF8String.compareTo is the
    * binary order `array_sort` produces). */
  def jaccardSorted(a: ArrayData, b: ArrayData): Double = {
    val na = a.numElements()
    val nb = b.numElements()
    var i = 0; var j = 0; var ni = 0
    while (i < na && j < nb) {
      val cmp = a.getUTF8String(i).compareTo(b.getUTF8String(j))
      if (cmp == 0) { ni += 1; i += 1; j += 1 }
      else if (cmp < 0) i += 1
      else j += 1
    }
    ni.toDouble / (na + nb - ni)
  }

  import org.apache.spark.sql.GraftBridge

  /** Column API: `jaccard_sim($"a", $"b")`. */
  def jaccard_sim(a: Column, b: Column): Column =
    GraftBridge.toColumn(JaccardSim(GraftBridge.toExpression(a), GraftBridge.toExpression(b)))

  /** Column API, sorted-distinct promise (see [[JaccardSim]]). */
  def jaccard_sim_presorted(a: Column, b: Column): Column =
    GraftBridge.toColumn(JaccardSim(GraftBridge.toExpression(a),
      GraftBridge.toExpression(b), sortedDistinct = true))
}
