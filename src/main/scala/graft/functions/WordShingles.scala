package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Distinct word n-shingles of a token array, in first-occurrence
  * order: `["a","b","c","d"]` → `["a b c", "b c d"]` for n=3; arrays
  * shorter than n collapse to the single space-joined string (so every
  * input yields ≥1 shingle). Semantically identical to
  *
  * {{{
  * CASE WHEN size(t) >= n
  *   THEN array_distinct(transform(sequence(1, size(t)-n+1),
  *          i -> concat_ws(' ', t[i], ..., t[i+n-1])))
  *   ELSE array(concat_ws(' ', t)) END
  * }}}
  *
  * but a single LINEAR pass with real `doGenCode`. The composed form
  * is a performance trap: higher-order functions run interpreted, and
  * when the optimizer substitutes the token-array alias into the
  * lambda (CollapseProject, or InferFiltersFromGenerate pushing a
  * `size(...) > 0` filter through the projection) the tokenizer
  * re-runs per array element — O(tokens²) per document (measured 20s
  * vs ~1s at sf0.1 on the minhash signature pipeline).
  */
case class WordShingles(child: Expression, n: Int)
    extends UnaryExpression {

  override def dataType: DataType = ArrayType(StringType, containsNull = false)

  override def checkInputDataTypes() =
    child.dataType match {
      case ArrayType(StringType, _) if n >= 1 =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case _ =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"word_shingles expects ARRAY<STRING> and n >= 1, got ${child.dataType}, n=$n")
    }

  override def nullSafeEval(input: Any): Any =
    WordShingles.shingle(input.asInstanceOf[ArrayData], n)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.WordShingles.shingle($c, $n);")

  override protected def withNewChildInternal(newChild: Expression): WordShingles =
    copy(child = newChild)
  override def prettyName: String = "word_shingles"
}

object WordShingles {

  private val Sep = UTF8String.fromString(" ")

  /** One linear pass: join each window of n tokens, dedup preserving
    * first occurrence. Null tokens are skipped by concatWs, matching
    * concat_ws semantics. */
  def shingle(arr: ArrayData, n: Int): ArrayData = {
    val len = arr.numElements()
    if (len >= n) {
      val seen = new java.util.LinkedHashSet[UTF8String]()
      val parts = new Array[UTF8String](n)
      var i = 0
      while (i + n <= len) {
        var k = 0
        while (k < n) { parts(k) = arr.getUTF8String(i + k); k += 1 }
        seen.add(UTF8String.concatWs(Sep, parts: _*))
        i += 1
      }
      val out = new Array[Any](seen.size)
      val it = seen.iterator()
      var j = 0
      while (it.hasNext) { out(j) = it.next(); j += 1 }
      new GenericArrayData(out)
    } else {
      val parts = new Array[UTF8String](len)
      var k = 0
      while (k < len) { parts(k) = arr.getUTF8String(k); k += 1 }
      new GenericArrayData(Array[Any](UTF8String.concatWs(Sep, parts: _*)))
    }
  }

  import org.apache.spark.sql.GraftBridge

  /** Column API: `word_shingles($"tokens", 3)`. */
  def word_shingles(c: Column, n: Int): Column =
    GraftBridge.toColumn(WordShingles(GraftBridge.toExpression(c), n))

  /** Column API: `word_ngrams($"tokens", 2)` — like word_shingles but
    * KEEPS duplicates (frequency-preserving), for n-gram concentration
    * statistics where multiplicity is the signal. Arrays shorter than
    * n yield an EMPTY array (matching `generate_series(1, len-n+1)`
    * semantics), unlike word_shingles' collapse-to-one. */
  def word_ngrams(c: Column, n: Int): Column =
    GraftBridge.toColumn(WordNgrams(GraftBridge.toExpression(c), n))
}

/** All word n-grams of a token array, in order, WITH duplicates:
  * `["a","b","a","b"]` → `["a b","b a","a b"]` for n=2. The
  * multiplicity-preserving sibling of [[WordShingles]] (which dedups);
  * used for repetition/concentration quality signals where the
  * duplicate count IS the measurement. Shorter-than-n arrays yield an
  * empty array. */
case class WordNgrams(child: Expression, n: Int)
    extends UnaryExpression {

  override def dataType: DataType = ArrayType(StringType, containsNull = false)

  override def checkInputDataTypes() =
    child.dataType match {
      case ArrayType(StringType, _) if n >= 1 =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case _ =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"word_ngrams expects ARRAY<STRING> and n >= 1, got ${child.dataType}, n=$n")
    }

  override def nullSafeEval(input: Any): Any =
    WordNgrams.ngrams(input.asInstanceOf[ArrayData], n)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.WordNgrams.ngrams($c, $n);")

  override protected def withNewChildInternal(newChild: Expression): WordNgrams =
    copy(child = newChild)
  override def prettyName: String = "word_ngrams"
}

object WordNgrams {
  private val Sep = UTF8String.fromString(" ")

  def ngrams(arr: ArrayData, n: Int): ArrayData = {
    val len = arr.numElements()
    if (len < n) return new GenericArrayData(Array.empty[Any])
    val out = new Array[Any](len - n + 1)
    val parts = new Array[UTF8String](n)
    var i = 0
    while (i + n <= len) {
      var k = 0
      while (k < n) { parts(k) = arr.getUTF8String(i + k); k += 1 }
      out(i) = UTF8String.concatWs(Sep, parts: _*)
      i += 1
    }
    new GenericArrayData(out)
  }
}
