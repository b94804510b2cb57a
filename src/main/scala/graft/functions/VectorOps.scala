package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Column-level vector math over `array<float>` embedding columns.
  *
  * Everything is computed in float64 with an element-sequential fold
  * (`aggregate` / `zip_with`), which makes the results bit-identical
  * to DuckDB's `list_cosine_similarity` on `DOUBLE[]` — verified
  * empirically (DuckDB evaluates dot/(sqrt(na)*sqrt(nb)) in element
  * order). These are pure Catalyst higher-order functions: no UDF, no
  * serialization boundary, safe inside any join/window pipeline.
  */
object VectorOps {

  import org.apache.spark.sql.GraftBridge

  /** Cast a float array to double (element-wise) once, up front. */
  def toDoubleVec(c: Column): Column = transform(c, _.cast("double"))

  /** Native sequential fold (see [[VecDot]]) — same IEEE sequence as
    * `aggregate(zip_with(a, b, _*_), 0.0, _+_)`, but codegen'd. */
  def dot(a: Column, b: Column): Column =
    GraftBridge.toColumn(VecDot(GraftBridge.toExpression(a), GraftBridge.toExpression(b)))

  def normSq(a: Column): Column =
    GraftBridge.toColumn(VecNormSq(GraftBridge.toExpression(a)))

  /** cosine(a, b) = dot / (sqrt(|a|²) * sqrt(|b|²)) — the exact
    * DuckDB-compatible formula (NOT dot/sqrt(na*nb), which differs in
    * the last ulp). */
  def cosine(a: Column, b: Column): Column =
    dot(a, b) / (sqrt(normSq(a)) * sqrt(normSq(b)))

  /** Deterministic 6-significant-decimal rounding of an identical
    * double: floor(x*1e6 + 0.5)/1e6 — same bits in any engine. */
  def floorRound6(c: Column): Column =
    floor(c * 1000000 + 0.5) / 1000000

  /** Similarity RANKING key: the 7-decimal half-up scaled integer of a
    * double similarity. Every ANN ORDER BY ranks on this (ties broken
    * by the id column that follows) instead of the raw double: a
    * cross-engine rank flip — which would silently change categorical
    * outputs like top-k membership, majority votes, or IVF cell
    * assignment at the cutoff — then requires two candidates within
    * 1e-7 of each other AND a rounding-boundary-straddling ulp, rather
    * than any last-ulp divergence at any gap. The exposed cos_sim
    * stays [[floorRound6]] of the raw value. */
  def simRank7(c: Column): Column = floor(c * 10000000 + 0.5)

  /** The DuckDB SQL mirror of [[simRank7]]. */
  def simRank7Sql(e: String): String = s"FLOOR(($e) * 10000000 + 0.5)"

  /** Sign-projection LSH bucket in [0, 64): bit k is the sign of the
    * sum of the k-th 8-element slice of the vector. A deterministic
    * stand-in for random-hyperplane LSH (hyperplanes = axis-group
    * sums) that both engines can compute bit-identically.
    */
  def signBucket(v: Column, bits: Int = 6, groupSize: Int = 8): Column =
    (0 until bits).map { k =>
      val slice = (1 to groupSize).map(i => element_at(v, k * groupSize + i))
        .reduce(_ + _)
      when(slice > 0, lit(1 << k)).otherwise(lit(0))
    }.reduce(_ + _)

  /** The DuckDB SQL mirror of [[signBucket]] (1-based v[i] indexing). */
  def signBucketSql(vecExpr: String, bits: Int = 6, groupSize: Int = 8): String =
    (0 until bits).map { k =>
      val slice = (1 to groupSize).map(i => s"$vecExpr[${k * groupSize + i}]").mkString(" + ")
      s"CASE WHEN ($slice) > 0 THEN ${1 << k} ELSE 0 END"
    }.mkString(" + ")
}
