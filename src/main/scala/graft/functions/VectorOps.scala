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

  /** Quantize a float embedding to a 1e-7-grid INTEGER vector (held in
    * doubles). This is the entry point of the exact-by-construction
    * ranking scheme ([[cosineExact]]): float→double is exact, a single
    * correctly-rounded multiply + half-up floor yields the same
    * integer in every IEEE engine, and downstream dots/norms over
    * these integers stay exact (see cosineExact). */
  def quantVec7(c: Column): Column =
    transform(c, e => floor(e.cast("double") * 10000000 + 0.5).cast("double"))

  /** The DuckDB SQL mirror of [[quantVec7]] (input cast to DOUBLE[]). */
  def quantVec7Sql(e: String): String =
    s"list_transform(($e)::DOUBLE[], x -> FLOOR(x * 10000000 + 0.5))"

  /** Cosine over [[quantVec7]]-quantized vectors — EXACT BY
    * CONSTRUCTION, not by empirical fold-order agreement: with 64-dim
    * unit-norm embeddings and |e| ≤ 1, every elementwise product is
    * ≤ 1e14 and every partial sum ≤ 64·1e14 < 2^53, so the double
    * "integer" arithmetic is exact under ANY summation order — both
    * engines get the same D, Nq, Nv bit-for-bit, and the final
    * D/(sqrt(Nq)·sqrt(Nv)) is a fixed sequence of correctly-rounded
    * IEEE ops on identical inputs. A rank key built on this cannot
    * flip between engines, ever — unlike [[simRank7]] of a raw double
    * cosine, which still straddles a rounding boundary when two
    * candidates tie within an ulp (the latent kNN cutoff flip). */
  def cosineExact(qa: Column, qb: Column): Column =
    dot(qa, qb) / (sqrt(normSq(qa)) * sqrt(normSq(qb)))

  /** The DuckDB SQL mirror of [[cosineExact]] over two quantized
    * DOUBLE[] expressions. */
  def cosineExactSql(qa: String, qb: String): String =
    s"(list_inner_product($qa, $qb) / " +
      s"(SQRT(list_inner_product($qa, $qa)) * SQRT(list_inner_product($qb, $qb))))"

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

  /** BANDED sign bucket: bit k of band `band` is the sign of the sum
    * of the k-th `groupSize`-element slice of the band's `bits ×
    * groupSize`-element span. Each vector gets one bucket PER band;
    * candidates matching in ANY band are the classic LSH
    * OR-amplification — expressed downstream as an equi-join on
    * (band, bucket), never a union of per-band joins over the corpus.
    * Over [[quantVec7]] vectors the slice sums are exact integers, so
    * the signs are cross-engine deterministic even at a
    * floating-point-would-be-zero boundary. */
  def signBandBucket(v: Column, band: Int, bits: Int = 4, groupSize: Int = 4): Column =
    (0 until bits).map { k =>
      val base = band * bits * groupSize + k * groupSize
      val slice = (1 to groupSize).map(i => element_at(v, base + i)).reduce(_ + _)
      when(slice > 0, lit(1 << k)).otherwise(lit(0))
    }.reduce(_ + _)

  /** The DuckDB SQL mirror of [[signBandBucket]]. */
  def signBandBucketSql(vecExpr: String, band: Int, bits: Int = 4, groupSize: Int = 4): String =
    (0 until bits).map { k =>
      val base = band * bits * groupSize + k * groupSize
      val slice = (1 to groupSize).map(i => s"$vecExpr[${base + i}]").mkString(" + ")
      s"CASE WHEN ($slice) > 0 THEN ${1 << k} ELSE 0 END"
    }.mkString(" + ")
}
