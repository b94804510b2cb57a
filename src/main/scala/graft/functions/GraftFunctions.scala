package graft.functions

import org.apache.spark.sql.{GraftBridge, SparkSession, SparkSessionExtensions}
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, Literal}
import org.apache.spark.sql.types.IntegerType

/** SQL-surface registration of the engine's native expressions, so
  * `spark.sql("SELECT word_shingles(tokens, 3) ...")` works like any
  * built-in:
  *
  *  - new sessions: `--conf spark.sql.extensions=graft.GraftExtensions`
  *    (the standard library extension point);
  *  - an existing session: `GraftFunctions.register(spark)`.
  */
object GraftFunctions {

  private def info(name: String, usage: String) =
    new ExpressionInfo("graft", null, name, usage, "")

  private def intLit(e: Expression, fn: String): Int = e match {
    case Literal(n: Int, IntegerType) => n
    case other => throw new IllegalArgumentException(
      s"$fn: the n argument must be an INT literal, got $other")
  }

  /** (name, usage, builder) for every native function. */
  val all: Seq[(String, String, PartialFunction[Seq[Expression], Expression])] = Seq(
    ("rolling_hash", "rolling_hash(str) - 64-bit polynomial rolling hash of the UTF-8 bytes",
      { case Seq(c) => RollingHash(c) }),
    ("word_shingles", "word_shingles(tokens, n) - distinct word n-shingles of a string array",
      { case Seq(c, n) => WordShingles(c, intLit(n, "word_shingles")) }),
    ("char_ngrams", "char_ngrams(str, n) - distinct character n-grams",
      { case Seq(c, n) => CharNgrams(c, intLit(n, "char_ngrams")) }),
    ("jaccard_sim", "jaccard_sim(a, b) - set Jaccard similarity of two string arrays",
      { case Seq(a, b) => JaccardSim(a, b) }),
    ("vec_dot", "vec_dot(a, b) - sequential-fold dot product of two double arrays",
      { case Seq(a, b) => VecDot(a, b) }),
    ("vec_norm_sq", "vec_norm_sq(a) - sequential-fold squared L2 norm",
      { case Seq(a) => VecNormSq(a) }),
    ("word_ngrams", "word_ngrams(tokens, n) - all word n-grams WITH duplicates",
      { case Seq(c, n) => WordNgrams(c, intLit(n, "word_ngrams")) }),
    ("rolling_kgram_hashes",
      "rolling_kgram_hashes(str, k) - all k-gram polynomial hashes (code points) in one pass",
      { case Seq(c, n) => RollingKgramHashes(c, intLit(n, "rolling_kgram_hashes")) }),
    ("simhash_agg", "simhash_agg(md5hex) - aggregate: 64-bit SimHash of a group's md5 hex values",
      { case Seq(c) =>
        org.apache.spark.sql.catalyst.expressions.aggregate.AggregateExpression(
          SimHashAgg(c), org.apache.spark.sql.catalyst.expressions.aggregate.Complete,
          isDistinct = false) }),
    ("kmv_distinct", "kmv_distinct(hash60, k) - aggregate: KMV bottom-k distinct-count estimate",
      { case Seq(c, n) =>
        org.apache.spark.sql.catalyst.expressions.aggregate.AggregateExpression(
          KmvDistinctAgg(c, intLit(n, "kmv_distinct")),
          org.apache.spark.sql.catalyst.expressions.aggregate.Complete,
          isDistinct = false) }),
    ("q_sketch",
      "q_sketch(vBigint, shift) - aggregate: quantized-histogram quantile sketch (bucket = v >> shift)",
      { case Seq(c, n) =>
        org.apache.spark.sql.catalyst.expressions.aggregate.AggregateExpression(
          QuantileSketchAgg(c, intLit(n, "q_sketch")),
          org.apache.spark.sql.catalyst.expressions.aggregate.Complete,
          isDistinct = false) }),
    ("q_merge_sketch", "q_merge_sketch(sketch) - aggregate: merge quantile sketches (sketch-valued)",
      { case Seq(c) =>
        org.apache.spark.sql.catalyst.expressions.aggregate.AggregateExpression(
          QuantileMergeSketchAgg(c),
          org.apache.spark.sql.catalyst.expressions.aggregate.Complete,
          isDistinct = false) }),
    ("q_merge_quantile",
      "q_merge_quantile(sketch, permille, shift) - aggregate: exact-integer-rank quantile of merged sketches",
      { case Seq(c, p, sh) =>
        org.apache.spark.sql.catalyst.expressions.aggregate.AggregateExpression(
          QuantileMergeQuantileAgg(c, intLit(p, "q_merge_quantile"), intLit(sh, "q_merge_quantile")),
          org.apache.spark.sql.catalyst.expressions.aggregate.Complete,
          isDistinct = false) }),
    ("topk_pairs",
      "topk_pairs(score, id, k) - aggregate: top-k (score, id) pairs in rank order",
      { case Seq(s, i, k) =>
        org.apache.spark.sql.catalyst.expressions.aggregate.AggregateExpression(
          TopKPairsAgg(s, i, intLit(k, "topk_pairs")),
          org.apache.spark.sql.catalyst.expressions.aggregate.Complete,
          isDistinct = false) }),
    ("topk_merge",
      "topk_merge(topArray, k) - aggregate: merge stored topk_pairs arrays into a top-k",
      { case Seq(c, k) =>
        org.apache.spark.sql.catalyst.expressions.aggregate.AggregateExpression(
          TopKMergeAgg(c, intLit(k, "topk_merge")),
          org.apache.spark.sql.catalyst.expressions.aggregate.Complete,
          isDistinct = false) }))

  /** Wrong arity → a named error instead of a bare MatchError. */
  private def totalBuilder(name: String, usage: String,
      b: PartialFunction[Seq[Expression], Expression]): Seq[Expression] => Expression =
    args => b.applyOrElse(args, (bad: Seq[Expression]) =>
      throw new IllegalArgumentException(
        s"$name: wrong number of arguments (${bad.length}); usage: $usage"))

  /** Register into an existing session. */
  def register(spark: SparkSession): Unit =
    all.foreach { case (name, usage, builder) =>
      GraftBridge.registerFunction(spark, name, info(name, usage), totalBuilder(name, usage, builder))
    }

  /** Inject into a SparkSessionExtensions (used by [[graft.GraftExtensions]]). */
  def inject(ext: SparkSessionExtensions): Unit =
    all.foreach { case (name, usage, builder) =>
      ext.injectFunction((FunctionIdentifier(name), info(name, usage), totalBuilder(name, usage, builder)))
    }
}
