package graft.operators

import org.apache.spark.sql.{Column, DataFrame, GraftBridge, SparkSession}
import org.apache.spark.sql.catalyst.expressions.{BloomFilterMightContain, Literal, XxHash64}
import org.apache.spark.sql.catalyst.expressions.aggregate.BloomFilterAggregate
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{BinaryType, LongType}
import graft.{GraftQuery, Tables}
import graft.GraftQuery.sql

/** Bloom-filter SEMI-JOIN REDUCTION — the runtime pre-filter a 100 TB
  * shuffle join needs when the build side is too large to broadcast as
  * ROWS but its key set compresses to a few MB of bloom BITS: build a
  * mergeable bloom sketch over the build side's join keys (one
  * aggregate with map-side partial combine — Spark's own
  * `BloomFilterAggregate`, the expression its `InjectRuntimeFilter`
  * rule uses), then drop probe rows that cannot match BEFORE they are
  * canon-encoded, shuffled, or spilled. False positives survive the
  * pre-filter and are removed by the real join, so the RESULT IS
  * EXACT regardless of hashing — which is why a plain-SQL oracle can
  * gate this entry.
  *
  * Spark's `InjectRuntimeFilter` applies the same idea automatically,
  * but only under its own heuristics (creation-side size thresholds,
  * one filter per application, no user control of fpp/expected items);
  * this operator is the EXPLICIT form a pipeline author reaches for
  * when the optimizer's heuristics decline — same plan shape, caller
  * -chosen sizing.
  *
  * The sketch travels driver→tasks as a literal (the same bytes
  * Spark's runtime filter ships as a subquery broadcast result) — a
  * single ~`numBits/8`-byte scalar, NOT a per-row collect; size fpp/
  * expectedItems so the bits stay executor-memory friendly (1e8 keys
  * at 1% fpp ≈ 120 MB — prefer 3-5% at that scale).
  *
  * Reference: the engine-side join reduction discussed for the J2/J3
  * fact joins (SURVEY.md §2); the reference engine itself has no
  * equivalent — filters only cut the probe side via predicates, never
  * via the other side's key set.
  */
object BloomJoin {

  /** Serialized bloom over `key` of `build` — None when the build side
    * is empty (callers should then skip the probe entirely). */
  def bloomBytes(build: DataFrame, key: Column,
                 expectedItems: Long, fpp: Double): Option[Array[Byte]] = {
    val numBits = org.apache.spark.util.sketch.BloomFilter.optimalNumOfBits(expectedItems, fpp)
    val agg = new BloomFilterAggregate(
      new XxHash64(Seq(GraftBridge.toExpression(key.cast(LongType)))),
      Literal(expectedItems), Literal(numBits)).toAggregateExpression()
    Option(build.select(GraftBridge.toColumn(agg)).head.getAs[Array[Byte]](0))
  }

  /** Predicate: `key` might be in the serialized bloom. Codegen'd
    * (Spark's native `BloomFilterMightContain`), so it fuses into the
    * probe side's scan stage. */
  def mightContain(bloom: Array[Byte], key: Column): Column =
    GraftBridge.toColumn(BloomFilterMightContain(
      Literal(bloom, BinaryType),
      new XxHash64(Seq(GraftBridge.toExpression(key.cast(LongType))))))

  /** [[bloomBytes]] without the long cast — for keys hashed AS-IS
    * (string changelog keys, binary digests). Build and probe must use
    * the same variant: XxHash64("1") ≠ XxHash64(1L). */
  def bloomBytesRaw(build: DataFrame, key: Column,
                    expectedItems: Long, fpp: Double): Option[Array[Byte]] = {
    val numBits = org.apache.spark.util.sketch.BloomFilter.optimalNumOfBits(expectedItems, fpp)
    val agg = new BloomFilterAggregate(
      new XxHash64(Seq(GraftBridge.toExpression(key))),
      Literal(expectedItems), Literal(numBits)).toAggregateExpression()
    Option(build.select(GraftBridge.toColumn(agg)).head.getAs[Array[Byte]](0))
  }

  /** [[mightContain]] for [[bloomBytesRaw]]-built sketches. */
  def mightContainRaw(bloom: Array[Byte], key: Column): Column =
    GraftBridge.toColumn(BloomFilterMightContain(
      Literal(bloom, BinaryType),
      new XxHash64(Seq(GraftBridge.toExpression(key)))))

  /** Inner equi-join with the probe side bloom-pre-filtered on the
    * join key. Exact: bloom false positives die in the join. */
  def prefilterJoin(probe: DataFrame, probeKey: String,
                    build: DataFrame, buildKey: String,
                    expectedItems: Long, fpp: Double = 0.03): DataFrame =
    bloomBytes(build, col(buildKey), expectedItems, fpp) match {
      case None => probe.filter(lit(false)).join(build, col(probeKey) === col(buildKey))
      case Some(bits) =>
        probe.filter(mightContain(bits, col(probeKey)))
          .join(build, col(probeKey) === col(buildKey))
    }

  /** Revenue of lineitems belonging to urgent open orders — the
    * selective-dimension fact join, probe side pre-filtered by the
    * bloom of the surviving order keys. ~1.6% of orders survive the
    * build filter, so ~98% of lineitem rows drop at the scan instead
    * of crossing the exchange. */
  def bloomPrefilterRevenue(s: SparkSession, dir: String): DataFrame = {
    val build = Tables.orders(s, dir)
      .filter(col("o_orderstatus") === "O" && col("o_orderpriority") === "1-URGENT")
      .select("o_orderkey", "o_orderpriority")
    val probe = Tables.lineitem(s, dir)
      .select("l_orderkey", "l_extendedprice", "l_discount", "l_returnflag")
    prefilterJoin(probe, "l_orderkey", build, "o_orderkey",
        expectedItems = 100000L, fpp = 0.01)
      .groupBy(col("l_returnflag"))
      .agg(count(lit(1)).as("n_items"),
        sum(round(col("l_extendedprice") * (lit(1.0) - col("l_discount")) * 100, 0)
          .cast(LongType)).as("revenue_e2"))
  }

  val defs: Seq[GraftQuery] = Seq(
    sql("bloom_prefilter_join",
      """SELECT l_returnflag, COUNT(*) AS n_items,
        | CAST(SUM(CAST(round(l_extendedprice * (1.0 - l_discount) * 100, 0) AS BIGINT)) AS BIGINT) AS revenue_e2
        |FROM lineitem, orders
        |WHERE l_orderkey = o_orderkey
        | AND o_orderstatus = 'O' AND o_orderpriority = '1-URGENT'
        |GROUP BY l_returnflag""".stripMargin)(bloomPrefilterRevenue))
}
