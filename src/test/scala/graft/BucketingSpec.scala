package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
import graft.sources.Bucketing

/** The bucketed-layout co-located join: write once bucketed by the
  * join key, then every join on that key plans with ZERO shuffle
  * exchanges — the storage layout IS the partitioning. */
class BucketingSpec extends AnyFunSuite {
  import SparkTestSession.sfTiny
  // a CHILD session: the forced non-broadcast threshold must never
  // leak into concurrently running suites (plan snapshots read the
  // shared session's conf) — session-level conf is isolated, the
  // catalog (bucketed tables) is shared
  private val spark = SparkTestSession.spark.newSession()

  test("join of two tables bucketed on the join key plans without a shuffle") {
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1") // force non-broadcast
    try {
      Bucketing.writeBucketed(
        Tables.orders(spark, sfTiny).select("o_orderkey", "o_custkey", "o_totalprice"),
        "b_orders", "o_orderkey", 4)
      Bucketing.writeBucketed(
        Tables.lineitem(spark, sfTiny)
          .withColumnRenamed("l_orderkey", "o_orderkey")
          .select("o_orderkey", "l_extendedprice"),
        "b_lineitem", "o_orderkey", 4)

      val joined = Bucketing.bucketedJoin(spark, "b_orders", "b_lineitem", "o_orderkey")
      val n = joined.count()
      assert(n == Tables.lineitem(spark, sfTiny).count(), "FK join keeps every lineitem")

      val executed = joined.queryExecution.executedPlan match {
        case a: AdaptiveSparkPlanExec => a.executedPlan
        case p => p
      }
      val shuffles = executed.collect { case e: ShuffleExchangeExec => e }
      assert(shuffles.isEmpty,
        s"bucketed join must not shuffle, found: ${shuffles.map(_.nodeName)}")
    } finally {
      spark.sql("DROP TABLE IF EXISTS b_orders")
      spark.sql("DROP TABLE IF EXISTS b_lineitem")
    }
  }
}
