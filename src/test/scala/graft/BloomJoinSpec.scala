package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.BloomJoin

class BloomJoinSpec extends AnyFunSuite {
  private def s = SparkTestSession.spark
  private val d = SparkTestSession.sfTiny

  test("bloom pre-filtered join is EXACT and actually prunes the probe side") {
    val build = Tables.orders(s, d)
      .filter(col("o_orderstatus") === "O" && col("o_orderpriority") === "1-URGENT")
      .select("o_orderkey", "o_orderpriority")
    val probe = Tables.lineitem(s, d).select("l_orderkey", "l_extendedprice")

    val plain = probe.join(build, col("l_orderkey") === col("o_orderkey"))
      .orderBy("l_orderkey", "l_extendedprice").collect().toSeq
    val bloomed = BloomJoin.prefilterJoin(probe, "l_orderkey", build, "o_orderkey",
        expectedItems = 10000L, fpp = 0.01)
      .orderBy("l_orderkey", "l_extendedprice").collect().toSeq
    assert(bloomed == plain && plain.nonEmpty)

    // no false negatives by construction; the filter must also PRUNE:
    // the surviving probe fraction tracks the build selectivity (~2%
    // of orders) plus fpp — far below half
    val bits = BloomJoin.bloomBytes(build, col("o_orderkey"), 10000L, 0.01).get
    val kept = probe.filter(BloomJoin.mightContain(bits, col("l_orderkey"))).count()
    val total = probe.count()
    assert(kept < total / 2, s"bloom kept $kept of $total probe rows — not selective")
    assert(kept >= plain.size) // every true match survives the pre-filter
  }

  test("the might_contain filter sits on the probe side BELOW the join exchange") {
    val df = BloomJoin.bloomPrefilterRevenue(s, d)
    val plan = df.queryExecution.executedPlan.toString
    // the predicate exists, names Spark's native expression (codegen'd,
    // fuses into the scan stage), and appears before the first join in
    // the plan's probe subtree
    assert(plan.contains("might_contain"), plan.take(2000))
    val filterIdx = plan.indexOf("might_contain")
    val joinIdx = plan.indexOf("Join")
    assert(joinIdx >= 0 && filterIdx > joinIdx,
      "pre-filter should be in the probe subtree under the join")
  }

  test("empty build side yields an empty result, not a full probe scan") {
    val build = Tables.orders(s, d).filter(lit(false))
      .select("o_orderkey", "o_orderpriority")
    val probe = Tables.lineitem(s, d).select("l_orderkey")
    assert(BloomJoin.prefilterJoin(probe, "l_orderkey", build, "o_orderkey", 100L).count() == 0L)
  }
}
