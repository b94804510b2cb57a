package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.sources.Formats

class FormatsSpec extends AnyFunSuite {
  private def s = SparkTestSession.spark
  private val d = SparkTestSession.sfTiny

  test("ORC round trip is lossless for longs, doubles, and timestamps") {
    val back = Formats.orcRoundTrip(s, d)
      .orderBy("l_orderkey", "l_linenumber", "l_extendedprice").collect().toSeq
    val direct = Tables.lineitem(s, d).filter(col("l_returnflag") === "R")
      .select(col("l_orderkey"), col("l_linenumber").cast("long").as("l_linenumber"),
        col("l_quantity"), col("l_extendedprice"), col("l_shipdate"))
      .orderBy("l_orderkey", "l_linenumber", "l_extendedprice").collect().toSeq
    assert(back.nonEmpty && back == direct)
  }

  test("the flag predicate prunes ORC partitions at planning time") {
    val plan = Formats.orcRoundTrip(s, d).queryExecution.executedPlan.toString
    // the scan path contains "graft_orc_", so a substring check on
    // lowercase "orc" would be vacuously true — assert the scan's
    // format tag specifically
    assert(plan.contains("Format: ORC"), plan.take(1200))
    assert(plan.contains("PartitionFilters") &&
      plan.replaceAll("(?s).*PartitionFilters: \\[([^\\]]*)\\].*", "$1")
        .contains("l_returnflag"), plan.take(1200))
  }
}
