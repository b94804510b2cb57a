package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.operators.MatViews
import graft.plans.MaterializedViewRewrite

class MatViewSpec extends AnyFunSuite {
  import SparkTestSession.{spark, sfTiny}

  private def freshRegistered(): (org.apache.spark.sql.SparkSession, String) = {
    val ss = spark.newSession()
    MaterializedViewRewrite.install(ss)
    val mvDir = java.nio.file.Files.createTempDirectory("graft_mv_spec").toString
    MatViews.buildAndRegister(ss, sfTiny, mvDir)
    (ss, mvDir)
  }

  test("rewritten answers are bit-identical to the raw-scan answers") {
    val (ss, mvDir) = freshRegistered()
    val rewritten = MatViews.revenueByFlag(ss, sfTiny)
    assert(rewritten.queryExecution.executedPlan.toString.contains(mvDir))
    // raw: same query in a session WITHOUT the view registered
    val raw = MatViews.revenueByFlag(spark, sfTiny)
    assert(!raw.queryExecution.executedPlan.toString.contains(mvDir))
    assert(rewritten.exceptAll(raw).isEmpty && raw.exceptAll(rewritten).isEmpty &&
      rewritten.count() == raw.count() && raw.count() > 0)
  }

  test("subsumption guards: out-of-scope queries keep the raw scan and stay correct") {
    val (ss, mvDir) = freshRegistered()
    def factScanned(df: org.apache.spark.sql.DataFrame): Boolean = {
      val p = df.queryExecution.executedPlan.toString
      p.contains("lineitem.parquet") && !p.contains(mvDir)
    }
    // (1) filter on a MEASURE column — does not commute with pre-agg
    val f1 = Tables.lineitem(ss, sfTiny).filter(col("l_quantity") > 10)
      .groupBy(col("l_returnflag")).agg(count(lit(1)).as("n"))
    assert(factScanned(f1))
    // (2) grouping key outside dims
    val f2 = Tables.lineitem(ss, sfTiny)
      .groupBy(col("l_shipdate")).agg(count(lit(1)).as("n"))
    assert(factScanned(f2))
    // (3) unregistered measure
    val f3 = Tables.lineitem(ss, sfTiny)
      .groupBy(col("l_returnflag")).agg(sum(col("l_tax")).as("s"))
    assert(factScanned(f3))
    // (4) DISTINCT aggregate
    val f4 = Tables.lineitem(ss, sfTiny)
      .groupBy(col("l_returnflag")).agg(countDistinct(col("l_orderkey")).as("n"))
    assert(factScanned(f4))
    // and each of them still answers correctly from the raw scan
    assert(f1.count() > 0 && f2.count() > 0 && f3.count() > 0 && f4.count() > 0)
  }

  test("dims-only grouping without filter rewrites; other sources are untouched") {
    val (ss, mvDir) = freshRegistered()
    val full = Tables.lineitem(ss, sfTiny)
      .groupBy(col("l_returnflag"), col("l_linestatus"))
      .agg(count(lit(1)).as("n"))
    assert(full.queryExecution.executedPlan.toString.contains(mvDir))
    val raw = Tables.lineitem(spark, sfTiny)
      .groupBy(col("l_returnflag"), col("l_linestatus"))
      .agg(count(lit(1)).as("n"))
    assert(full.exceptAll(raw).isEmpty && raw.exceptAll(full).isEmpty)
    // an aggregate over a DIFFERENT table in the same session is untouched
    val other = Tables.orders(ss, sfTiny)
      .groupBy(col("o_orderstatus")).agg(count(lit(1)).as("n"))
    assert(other.queryExecution.executedPlan.toString.contains("orders.parquet"))
  }

  test("incremental refresh equals a full rebuild of the post-change summary") {
    val refreshed = SparkEntry.queries("mv_refresh_incremental")(spark, sfTiny)
    val rebuilt = Tables.lineitem(spark, sfTiny)
      .filter(!(col("l_orderkey") % 50 =!= 0 && col("l_linenumber") === 3))
      .groupBy(col("l_returnflag"), col("l_linestatus"))
      .agg(sum(expr(MatViews.RevenueMeasure)).as("rev_e4"), count(lit(1)).as("cnt"))
    assert(refreshed.exceptAll(rebuilt).isEmpty && rebuilt.exceptAll(refreshed).isEmpty &&
      refreshed.count() == rebuilt.count() && refreshed.count() > 0)
  }
}
