package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.sources.Partitioning

class PartitioningSpec extends AnyFunSuite {
  import SparkTestSession.{spark, sfTiny}

  test("partitioned layout is a lossless relayout of lineitem") {
    val root = Partitioning.lineitemByYearRoot(spark, sfTiny)
    val back = spark.read.parquet(root)
    val orig = Tables.lineitem(spark, sfTiny)
    assert(back.count() == orig.count())
    // the partition column is derived, everything else survives intact
    val cols = orig.columns.toSeq
    val a = back.select(cols.map(col): _*)
    assert(a.exceptAll(orig).isEmpty && orig.exceptAll(a).isEmpty)
    // one directory per shipdate year
    val years = new java.io.File(root).listFiles()
      .filter(f => f.isDirectory && f.getName.startsWith("l_year="))
    assert(years.length ==
      orig.select(year(col("l_shipdate"))).distinct().count())
  }

  test("static prune reads strictly fewer partition rows and carries the filter in the scan") {
    val root = Partitioning.lineitemByYearRoot(spark, sfTiny)
    val all = spark.read.parquet(root)
    val pruned = all.filter(col("l_year") === 1997)
    // DataFrame.inputFiles ignores partition pruning; the executed
    // plan's scan is the truthful surface
    val plan = pruned.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters") && plan.contains("1997"), plan.take(800))
    val prunedRows = pruned.count()
    assert(prunedRows > 0 && prunedRows < all.count())
    assert(pruned.select(countDistinct(col("l_year"))).collect()(0).getLong(0) == 1L)
  }
}
