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

  test("static prune scans strictly fewer files than the full table") {
    val root = Partitioning.lineitemByYearRoot(spark, sfTiny)
    val all = spark.read.parquet(root)
    val pruned = all.filter(col("l_year") === 1997)
    assert(pruned.inputFiles.length < all.inputFiles.length)
    assert(pruned.inputFiles.forall(_.contains("l_year=1997")))
  }
}
