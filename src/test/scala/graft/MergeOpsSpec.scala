package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.operators.MergeOps

class MergeOpsSpec extends AnyFunSuite {
  import SparkTestSession.{spark, sfTiny}

  test("merge applies all three actions and leaves untouched rows bit-identical") {
    val orders = Tables.orders(spark, sfTiny)
      .select("o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice")
    val merged = SparkEntry.queries("merge_upsert_orders")(spark, sfTiny)

    val n = orders.count()
    val nDel = orders.filter(col("o_orderkey") % 10 === 0).count()
    val nIns = orders.filter(col("o_orderkey") % 10 === 2).count()
    assert(merged.count() == n - nDel + nIns)
    // deletes gone, inserts present at shifted keys
    assert(merged.filter(col("o_orderkey") % 10 === 0 &&
      col("o_orderkey") < 10000000L).count() == 0)
    assert(merged.filter(col("o_orderkey") >= 10000000L).count() == nIns)
    // updates took the source payload…
    val bumped = merged.as("m")
      .join(orders.filter(col("o_orderkey") % 10 === 1).as("o"), Seq("o_orderkey"))
      .filter(col("m.o_totalprice") =!= col("o.o_totalprice") + 1000)
    assert(bumped.count() == 0)
    // …and every untouched row passed through bit-identical
    val untouched = orders.filter(col("o_orderkey") % 10 =!= 0 && col("o_orderkey") % 10 =!= 1)
    assert(merged.filter(col("o_orderkey") < 10000000L &&
        col("o_orderkey") % 10 =!= 1)
      .exceptAll(untouched).count() == 0)
  }

  test("merge with an empty change set is the identity") {
    import spark.implicits._
    val orders = Tables.orders(spark, sfTiny)
      .select("o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice")
    val empty = Seq.empty[(Long, String, Long, String, Double)]
      .toDF("o_orderkey", "op", "o_custkey", "o_orderstatus", "o_totalprice")
    val merged = MergeOps.mergeUpsert(orders, empty, "o_orderkey",
      Seq("o_custkey", "o_orderstatus", "o_totalprice"))
    assert(merged.exceptAll(orders).count() == 0 &&
      orders.exceptAll(merged).count() == 0)
  }
}
