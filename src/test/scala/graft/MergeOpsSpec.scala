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

  test("a streaming change feed maintains a keyed parquet table via foreachBatch merge") {
    import spark.implicits._
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sq: org.apache.spark.sql.SQLContext = spark.sqlContext
    val payload = Seq("o_custkey", "o_orderstatus", "o_totalprice")
    val orders = Tables.orders(spark, sfTiny)
      .select(("o_orderkey" +: payload).map(col): _*)
    val dir = java.nio.file.Files.createTempDirectory("graft_merge_tbl").toString
    orders.write.mode("overwrite").parquet(dir)

    // two micro-batches: updates first, then deletes + inserts
    val batch1 = orders.filter(col("o_orderkey") % 10 === 1)
      .select(col("o_orderkey"), lit("U").as("op"), col("o_custkey"),
        col("o_orderstatus"), (col("o_totalprice") + lit(1000)).as("o_totalprice"))
      .as[(Long, String, Long, String, Double)].collect().toSeq
    val batch2 = (orders.filter(col("o_orderkey") % 10 === 0)
        .select(col("o_orderkey"), lit("D").as("op"), col("o_custkey"),
          col("o_orderstatus"), col("o_totalprice"))
      unionAll orders.filter(col("o_orderkey") % 10 === 2)
        .select((col("o_orderkey") + lit(10000000L)).as("o_orderkey"),
          lit("I").as("op"), col("o_custkey"), col("o_orderstatus"), col("o_totalprice")))
      .as[(Long, String, Long, String, Double)].collect().toSeq

    val ms = MemoryStream[(Long, String, Long, String, Double)]
    val query = ms.toDS()
      .toDF("o_orderkey", "op", "o_custkey", "o_orderstatus", "o_totalprice")
      .writeStream
      .foreachBatch { (changes: org.apache.spark.sql.DataFrame, _: Long) =>
        // read-merge-overwrite cycle: localCheckpoint materializes the
        // merged rows before the overwrite deletes their source files
        // (the IvfIndex staging-hop pattern; a table format's
        // transaction in production)
        val target = spark.read.parquet(dir)
        MergeOps.mergeUpsert(target, changes, "o_orderkey", payload)
          .localCheckpoint(true)
          .write.mode("overwrite").parquet(dir)
        ()
      }
      .start()
    try {
      ms.addData(batch1); query.processAllAvailable()
      ms.addData(batch2); query.processAllAvailable()
    } finally query.stop()

    // the streamed table equals the one-shot batch merge of all changes
    val want = SparkEntry.queries("merge_upsert_orders")(spark, sfTiny)
    val got = spark.read.parquet(dir)
    assert(got.exceptAll(want).count() == 0 && want.exceptAll(got).count() == 0 &&
      got.count() == want.count())
  }

  test("matched inserts resolve as updates (SQL MERGE when-matched wins)") {
    import spark.implicits._
    val target = Seq((1L, 10L, "O", 5.0), (2L, 20L, "F", 7.0))
      .toDF("o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice")
    // an 'I' whose key already exists in the target
    val changes = Seq((1L, "I", 99L, "P", 42.0))
      .toDF("o_orderkey", "op", "o_custkey", "o_orderstatus", "o_totalprice")
    val merged = MergeOps.mergeUpsert(target, changes, "o_orderkey",
      Seq("o_custkey", "o_orderstatus", "o_totalprice"))
    val rows = merged.orderBy("o_orderkey").collect()
    assert(rows.length == 2)                       // no duplicate key created
    assert(rows(0).getLong(1) == 99L && rows(0).getDouble(3) == 42.0)
    assert(rows(1).getLong(1) == 20L)              // unmatched row untouched
  }

  test("duplicate-keyed change sets violate the documented precondition (fan-out)") {
    import spark.implicits._
    val target = Seq((1L, 10L, "O", 5.0))
      .toDF("o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice")
    val dup = Seq((1L, "U", 11L, "O", 6.0), (1L, "U", 12L, "O", 7.0))
      .toDF("o_orderkey", "op", "o_custkey", "o_orderstatus", "o_totalprice")
    // the join fans the target row out — exactly why callers must
    // compact to one change per key (last-writer-wins) first
    assert(MergeOps.mergeUpsert(target, dup, "o_orderkey",
      Seq("o_custkey", "o_orderstatus", "o_totalprice")).count() == 2)
    val compacted = dup.withColumn("rn",
        row_number().over(org.apache.spark.sql.expressions.Window
          .partitionBy("o_orderkey").orderBy(col("o_custkey").desc)))
      .filter(col("rn") === 1).drop("rn")
    val merged = MergeOps.mergeUpsert(target, compacted, "o_orderkey",
      Seq("o_custkey", "o_orderstatus", "o_totalprice"))
    assert(merged.count() == 1 && merged.head().getLong(1) == 12L)
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

  test("temporal dim join picks the version in effect at each order's date") {
    import org.apache.spark.sql.functions._
    val rows = SparkEntry.queries("orders_temporal_dim_join")(spark, sfTiny).collect()
    assert(rows.nonEmpty)
    val segs = Tables.customer(spark, sfTiny)
      .collect().map(r => r.getLong(0) -> r.getString(r.fieldIndex("c_mktsegment"))).toMap
    rows.foreach { r =>
      val ck = r.getLong(1)
      val od = r.get(2) match {
        case t: java.sql.Timestamp => t.toLocalDateTime.getYear
        case t: java.time.LocalDateTime => t.getYear
      }
      val seg = r.getString(3)
      val expected =
        if (ck % 6 == 0 && od >= 2000) "PREMIUM"
        else if (ck % 2 == 0 && od >= 1998) "UPGRADED"
        else segs(ck)
      assert(seg == expected, s"custkey=$ck year=$od got=$seg want=$expected")
    }
  }
}
