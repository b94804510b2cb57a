package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.plans.GroupedTopK

class GroupedTopKSpec extends AnyFunSuite {
  import SparkTestSession.spark
  import spark.implicits._

  private def topkSession() = {
    val ss = spark.newSession()
    ss.conf.set(GroupedTopK.RewriteConf, "true")
    GroupedTopK.install(ss)
    ss
  }

  private def frame(ss: org.apache.spark.sql.SparkSession) = {
    import ss.implicits._
    (0L until 2000L).map(i => (s"g${i % 11}", (i * 37) % 97, i))
      .toDF("g", "s", "id")
  }

  private def query(df: org.apache.spark.sql.DataFrame, k: Int) = {
    val w = Window.partitionBy(col("g")).orderBy(col("s").desc, col("id"))
    df.withColumn("rn", row_number().over(w)).filter(col("rn") <= k)
  }

  test("inert without the conf; armed it replaces Window AND WindowGroupLimit, no sorts") {
    val plain = query(frame(spark), 3).queryExecution.executedPlan.toString
    assert(!plain.contains("GroupedTopK ") &&
      (plain.contains("Window [") || plain.contains("WindowGroupLimit")))
    val ss = topkSession()
    val armed = query(frame(ss), 3).queryExecution.executedPlan.toString
    assert(armed.contains("GroupedTopK "), armed.take(800))
    assert(!armed.contains("WindowGroupLimit") && !armed.contains("Window [") &&
      !armed.contains("Sort ["), armed.take(800))
  }

  test("answers equal the stock plan row-for-row, rank included, ties resolved identically") {
    val ss = topkSession()
    for (k <- Seq(1, 3, 20)) {
      val got = query(frame(ss), k).collect().map(_.toString).sorted.toSeq
      val want = query(frame(spark), k).collect().map(_.toString).sorted.toSeq
      assert(got == want && got.nonEmpty, s"k=$k: ${got.size} vs ${want.size}")
    }
  }

  test("the strict form rn < k compiles to k-1") {
    val ss = topkSession()
    val w = Window.partitionBy(col("g")).orderBy(col("s").desc, col("id"))
    val df = frame(ss).withColumn("rn", row_number().over(w)).filter(col("rn") < 4)
    assert(df.queryExecution.executedPlan.toString.contains("GroupedTopK "))
    assert(df.groupBy("g").count().collect().forall(_.getLong(1) == 3L))
  }

  test("rank() rewrites ties-aware: boundary ties kept, gap ranks, equals stock") {
    val ss = topkSession()
    // s = i % 7 gives heavy ties in every group; rank <= 3 keeps the
    // top tie-classes wholesale with gap ranks
    def tied(sess: org.apache.spark.sql.SparkSession) = {
      import sess.implicits._
      (0L until 1400L).map(i => (s"g${i % 5}", i % 7, i)).toDF("g", "s", "id")
    }
    val w = Window.partitionBy(col("g")).orderBy(col("s").desc)
    def q(df: org.apache.spark.sql.DataFrame) =
      df.withColumn("rn", rank().over(w)).filter(col("rn") <= 3)
    val armed = q(tied(ss))
    val plan = armed.queryExecution.executedPlan.toString
    assert(plan.contains("GroupedTopK ") && !plan.contains("Sort ["), plan.take(800))
    val got = armed.collect().map(_.toString).sorted.toSeq
    val want = q(tied(spark)).collect().map(_.toString).sorted.toSeq
    assert(got == want && got.nonEmpty, s"${got.size} vs ${want.size}")
    // gap ranks: the 40-row top tie-class makes the next rank 41 > 3,
    // so rank<=3 keeps exactly the boundary class — 40 rows per group
    // (MORE than k: the ties-kept semantics row_number cannot express)
    val ranks = armed.select("rn").distinct().collect().map(_.getInt(0)).sorted
    assert(ranks.toSeq == Seq(1), ranks.toSeq)
    assert(armed.groupBy("g").count().collect().forall(_.getLong(1) == 40L))
  }

  test("budget breach flushes the partial side and spills the final side, answers exact") {
    val ss = topkSession()
    ss.conf.set(GroupedTopK.TaskRowBudgetConf, "40") // tiny: forces both paths
    val got = query(frame(ss), 7).collect().map(_.toString).sorted.toSeq
    val want = query(frame(spark), 7).collect().map(_.toString).sorted.toSeq
    assert(got == want && got.nonEmpty, s"${got.size} vs ${want.size}")
    // ties mode through the spill path too
    val w = Window.partitionBy(col("g")).orderBy((col("s") % 5).desc)
    def q(df: org.apache.spark.sql.DataFrame) =
      df.withColumn("rn", rank().over(w)).filter(col("rn") <= 2)
    val gotT = q(frame(ss)).collect().map(_.toString).sorted.toSeq
    val wantT = q(frame(spark)).collect().map(_.toString).sorted.toSeq
    assert(gotT == wantT && gotT.nonEmpty, s"${gotT.size} vs ${wantT.size}")
    ss.conf.unset(GroupedTopK.TaskRowBudgetConf)
  }

  test("giant boundary tie class through the spill merge: whole group ties at rank 1") {
    // the r9-advice case: rank() over a CONSTANT order key makes every
    // row of every group tie at rank 1 — the legitimate output is the
    // entire group, far past the row budget. The merge must STREAM
    // the tie class (runs are (key, orderSpec)-sorted, ranks computed
    // positionally), never re-fold a whole group in memory.
    val ss = topkSession()
    ss.conf.set(GroupedTopK.TaskRowBudgetConf, "25") // << 500-row tie classes
    def tied(sess: org.apache.spark.sql.SparkSession) = {
      import sess.implicits._
      (0L until 1500L).map(i => (s"g${i % 3}", 1L, i)).toDF("g", "s", "id")
        .repartition(5)
    }
    val w = Window.partitionBy(col("g")).orderBy(col("s").desc)
    def q(df: org.apache.spark.sql.DataFrame) =
      df.withColumn("rn", rank().over(w)).filter(col("rn") <= 2)
    val armed = q(tied(ss))
    assert(armed.queryExecution.executedPlan.toString.contains("GroupedTopK "))
    val got = armed.collect().map(_.toString).sorted.toSeq
    val want = q(tied(spark)).collect().map(_.toString).sorted.toSeq
    assert(got == want && got.size == 1500, s"${got.size} vs ${want.size}")
    ss.conf.unset(GroupedTopK.TaskRowBudgetConf)
  }

  test("PROPERTY: random frames x k x tiny budgets equal stock, both rank modes") {
    val rnd = new scala.util.Random(20260814L)
    for (trial <- 0 until 6) {
      val nGroups = 1 + rnd.nextInt(9)
      val rows = (0 until 300 + rnd.nextInt(700)).map { i =>
        (s"g${rnd.nextInt(nGroups)}", rnd.nextInt(1 + rnd.nextInt(40)).toLong, i.toLong)
      }
      val k = 1 + rnd.nextInt(9)
      val budget = (k + rnd.nextInt(60)).toString
      val ss = topkSession()
      ss.conf.set(GroupedTopK.TaskRowBudgetConf, budget)
      def frames(sess: org.apache.spark.sql.SparkSession) = {
        import sess.implicits._
        rows.toDF("g", "s", "id").repartition(1 + rnd.nextInt(7))
      }
      val w = Window.partitionBy(col("g")).orderBy(col("s").desc, col("id"))
      val armedRn = frames(ss).withColumn("rn", row_number().over(w)).filter(col("rn") <= k)
      val stockRn = frames(spark).withColumn("rn", row_number().over(w)).filter(col("rn") <= k)
      assert(armedRn.queryExecution.executedPlan.toString.contains("GroupedTopK "))
      assert(armedRn.collect().map(_.toString).sorted.toSeq ==
        stockRn.collect().map(_.toString).sorted.toSeq,
        s"row_number trial $trial (k=$k budget=$budget)")
      // rank mode orders on s ALONE: the narrow value range makes
      // heavy boundary tie-classes, the case the ties-heap exists for
      val w2 = Window.partitionBy(col("g")).orderBy(col("s").desc)
      val armedRk = frames(ss).withColumn("rn", rank().over(w2)).filter(col("rn") <= k)
      val stockRk = frames(spark).withColumn("rn", rank().over(w2)).filter(col("rn") <= k)
      assert(armedRk.collect().map(_.toString).sorted.toSeq ==
        stockRk.collect().map(_.toString).sorted.toSeq,
        s"rank trial $trial (k=$k budget=$budget)")
      ss.conf.unset(GroupedTopK.TaskRowBudgetConf)
    }
  }

  test("the k bounds hold on the NODE, not just the rewrite pattern") {
    val ex = intercept[IllegalArgumentException](
      graft.plans.GroupedTopKPlan(Nil, Nil, 0, null, null))
    assert(ex.getMessage.contains("limit"), ex.getMessage)
    val ex2 = intercept[IllegalArgumentException](
      graft.plans.GroupedTopKPlan(Nil, Nil, GroupedTopK.MaxK + 1, null, null))
    assert(ex2.getMessage.contains("limit"), ex2.getMessage)
  }

  test("dense_rank rewrites: k distinct classes kept whole, equals stock, spill path too") {
    val ss = topkSession()
    // order on s % 5 alone: few distinct classes, many rows per class
    // — the shape where dense_rank's bound does NOT limit rows per
    // group (a kept class can be huge) and the class-keyed keep-set +
    // row-budget machinery must carry it
    def tied(sess: org.apache.spark.sql.SparkSession) = {
      import sess.implicits._
      (0L until 1200L).map(i => (s"g${i % 4}", i % 5, i)).toDF("g", "s", "id")
        .repartition(5)
    }
    val w = Window.partitionBy(col("g")).orderBy((col("s") % 5).desc)
    def q(df: org.apache.spark.sql.DataFrame) =
      df.withColumn("rn", dense_rank().over(w)).filter(col("rn") <= 3)
    val armed = q(tied(ss))
    val plan = armed.queryExecution.executedPlan.toString
    assert(plan.contains("GroupedTopK ") && !plan.contains("Sort ["), plan.take(800))
    val got = armed.collect().map(_.toString).sorted.toSeq
    val want = q(tied(spark)).collect().map(_.toString).sorted.toSeq
    assert(got == want && got.nonEmpty, s"${got.size} vs ${want.size}")
    // ranks are DENSE: 1,2,3 all present, no gaps, 60 rows per
    // (group, class)
    assert(armed.select("rn").distinct().collect().map(_.getInt(0)).sorted.toSeq ==
      Seq(1, 2, 3))
    // and through the spill path (budget << rows of the kept classes)
    ss.conf.set(GroupedTopK.TaskRowBudgetConf, "30")
    val gotSpill = q(tied(ss)).collect().map(_.toString).sorted.toSeq
    assert(gotSpill == want, s"${gotSpill.size} vs ${want.size}")
    ss.conf.unset(GroupedTopK.TaskRowBudgetConf)
  }

  test("conservative scope: extra predicates and multi-window keep the stock plan") {
    val ss = topkSession()
    val w = Window.partitionBy(col("g")).orderBy(col("s").desc, col("id"))
    // an extra predicate beside the bound — must NOT rewrite
    val r2 = query(frame(ss), 3).filter(col("s") > 10)
    // (the extra filter lands ABOVE the topk node or fuses into the
    // Filter; either the rewrite fired with the bound alone and the
    // residual filter stays, or it did not fire — both must answer
    // identically to stock)
    val want2 = query(frame(spark), 3).filter(col("s") > 10)
      .collect().map(_.toString).sorted.toSeq
    assert(r2.collect().map(_.toString).sorted.toSeq == want2)
    // two window expressions — must NOT rewrite
    val r3 = frame(ss)
      .withColumn("rn", row_number().over(w))
      .withColumn("mx", max(col("s")).over(Window.partitionBy(col("g"))))
      .filter(col("rn") <= 3)
    assert(!r3.queryExecution.executedPlan.toString.contains("GroupedTopK ") ||
      r3.collect().map(_.toString).sorted.toSeq ==
        query(frame(spark), 3)
          .withColumn("mx", max(col("s")).over(Window.partitionBy(col("g"))))
          .collect().map(_.toString).sorted.toSeq)
  }

  test("global top-k (empty partition spec) gathers to a single group") {
    val ss = topkSession()
    val w = Window.orderBy(col("s").desc, col("id"))
    val df = frame(ss).withColumn("rn", row_number().over(w)).filter(col("rn") <= 5)
    val got = df.collect().map(r => (r.getLong(1), r.getLong(2), r.getInt(3))).sortBy(_._3)
    val want = frame(spark).collect().map(r => (r.getLong(1), r.getLong(2)))
      .sortBy { case (s, id) => (-s, id) }.take(5)
      .zipWithIndex.map { case ((s, id), i) => (s, id, i + 1) }
    assert(got.toSeq == want.toSeq)
  }
}
