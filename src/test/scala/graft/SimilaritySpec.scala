package graft

import org.scalatest.funsuite.AnyFunSuite

class SimilaritySpec extends AnyFunSuite {
  import SparkTestSession.{spark, sfTiny}

  test("brute-force top-k returns exactly k ranked neighbors per query") {
    val rows = SparkEntry.queries("ann_bruteforce_topk")(spark, sfTiny).collect()
    val byQuery = rows.groupBy(_.getLong(0))
    assert(byQuery.size == 5)
    byQuery.foreach { case (_, rs) =>
      assert(rs.map(_.getInt(2)).sorted.toSeq == (1 to 10))
      val sims = rs.sortBy(_.getInt(2)).map(_.getDouble(3))
      assert(sims.zip(sims.tail).forall { case (a, b) => a >= b }, "ranks ordered by cosine desc")
    }
  }

  test("LSH candidates agree with brute-force cosine on shared pairs") {
    val bf = SparkEntry.queries("ann_bruteforce_topk")(spark, sfTiny).collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(3)).toMap
    val lsh = SparkEntry.queries("ann_lsh_topk")(spark, sfTiny).collect()
    assert(lsh.nonEmpty)
    lsh.foreach { r =>
      val key = (r.getLong(0), r.getLong(1))
      bf.get(key).foreach(c => assert(math.abs(c - r.getDouble(4)) < 1e-9))
    }
  }

  test("persisted IVF index: probe reads prune to its cells (PartitionFilters)") {
    import org.apache.spark.sql.functions._
    import graft.functions.VectorOps.{cosine, toDoubleVec}
    import org.apache.spark.sql.expressions.Window
    // build the IVF assignment exactly as ann_ivf_topk does...
    val e = Tables.embeddings(spark, sfTiny)
      .select(col("vec_id"), toDoubleVec(col("embedding")).as("v"))
    val cents = graft.operators.SimilaritySearch.seedCentroids(
      e, graft.operators.SimilaritySearch.IvfCells)
    val w = Window.partitionBy(col("vec_id"))
      .orderBy(cosine(col("v"), col("cv")).desc, col("cent_id"))
    val assigned = e.join(broadcast(cents))
      .withColumn("r", row_number().over(w)).filter(col("r") === 1)
      .select(col("vec_id"), col("v"), col("cent_id"))
    // ...persist it cell-partitioned and probe two cells
    val path = java.nio.file.Files.createTempDirectory("graft_ivf").toString
    graft.sources.Bucketing.writePartitioned(assigned, path, "cent_id")
    val cells = assigned.select("cent_id").distinct()
      .collect().map(_.getLong(0)).sorted.take(2).toSeq
    val probe = graft.sources.Bucketing.readPartition(spark, path, "cent_id", cells)
    // the filter must land in PartitionFilters (directory pruning),
    // NOT as a data filter over a full scan
    val scan = probe.queryExecution.executedPlan.collectLeaves().mkString("\n")
    assert(scan.contains("PartitionFilters") && scan.contains("cent_id"), scan)
    assert(!scan.contains("PushedFilters: [In(cent_id"), scan)
    // and the probe returns exactly those cells' vectors
    val want = assigned.filter(col("cent_id").isin(cells.map(Long.box): _*))
      .select("vec_id").collect().map(_.getLong(0)).sorted.toSeq
    val got = probe.select("vec_id").collect().map(_.getLong(0)).sorted.toSeq
    assert(got == want && got.nonEmpty)
  }
}
