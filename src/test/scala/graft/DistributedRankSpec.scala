package graft

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.DistributedRank

/** DistributedRank = the scale-safe replacement for unpartitioned
  * windows: exact global rank / NTILE via range repartition +
  * per-partition row_number + broadcast offsets. The gate is
  * equivalence with the stock single-partition window on the SAME
  * total order — stock is the semantic oracle, DistributedRank the
  * shape we actually ship. */
class DistributedRankSpec extends AnyFunSuite {
  import SparkTestSession.spark
  import spark.implicits._

  // deterministic seeded sampling (the scalatest-scalacheck bridge is
  // not in the offline cache — same idiom as DeltaEngineSpec)
  private def samples[A](gen: Gen[A], n: Int): Seq[A] =
    (0 until n).flatMap(i => gen.apply(Gen.Parameters.default, Seed(1042L + i)))

  private def stockRanked(rows: Seq[(Long, Long)]) = {
    val df = rows.toDF("k", "v").repartition(4)
    val w = Window.orderBy(col("v").desc, col("k"))
    df.select(col("k"), row_number().over(w).cast("long").as("rk"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
  }

  test("global rank matches the stock unpartitioned window on a fixed frame") {
    val rows = (1L to 500L).map(k => k -> (k * 7919 % 97))
    val df = rows.toDF("k", "v").repartition(4)
    val (ranked, n) = DistributedRank.withGlobalRank(df, "rk",
      col("v").desc, col("k"))
    assert(n == 500L)
    val got = ranked.select("k", "rk").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == stockRanked(rows))
  }

  test("withNtile matches stock NTILE for every k and ragged sizes") {
    // sizes chosen to hit every n % k residue incl. n < k
    for (size <- Seq(1, 3, 4, 5, 17, 100); k <- Seq(2, 4, 7)) {
      val rows = (1L to size.toLong).map(i => i -> (i * 31 % 13))
      val df = rows.toDF("k", "v").repartition(3)
      val got = DistributedRank.withNtile(df, "t", k, col("v").desc, col("k"))
        .select("k", "t").collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
      val w = Window.orderBy(col("v").desc, col("k"))
      val want = rows.toDF("k", "v")
        .select(col("k"), ntile(k).over(w).as("t"))
        .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
      assert(got == want, s"size=$size k=$k")
    }
  }

  test("property: random frames rank identically to the stock window") {
    val gen = Gen.choose(1, 80).flatMap(sz =>
      Gen.listOfN(sz, Gen.choose(-50L, 50L)))
    samples(gen, 8).foreach { vs =>
      val rows = vs.zipWithIndex.map { case (v, i) => (i.toLong, v) }
      val df = rows.toDF("k", "v").repartition(5)
      val (ranked, n) = DistributedRank.withGlobalRank(df, "rk",
        col("v").desc, col("k"))
      assert(n == rows.size.toLong)
      val got = ranked.select("k", "rk").collect()
        .map(r => r.getLong(0) -> r.getLong(1)).toMap
      assert(got == stockRanked(rows))
    }
  }

  test("plan is fully partitioned: no Window without partitionBy") {
    val df = (1L to 100L).map(i => i -> i % 7).toDF("k", "v")
    val (ranked, _) = DistributedRank.withGlobalRank(df, "rk",
      col("v").desc, col("k"))
    val bad = ranked.queryExecution.optimizedPlan.collect {
      case w: org.apache.spark.sql.catalyst.plans.logical.Window
          if w.partitionSpec.isEmpty => w
    }
    assert(bad.isEmpty, "DistributedRank itself must never plan a global window")
  }
}
