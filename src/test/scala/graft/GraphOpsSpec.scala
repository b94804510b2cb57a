package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.operators.GraphOps

class GraphOpsSpec extends AnyFunSuite with org.scalatest.ParallelTestExecution {
  import SparkTestSession.spark
  import spark.implicits._

  // scalar reference of the integer power iteration
  private def ref(edges: Seq[(String, String)], iters: Int): Map[String, Long] = {
    val deg = edges.groupBy(_._1).view.mapValues(_.size.toLong).toMap
    val nodes = edges.map(_._1).distinct
    var r = nodes.map(_ -> 1000000L).toMap
    for (_ <- 1 to iters) {
      val contrib = edges.groupBy(_._2).view.mapValues(
        _.map { case (s, _) => r(s) / deg(s) }.sum).toMap
      r = nodes.map(n => n -> (150000L + 850000L * contrib.getOrElse(n, 0L) / 1000000L)).toMap
    }
    r
  }

  test("integer pagerank matches a scalar reference on a star graph, any partitioning") {
    val star = Seq("c" -> "l1", "c" -> "l2", "c" -> "l3")
    val edges = (star ++ star.map(_.swap)).toDF("src", "dst")
    val got = GraphOps.pagerankInt(edges, iters = 3)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val want = ref(star ++ star.map(_.swap), iters = 3)
    assert(got == want, s"$got vs $want")
    // hand-checked first iteration values survive as a regression pin
    val it1 = GraphOps.pagerankInt(edges, iters = 1)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(it1("c") == 2700000L && it1("l1") == 433333L, it1)
    // partitioning invariance: integer arithmetic cannot drift
    val shuffled = GraphOps.pagerankInt(edges.repartition(7), iters = 3)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(shuffled == got)
  }

  test("personalized pagerank restricts teleport mass to the seeds") {
    // path graph a—b—c—d (bidirectional), seed = {a}: mass flows out
    // from a only; d is two hops away and gets rank only at iter >= 2
    val path = Seq("a" -> "b", "b" -> "c", "c" -> "d")
    val edges = (path ++ path.map(_.swap)).toDF("src", "dst")
    val seeds = Seq("a").toDF("node")
    def run(iters: Int): Map[String, Long] =
      GraphOps.personalizedPagerankInt(edges, seeds, iters)
        .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    // scalar reference of the seeded integer iteration
    def ref(iters: Int): Map[String, Long] = {
      val es = path ++ path.map(_.swap)
      val deg = es.groupBy(_._1).view.mapValues(_.size.toLong).toMap
      val nodes = es.map(_._1).distinct
      var r = nodes.map(n => n -> (if (n == "a") 1000000L else 0L)).toMap
      for (_ <- 1 to iters) {
        val contrib = es.groupBy(_._2).view.mapValues(
          _.map { case (s, _) => r(s) / deg(s) }.sum).toMap
        r = nodes.map(n => n ->
          ((if (n == "a") 150000L else 0L) +
            850000L * contrib.getOrElse(n, 0L) / 1000000L)).toMap
      }
      r
    }
    val it1 = run(1)
    assert(it1 == ref(1), s"$it1 vs ${ref(1)}")
    // one hop: all of a's mass lands on b; c and d untouched
    assert(it1("b") == 850000L && it1("c") == 0L && it1("d") == 0L, it1)
    val it3 = run(3)
    assert(it3 == ref(3), s"$it3 vs ${ref(3)}")
    // the seed keeps its restart floor; distance ordering holds
    assert(it3("a") >= 150000L && it3("b") > it3("d"))
  }

  test("triangle counts match brute force on a known graph") {
    // K4 on {1,2,3,4} (4 triangles, each node in 3) plus a pendant
    // edge 4-5 (no triangle) and an isolated edge 6-7
    val k4 = for { a <- 1 to 4; b <- 1 to 4 if a < b } yield (a.toLong, b.toLong)
    val edges = (k4 ++ Seq((4L, 5L), (6L, 7L))).toDF("u", "v")
    val got = GraphOps.triangleCounts(edges)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == Map(1L -> 3L, 2L -> 3L, 3L -> 3L, 4L -> 3L), got)
    // total triangle count = Σ per-node / 3
    assert(got.values.sum / 3 == 4)
  }

  test("k-core peels transitively and loudly refuses a round cap that cannot converge") {
    // K4 on {1,2,3,4} is the 3-core; the pendant chain 4-5-6 must peel
    // in TWO dependent rounds (6 first, then 5 — degree only drops
    // below k once its neighbor left)
    val k4 = for { a <- 1 to 4; b <- 1 to 4 if a < b } yield (a.toLong, b.toLong)
    val edges = (k4 ++ Seq((4L, 5L), (5L, 6L))).toDF("u", "v")
    val got = GraphOps.kcore(edges, k = 3, maxRounds = 10)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == Map(1L -> 3L, 2L -> 3L, 3L -> 3L, 4L -> 3L), got)
    // k above the graph's max core empties cleanly (fixpoint at {})
    assert(GraphOps.kcore(edges, k = 4, maxRounds = 10).isEmpty)
    // a cap below convergence must fail loudly, never report a non-core
    val ex = intercept[IllegalArgumentException](
      GraphOps.kcore(edges, k = 3, maxRounds = 1).collect())
    assert(ex.getMessage.contains("converge"), ex.getMessage)
  }

  test("degree orientation tames a lexically-small hub; counts stay orientation-invariant") {
    // hub 0 (degree 20) + leaves 1..20; leaf edges (1,2) and (3,4)
    // close two triangles through the hub. Under id orientation the
    // hub would own all 20 directed edges (the skew trap this
    // guards); under (degree, id) orientation every hub edge points
    // INTO the hub and the max out-list is 2.
    val star = (1 to 20).map(i => (0L, i.toLong))
    val edges = (star ++ Seq((1L, 2L), (3L, 4L))).toDF("u", "v")
    val out = GraphOps.orientByDegree(edges)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(out.length == 22)
    val outDeg = out.groupBy(_._1).view.mapValues(_.size).toMap
    assert(!outDeg.contains(0L), s"hub kept directed edges: $outDeg")
    assert(outDeg.values.max <= 2, outDeg)
    // orientation must not change what a triangle is
    val got = GraphOps.triangleCounts(edges)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == Map(0L -> 2L, 1L -> 1L, 2L -> 1L, 3L -> 1L, 4L -> 1L), got)
  }

  test("persisted pagerank is bit-identical to the lazy loop and keeps plan depth flat") {
    val star = Seq("c" -> "l1", "c" -> "l2", "c" -> "l3")
    val edges = (star ++ star.map(_.swap)).toDF("src", "dst")
    val lazy8 = ref(star ++ star.map(_.swap), iters = 8)
    val persisted = GraphOps.pagerankIntPersisted(edges, iters = 8)
    val got = persisted.collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(got == lazy8, s"$got vs $lazy8")
    // lineage truncation: the final plan hangs off ONE cached round,
    // not 8 re-derived join trees — its string depth must not grow
    // with the iteration count (the lazy loop's does, exponentially).
    val planLines = persisted.queryExecution.optimizedPlan.toString.linesIterator.size
    assert(planLines < 30, s"expected a truncated plan, got $planLines lines")
  }


  test("label propagation runs the deterministic trajectory on a bridged two-triangle graph") {
    // triangles 1-2-3 and 4-5-6 joined by bridge 3-4; with the
    // neighbors-only vote and smallest-label ties the hand-computed
    // 4-round trajectory lands on communities {1,2,3}->1, {4,5,6}->3
    val edges = Seq(
      (1L, 2L), (1L, 3L), (2L, 3L), (4L, 5L), (4L, 6L), (5L, 6L), (3L, 4L)
    ).toDF("u", "v")
    val got = GraphOps.labelPropagation(edges, rounds = 4)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 4L -> 3L, 5L -> 3L, 6L -> 3L), got)
    // intermediate rounds differ (round 2 still has node 5 at 3 via a
    // tie and node 4 flapping) - the fixed round count is part of the
    // contract, so assert a distinct earlier state too
    val r2 = GraphOps.labelPropagation(edges, rounds = 2)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(r2 == Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 4L -> 4L, 5L -> 3L, 6L -> 3L), r2)
  }

  test("weighted sssp relaxes to known costs on a hand graph; k bounds path length") {
    // a --5--> b --1--> c, and a --10--> c directly: 2 rounds should
    // find cost(c)=6 via b; 1 round only the direct 10
    val edges = Seq(("a", "b", 5L), ("b", "c", 1L), ("a", "c", 10L))
      .toDF("src", "dst", "w")
    val seeds = Seq("a").toDF("node")
    def costs(k: Int): Map[String, Long] =
      GraphOps.ssspWeighted(edges, seeds, iters = k)
        .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(costs(1) == Map("a" -> 0L, "b" -> 5L))      // c unreachable: only nodes with out-edges tracked
    assert(costs(2)("b") == 5L && costs(2)("a") == 0L)
    // c has no out-edge so it is not in the node frame; route through a
    // bidirectional copy to observe it
    val bidi = edges.union(edges.select(col("dst"), col("src"), col("w")))
    val got = GraphOps.ssspWeighted(bidi, seeds, iters = 2)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(got == Map("a" -> 0L, "b" -> 5L, "c" -> 6L), got.toString)
  }
}
