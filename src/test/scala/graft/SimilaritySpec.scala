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
}
