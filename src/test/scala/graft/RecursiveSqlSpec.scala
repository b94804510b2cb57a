package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.streaming.RecursiveSql

class RecursiveSqlSpec extends AnyFunSuite {
  import SparkTestSession.spark

  private val d = SparkTestSession.sfTiny

  test("UNION ALL recursion: bounded counter, column alias list") {
    val got = RecursiveSql.run(spark, d,
      """WITH RECURSIVE r(x) AS (
        | SELECT 1
        | UNION ALL
        | SELECT x + 1 FROM r WHERE x < 5
        |)
        |SELECT x FROM r""".stripMargin)
      .collect().map(_.getInt(0)).sorted.toSeq
    assert(got == Seq(1, 2, 3, 4, 5))
  }

  test("UNION recursion terminates on CYCLIC data (working-table semantics)") {
    // 1 → 2 → 3 → 1 ... : UNION dedups against the accumulator, so the
    // cycle closes after one lap instead of iterating forever
    val got = RecursiveSql.run(spark, d,
      """WITH RECURSIVE r AS (
        | SELECT 1 AS n
        | UNION
        | SELECT (n % 3) + 1 AS n FROM r
        |)
        |SELECT n FROM r""".stripMargin)
      .collect().map(_.getInt(0)).sorted.toSeq
    assert(got == Seq(1, 2, 3))
  }

  test("outer query composes over the fixpoint; fixture tables are bound") {
    // suppliers reachable in the trivial 0-hop recursion = the seeds
    val n = RecursiveSql.run(spark, d,
      """WITH RECURSIVE r AS (
        | SELECT s_suppkey AS k FROM supplier
        | UNION
        | SELECT k FROM r WHERE 1 = 0
        |)
        |SELECT COUNT(*) AS n FROM r""".stripMargin).head().getLong(0)
    val want = Tables.supplier(spark, d).count()
    assert(n == want && n > 0)
  }

  test("fences: non-linear recursion, anchor self-reference, extra CTEs, runaway depth") {
    def err(sql: String, maxIters: Int = 100): String =
      intercept[IllegalArgumentException](
        RecursiveSql.run(spark, d, sql, maxIters)).getMessage
    assert(err(
      """WITH RECURSIVE r AS (
        | SELECT 1 AS n
        | UNION ALL
        | SELECT a.n + b.n FROM r a JOIN r b ON a.n = b.n
        |) SELECT n FROM r""".stripMargin).contains("non-linear"))
    assert(err(
      """WITH RECURSIVE r AS (
        | SELECT n FROM r
        | UNION ALL
        | SELECT 1 AS n
        |) SELECT n FROM r""".stripMargin).contains("anchor"))
    assert(err(
      """WITH RECURSIVE r AS (
        | SELECT 1 AS n UNION ALL SELECT n + 1 FROM r WHERE n < 2
        |), s AS (SELECT * FROM r) SELECT n FROM s""".stripMargin)
      .contains("additional CTEs"))
    // unbounded UNION ALL: a truncated result would NOT be the fixpoint
    assert(err(
      """WITH RECURSIVE r AS (
        | SELECT 1 AS n
        | UNION ALL
        | SELECT n + 1 FROM r
        |) SELECT n FROM r""".stripMargin, maxIters = 5).contains("fixpoint"))
    // a single-branch body is not a recursion
    assert(err("WITH RECURSIVE r AS (SELECT 1 AS n) SELECT n FROM r")
      .contains("branch"))
  }
}
