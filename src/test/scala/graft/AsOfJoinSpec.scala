package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.operators.AsOfJoin

class AsOfJoinSpec extends AnyFunSuite {
  import SparkTestSession.spark
  import spark.implicits._

  test("asOfLeft picks the latest right row at-or-before each left ts") {
    val left = Seq((1L, 10L, "p1"), (1L, 20L, "p2"), (2L, 5L, "p3"))
      .toDF("k", "ts", "lval")
    val right = Seq((1L, 5L, "r5"), (1L, 10L, "r10"), (1L, 15L, "r15"), (2L, 9L, "r9"))
      .toDF("k", "ts", "rval")
    val got = AsOfJoin.asOfLeft(left, right, Seq("k"), "ts")
      .select("lval", "asof_rval").collect()
      .map(r => r.getString(0) -> (if (r.isNullAt(1)) null else r.getString(1))).toMap
    assert(got("p1") == "r10", "inclusive: right at equal ts matches")
    assert(got("p2") == "r15", "latest preceding wins")
    assert(got("p3") == null, "no right row at-or-before → NULL (left join)")
  }

  test("asOfLeft equals the brute-force definition on random data") {
    val rnd = new scala.util.Random(42)
    // right unique per (k, ts) by construction (ts drawn without replacement per key)
    val right = (0 until 4).flatMap { k =>
      rnd.shuffle((0 until 200).toList).take(60).map(ts => (k.toLong, ts.toLong, s"r$k-$ts"))
    }
    val left = (0 until 4).flatMap { k =>
      (0 until 80).map(_ => (k.toLong, rnd.nextInt(220).toLong, rnd.nextInt(100000).toLong))
    }
    val got = AsOfJoin.asOfLeft(left.toDF("k", "ts", "lid"), right.toDF("k", "ts", "rv"),
        Seq("k"), "ts")
      .select("k", "ts", "lid", "asof_rv").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)) ->
        (if (r.isNullAt(3)) null else r.getString(3))).toMap
    val rightByKey = right.groupBy(_._1)
    left.foreach { case (k, ts, lid) =>
      val expected = rightByKey.getOrElse(k, Nil).filter(_._2 <= ts)
        .sortBy(_._2).lastOption.map(_._3).orNull
      assert(got((k, ts, lid)) == expected, s"k=$k ts=$ts")
    }
  }


  test("asOfLeft tolerance nulls matches older than the bound, keeps the rest") {
    val left = Seq((1L, 10L, "p1"), (1L, 100L, "p2"), (2L, 5L, "p3"))
      .toDF("k", "ts", "lval")
    val right = Seq((1L, 8L, "r8"), (2L, 9L, "r9")).toDF("k", "ts", "rval")
    val got = AsOfJoin.asOfLeft(left, right, Seq("k"), "ts",
        tolerance = Some((l, r) => l - r <= 10L))
      .select("lval", "asof_rval").collect()
      .map(r => r.getString(0) -> (if (r.isNullAt(1)) null else r.getString(1))).toMap
    assert(got("p1") == "r8", "within tolerance: kept")
    assert(got("p2") == null, "match older than the bound reverts to NULL")
    assert(got("p3") == null, "no at-or-before match at all stays NULL")
  }

  test("asOfLeft keeps every left row and all its columns") {
    val left = Seq((1L, 1L, "a", 3.5)).toDF("k", "ts", "s", "x")
    val right = Seq((9L, 1L, "z")).toDF("k", "ts", "rv") // different key → no match
    val out = AsOfJoin.asOfLeft(left, right, Seq("k"), "ts")
    assert(out.columns.toSeq == Seq("k", "ts", "s", "x", "asof_ts", "asof_rv"))
    val r = out.collect()(0)
    assert(r.getLong(0) == 1L && r.getString(2) == "a" && r.getDouble(3) == 3.5 && r.isNullAt(5))
  }
}
