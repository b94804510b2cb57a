package graft

import org.scalatest.funsuite.AnyFunSuite
import java.sql.Timestamp
import graft.operators.RangeJoin

class RangeJoinSpec extends AnyFunSuite {
  import SparkTestSession.spark
  import spark.implicits._

  private def t(s: String) = Timestamp.valueOf(s)

  test("withinAfter matches the exact (ts, ts+W] interval across bin boundaries") {
    // W = 60s. Left at :30 → window (:30, 1:30] spans two bins.
    val left = Seq((1L, t("2026-01-01 00:00:30"), "L")).toDF("k", "ts", "l")
    val right = Seq(
      (1L, t("2026-01-01 00:00:30"), "same-instant"),   // excluded: > is strict
      (1L, t("2026-01-01 00:00:31"), "in-bin0"),        // included
      (1L, t("2026-01-01 00:01:15"), "in-bin1"),        // included (next bin)
      (1L, t("2026-01-01 00:01:30"), "boundary"),       // included: <= inclusive
      (1L, t("2026-01-01 00:01:31"), "too-late"),       // excluded
      (2L, t("2026-01-01 00:00:45"), "wrong-key"))      // excluded
      .toDF("k", "ts", "r")
    val got = RangeJoin.withinAfter(left, right, Seq("k"), "ts", windowSec = 60)
      .select("r_r").collect().map(_.getString(0)).toSet
    assert(got == Set("in-bin0", "in-bin1", "boundary"))
  }

  test("withinAfter equals the brute-force definition on random data") {
    val rnd = new scala.util.Random(7)
    def randRows(n: Int, tag: String) = (0 until n).map { i =>
      (rnd.nextInt(3).toLong, t(f"2026-01-01 0${rnd.nextInt(3)}%d:${rnd.nextInt(60)}%02d:${rnd.nextInt(60)}%02d"), s"$tag$i")
    }
    val left = randRows(120, "L")
    val right = randRows(120, "R")
    val w = 300L // 5 minutes
    val got = RangeJoin.withinAfter(left.toDF("k", "ts", "lid"), right.toDF("k", "ts", "rid"),
        Seq("k"), "ts", windowSec = w)
      .select("lid", "r_rid").collect().map(r => (r.getString(0), r.getString(1))).toSet
    val expected = (for {
      (lk, lts, lid) <- left
      (rk, rts, rid) <- right
      if lk == rk && rts.getTime > lts.getTime && rts.getTime <= lts.getTime + w * 1000
    } yield (lid, rid)).toSet
    assert(got == expected)
  }

  test("each matching pair appears exactly once despite the 2-bin fan-out") {
    val left = (0 until 100).map(i => (1L, t(f"2026-01-01 00:00:${i % 60}%02d"), i)).toDF("k", "ts", "lid")
    val right = (0 until 100).map(i => (1L, t(f"2026-01-01 00:00:${i % 60}%02d"), i)).toDF("k", "ts", "rid")
    val out = RangeJoin.withinAfter(left, right, Seq("k"), "ts", windowSec = 30)
      .select("lid", "r_rid")
    assert(out.count() == out.distinct().count())
  }
}
