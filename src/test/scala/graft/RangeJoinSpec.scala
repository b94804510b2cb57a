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

  // ---- the OPTIMIZER form: graft.plans.BandedRangeJoin ----------------

  private def planOf(df: org.apache.spark.sql.DataFrame): String =
    df.queryExecution.executedPlan.toString

  test("BandedRangeJoin rewrites an inequality-only join away from BNLJ, same rows") {
    import org.apache.spark.sql.functions._
    val ss = spark.newSession() // isolate extraOptimizations + conf
    import ss.implicits._
    val rnd = new scala.util.Random(11)
    val l = (0 until 200).map(i => (i.toLong, rnd.nextInt(10000).toDouble)).toDF("lid", "lx")
    val r = (0 until 200).map(i => (i.toLong, rnd.nextInt(10000).toDouble)).toDF("rid", "rx")
    def naive = l.join(r, col("rx") >= col("lx") - 50 && col("rx") <= col("lx") + 50)
    val expected = naive.select("lid", "rid").collect().map(x => (x.getLong(0), x.getLong(1))).toSet
    assert(planOf(naive).contains("BroadcastNestedLoopJoin"), "precondition: naive is BNLJ")

    graft.plans.BandedRangeJoin.install(ss)
    graft.plans.BandedRangeJoin.install(ss) // idempotent
    assert(ss.experimental.extraOptimizations.count(_ == graft.plans.BandedRangeJoin) == 1)
    ss.conf.set(graft.plans.BandedRangeJoin.BinConf, "100")
    val banded = naive
    val plan = planOf(banded)
    assert(!plan.contains("BroadcastNestedLoopJoin") && !plan.contains("CartesianProduct"),
      s"still a nested-loop plan:\n$plan")
    val got = banded.select("lid", "rid").collect().map(x => (x.getLong(0), x.getLong(1))).toSet
    assert(got == expected && got.nonEmpty)
  }

  test("BandedRangeJoin handles timestamp bands (seconds bin) exactly") {
    import org.apache.spark.sql.functions._
    val ss = spark.newSession()
    import ss.implicits._
    val clicks = Seq((1L, t("2026-01-01 00:00:30")), (2L, t("2026-01-01 01:10:00")))
      .toDF("cid", "cts")
    val purchases = Seq(
      (10L, t("2026-01-01 00:00:30")),  // same instant: excluded (strict >)
      (11L, t("2026-01-01 00:30:00")),  // within 1h of click 1
      (12L, t("2026-01-01 01:00:30")),  // exactly +1h of click 1: included (<=)
      (13L, t("2026-01-01 01:00:31")),  // past the window of click 1
      (14L, t("2026-01-01 01:59:59")))  // within 1h of click 2
      .toDF("pid", "pts")
    def join = clicks.join(purchases,
      col("pts") > col("cts") && col("pts") <= col("cts") + expr("INTERVAL 1 HOUR"))
    val expected = join.select("cid", "pid").collect().map(x => (x.getLong(0), x.getLong(1))).toSet
    graft.plans.BandedRangeJoin.install(ss)
    ss.conf.set(graft.plans.BandedRangeJoin.BinConf, "3600")
    val plan = planOf(join)
    assert(!plan.contains("BroadcastNestedLoopJoin"), plan)
    val got = join.select("cid", "pid").collect().map(x => (x.getLong(0), x.getLong(1))).toSet
    assert(got == expected)
    assert(got == Set((1L, 11L), (1L, 12L), (2L, 14L)))
  }

  test("PROPERTY: BandedRangeJoin equals the naive theta join across random bands") {
    import org.apache.spark.sql.functions._
    val ss = spark.newSession()
    import ss.implicits._
    graft.plans.BandedRangeJoin.install(ss)
    val rnd = new scala.util.Random(42)
    // sweep band widths smaller than, comparable to, and larger than
    // the interval; negative values; BETWEEN syntax; asymmetric bounds
    val cases = Seq(
      (2.0, 50.0, "ge_le"),     // intervals span ~25 bins
      (50.0, 50.0, "ge_le"),    // one-ish bin
      (500.0, 50.0, "ge_le"),   // interval inside one bin
      (37.0, 80.0, "between"),  // BETWEEN parse path
      (11.0, 0.0, "strict"))    // zero-width strict band (empty-ish)
    cases.foreach { case (w, span, shape) =>
      val l = (0 until 150)
        .map(i => (i.toLong, rnd.nextInt(2000).toDouble - 1000)).toDF("lid", "lx")
      val r = (0 until 150)
        .map(i => (i.toLong, rnd.nextInt(2000).toDouble - 1000)).toDF("rid", "rx")
      val cond = shape match {
        case "ge_le" => col("rx") >= col("lx") - span && col("rx") <= col("lx") + span
        case "between" => col("rx").between(col("lx") - span, col("lx") + span)
        case _ => col("rx") > col("lx") && col("rx") < col("lx") + span
      }
      def rows(df: org.apache.spark.sql.DataFrame) =
        df.select("lid", "rid").collect().map(x => (x.getLong(0), x.getLong(1))).toSet
      ss.conf.unset(graft.plans.BandedRangeJoin.BinConf)
      val naive = rows(l.join(r, cond))
      ss.conf.set(graft.plans.BandedRangeJoin.BinConf, w.toString)
      val banded = l.join(r, cond)
      assert(!planOf(banded).contains("BroadcastNestedLoopJoin"),
        s"W=$w span=$span $shape: not rewritten")
      assert(rows(banded) == naive, s"W=$w span=$span $shape: rows diverge")
    }
    ss.conf.unset(graft.plans.BandedRangeJoin.BinConf)
  }

  test("BandedRangeJoin survives inverted and NaN bounds (no-match, not a crash)") {
    import org.apache.spark.sql.functions._
    val ss = spark.newSession()
    import ss.implicits._
    graft.plans.BandedRangeJoin.install(ss)
    // per-row INDEPENDENT bounds: row 1 is a normal interval, row 2 is
    // inverted (lo > hi — the theta join emits nothing for it), row 3
    // has a NaN bound. Sequence would throw 'illegal boundaries' on
    // row 2 and an ANSI cast error on row 3 without the guards.
    val l = Seq((1L, 0.0, 10.0), (2L, 100.0, 0.0), (3L, Double.NaN, 5.0))
      .toDF("lid", "lo", "hi")
    val r = Seq((10L, 5.0), (11L, 50.0)).toDF("rid", "rx")
    def join = l.join(r, col("rx") >= col("lo") && col("rx") <= col("hi"))
    ss.conf.unset(graft.plans.BandedRangeJoin.BinConf)
    val naive = join.select("lid", "rid").collect().map(x => (x.getLong(0), x.getLong(1))).toSet
    ss.conf.set(graft.plans.BandedRangeJoin.BinConf, "8")
    assert(!planOf(join).contains("BroadcastNestedLoopJoin"))
    val banded = join.select("lid", "rid").collect().map(x => (x.getLong(0), x.getLong(1))).toSet
    assert(banded == naive && banded == Set((1L, 10L)))
    ss.conf.unset(graft.plans.BandedRangeJoin.BinConf)
  }

  test("BandedRangeJoin fails LOUDLY on too-wide/infinite intervals (never silent drops)") {
    import org.apache.spark.sql.functions._
    val ss = spark.newSession()
    import ss.implicits._
    graft.plans.BandedRangeJoin.install(ss)
    ss.conf.set(graft.plans.BandedRangeJoin.BinConf, "8")
    ss.conf.set(graft.plans.BandedRangeJoin.MaxBinsConf, "64")
    val r = Seq((10L, 5.0), (11L, 50.0)).toDF("rid", "rx")
    def joinOf(l: org.apache.spark.sql.DataFrame) =
      l.join(r, col("rx") >= col("lo") && col("rx") <= col("hi"))
    try {
      // in-domain intervals: rewritten, exact
      val ok = Seq((1L, 0.0, 10.0), (2L, 40.0, 55.0)).toDF("lid", "lo", "hi")
      assert(!planOf(joinOf(ok)).contains("BroadcastNestedLoopJoin"))
      val banded = joinOf(ok).select("lid", "rid").collect()
        .map(x => (x.getLong(0), x.getLong(1))).toSet
      assert(banded == Set((1L, 10L), (2L, 11L)))
      // wider than maxBins, +Infinity, and -Infinity bounds: each
      // fails LOUDLY with the knobs named — a clamp here would
      // silently drop matches past the cap (wrong results); an
      // unguarded Floor would build a Long.MaxValue Sequence (OOM)
      def msgs(t: Throwable): String =
        if (t == null) "" else t.getMessage + "\n" + msgs(t.getCause)
      Seq(
        Seq((2L, 40.0, Double.PositiveInfinity)),
        Seq((3L, Double.NegativeInfinity, 10.0)),
        Seq((4L, 40.0, 1e300))).foreach { rows =>
        val ex = intercept[Throwable](joinOf(rows.toDF("lid", "lo", "hi")).collect())
        assert(msgs(ex).contains(graft.plans.BandedRangeJoin.MaxBinsConf),
          s"expected a loud domain error naming the conf, got: ${msgs(ex)}")
      }
    } finally {
      ss.conf.unset(graft.plans.BandedRangeJoin.BinConf)
      ss.conf.unset(graft.plans.BandedRangeJoin.MaxBinsConf)
    }
  }

  test("BandedRangeJoin leaves equi-joins and unset-conf sessions untouched") {
    import org.apache.spark.sql.functions._
    val ss = spark.newSession()
    import ss.implicits._
    graft.plans.BandedRangeJoin.install(ss)
    val l = (0 until 50).map(i => (i.toLong, i.toDouble)).toDF("lk", "lx")
    val r = (0 until 50).map(i => (i.toLong, i.toDouble)).toDF("rk", "rx")
    // conf unset: inequality-only join keeps its (nested-loop) plan
    val theta = l.join(r, col("rx") > col("lx") && col("rx") <= col("lx") + 2)
    assert(planOf(theta).contains("BroadcastNestedLoopJoin"))
    // conf set but an equi conjunct exists: Spark hash-joins, no rewrite
    ss.conf.set(graft.plans.BandedRangeJoin.BinConf, "10")
    val equi = l.join(r, col("lk") === col("rk") && col("rx") >= col("lx") - 1 && col("rx") <= col("lx") + 1)
    val plan = planOf(equi)
    assert(!plan.contains("__graft_band_probe"), plan)
    assert(equi.count() == 50)
  }
}
