package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.TimeSeries

class TimeSeriesSpec extends AnyFunSuite {
  private def s = SparkTestSession.spark
  private val d = SparkTestSession.sfTiny

  test("LOCF fills every gap, keeps observed values exact, and bounds the grid per key") {
    val s = SparkTestSession.spark
    import s.implicits._
    // key 1: observations in buckets 0, 3 (gap 1-2); key 2: single point
    val df = Seq(
      (1L, 0L, 10.5, 100L), (1L, 3L * 3600000000L + 7L, 99.25, 101L),
      (1L, 5L, 11.5, 102L), // same bucket as the first row, larger seq wins
      (2L, 2L * 3600000000L, 42.0, 103L))
      .toDF("k", "us", "v", "seq")
      .select(col("k"), timestamp_micros(col("us")).as("ts"), col("v"), col("seq"))
    val out = TimeSeries.resampleLocf(df, "k", "ts", "v", "seq", 3600000000L)
      .orderBy("k", "bucket")
      .as[(Long, Long, Double, Boolean)].collect().toSeq
    assert(out == Seq(
      (1L, 0L, 11.5, true),  // max_by(seq) picked 11.5 over 10.5
      (1L, 1L, 11.5, false), // carried
      (1L, 2L, 11.5, false), // carried
      (1L, 3L, 99.25, true),
      (2L, 2L, 42.0, true)))
  }

  test("per-key span over maxBuckets fails LOUD instead of materializing the grid") {
    val s = SparkTestSession.spark
    import s.implicits._
    val df = Seq((1L, 0L, 1.0, 1L), (1L, 100L * 3600000000L, 2.0, 2L))
      .toDF("k", "us", "v", "seq")
      .select(col("k"), timestamp_micros(col("us")).as("ts"), col("v"), col("seq"))
    val e = intercept[Exception] {
      TimeSeries.resampleLocf(df, "k", "ts", "v", "seq", 3600000000L, maxBuckets = 10L).count()
    }
    assert(e.getMessage.contains("resampleLocf") || e.getCause != null)
  }

  test("registered entry: grid is gapless per user and join stays equi (no NLJ)") {
    val out = SparkEntry.queries("events_resample_locf")(s, d).cache()
    try {
      // gapless: per-user row count == hi - lo + 1 over its buckets
      val bad = out.groupBy("user_id")
        .agg(count(lit(1)).as("n"), (max("bucket") - min("bucket") + 1).as("span"))
        .filter(col("n") =!= col("span")).count()
      assert(bad == 0L)
      // every observed row's value matches a real event in that bucket
      assert(out.filter(col("observed") && col("value_filled").isNull).count() == 0L)
      // gaps exist in the fixture (otherwise LOCF is untested) and are filled
      val gaps = out.filter(!col("observed"))
      assert(gaps.count() > 0L && gaps.filter(col("value_filled").isNull).count() == 0L)
    } finally out.unpersist()
    val plan = SparkEntry.queries("events_resample_locf")(s, d)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("BroadcastNestedLoopJoin") && !plan.contains("CartesianProduct"), plan.take(1500))
  }
  test("kmv set ops: jaccard/union/intersection track the exact segment overlap") {
    import org.apache.spark.sql.functions._
    val row = SparkEntry.queries("events_kmv_jaccard")(s, d).collect()(0)
    val jHat = row.getAs[Long]("jaccard_e6").toDouble / 1e6
    val uHat = row.getAs[Double]("approx_union")
    val iHat = row.getAs[Double]("approx_intersection")
    // exact overlap of the same hi/lo-ticket purchase segments
    val ev = Tables.events(s, d).filter(col("event_type") === "purchase")
    val a = ev.filter(col("value") > 150).select("user_id").distinct()
    val b = ev.filter(col("value") < 30).select("user_id").distinct()
    val na = a.count().toDouble
    val nb = b.count().toDouble
    val ni = a.intersect(b).count().toDouble
    val nu = na + nb - ni
    // KMV with k=64 on a few hundred distinct users: generous 35%
    // relative tolerance (estimator sigma ~ 1/sqrt(k-2) = 13%)
    assert(math.abs(uHat - nu) / nu < 0.35, s"union: $uHat vs $nu")
    assert(math.abs(jHat - ni / nu) < 0.25, s"jaccard: $jHat vs ${ni / nu}")
    assert(math.abs(iHat - ni) / math.max(ni, 1.0) < 0.5, s"inter: $iHat vs $ni")
    // internal consistency: intersection = jaccard x union by construction
    assert(math.abs(iHat - jHat * uHat) < 1e-6 * uHat)
  }

  test("streak runs: islands partition each user's sequence; no run crosses a type change") {
    import org.apache.spark.sql.functions._
    val runs = SparkEntry.queries("events_streak_runs")(s, d).collect()
    assert(runs.nonEmpty)
    runs.foreach { r =>
      assert(r.getLong(r.fieldIndex("run_len")) >= 3L)
      assert(r.getLong(r.fieldIndex("start_us")) <= r.getLong(r.fieldIndex("end_us")))
    }
    // cross-check one user against a driver-side fold over its sequence
    val uid = runs.head.getLong(0)
    val seq = Tables.events(s, d).filter(col("user_id") === uid)
      .select(unix_micros(col("ts")).as("us"), col("event_id"), col("event_type"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2)))
      .sortBy(t => (t._1, t._2))
    val folded = seq.foldLeft(List.empty[(String, Long)]) {
      case ((t, n) :: rest, e) if t == e._3 => (t, n + 1) :: rest
      case (acc, e) => (e._3, 1L) :: acc
    }.filter(_._2 >= 3).reverse
    val got = runs.filter(_.getLong(0) == uid)
      .map(r => (r.getString(1), r.getLong(r.fieldIndex("run_len"))))
      .sortBy(identity).toList
    assert(got == folded.sortBy(identity), s"user $uid: $got vs $folded")
  }

  test("pattern match: every batch match is three strictly consecutive events in order") {
    import org.apache.spark.sql.functions._
    val matches = SparkEntry.queries("events_pattern_match")(s, d).collect()
    // sf0.001 may or may not contain a match; validate whatever appears
    matches.foreach { m =>
      val uid = m.getLong(0)
      val seq = Tables.events(s, d).filter(col("user_id") === uid)
        .select(unix_micros(col("ts")).as("us"), col("event_id"), col("event_type"))
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2)))
        .sortBy(t => (t._1, t._2))
      val i = seq.indexWhere(_._2 == m.getLong(m.fieldIndex("start_event")))
      assert(i >= 0 && i + 2 < seq.length)
      assert(seq(i)._3 == "view" && seq(i + 1)._3 == "click" && seq(i + 2)._3 == "purchase")
      assert(seq(i + 2)._2 == m.getLong(m.fieldIndex("end_event")))
      assert(seq(i + 2)._1 - seq(i)._1 <= 86400000000L)
    }
  }
}
