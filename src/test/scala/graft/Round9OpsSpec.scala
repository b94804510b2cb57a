package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

/** Property-level checks for the round-9 operators whose primary gate
  * is the DuckDB oracle — cheap invariants that catch semantic
  * regressions faster than a full oracle run. */
class Round9OpsSpec extends AnyFunSuite {
  import SparkTestSession.{spark, sfTiny}

  test("M4 downsample: min <= first/last <= max, n sums to the corpus") {
    val rows = SparkEntry.queries("events_m4_downsample")(spark, sfTiny).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (n, vmin, vmax) = (r.getLong(2), r.getLong(3), r.getLong(4))
      val (vf, vl) = (r.getLong(5), r.getLong(6))
      assert(n > 0 && vmin <= vmax, r.toString)
      assert(vf >= vmin && vf <= vmax && vl >= vmin && vl <= vmax, r.toString)
    }
    val total = rows.map(_.getLong(2)).sum
    assert(total == Tables.events(spark, sfTiny).count())
  }

  test("shingle novelty: ratios well-formed and the earliest doc is fully novel") {
    val rows = SparkEntry.queries("dedup_shingle_novelty")(spark, sfTiny).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (novel, total, ratio) = (r.getLong(1), r.getLong(2), r.getDouble(3))
      assert(novel >= 0 && novel <= total, r.toString)
      assert(math.abs(ratio - novel.toDouble / total) < 1e-12, r.toString)
    }
    // the minimal doc_id owns every shingle it has (owner = min id)
    val first = rows.minBy(_.getLong(0))
    assert(first.getLong(1) == first.getLong(2), s"doc ${first.getLong(0)} not fully novel")
  }

  test("dataset card: uniques bounded by docs, dup ratio consistent") {
    val rows = SparkEntry.queries("curation_dataset_card")(spark, sfTiny).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (nDocs, nUnique, ratio) =
        (r.getLong(1), r.getLong(5), r.getDouble(6))
      assert(nUnique >= 1 && nUnique <= nDocs, r.toString)
      assert(math.abs(ratio - (nDocs - nUnique).toDouble / nDocs) < 1e-12, r.toString)
    }
  }

  test("cross-source matrix: canonical pair keys, positive counts") {
    val rows = SparkEntry.queries("dedup_cross_source_matrix")(spark, sfTiny).collect()
    rows.foreach { r =>
      assert(r.getString(0) <= r.getString(1), r.toString)
      assert(r.getLong(2) > 0, r.toString)
    }
  }

  test("variant extraction agrees with the string-JSON twin per event type") {
    val fromVariant = SparkEntry.queries("events_variant_extract")(spark, sfTiny)
      .select("event_type", "k_sum").collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val fromString = Tables.events(spark, sfTiny)
      .groupBy(col("event_type"))
      .agg(sum(get_json_object(col("props"), "$.k").cast("long")).as("k_sum"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(fromVariant == fromString, s"$fromVariant vs $fromString")
  }
}
