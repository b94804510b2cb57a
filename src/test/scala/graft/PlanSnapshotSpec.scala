package graft

import org.scalatest.funsuite.AnyFunSuite
import java.nio.file.{Files, Paths}
import scala.jdk.CollectionConverters._

/** PLAN-SHAPE REGRESSION GATE for the bench headliners: a committed
  * snapshot of each query's physical-plan signature (exchange /
  * join-strategy / expand / scan counts) fails a spec the moment a
  * code change silently buys a new shuffle, loses a broadcast, or
  * plans a nested loop — BEFORE it costs a bench round to notice.
  *
  * The signature counts plan features from the explain string rather
  * than hashing it (paths, expression ids and stats churn per run);
  * counts are stable for a fixed fixture. Snapshots are taken on the
  * sf0.001 fixture the tests always use.
  *
  * Intentional plan changes: re-run with GRAFT_REGEN_PLANS=1 in the
  * environment (sbt must fork with it, e.g.
  * `GRAFT_REGEN_PLANS=1 sbt "testOnly graft.PlanSnapshotSpec"`) — the
  * spec rewrites src/test/resources/plan_snapshots.txt and the diff
  * shows up in review like any other code change.
  */
class PlanSnapshotSpec extends AnyFunSuite {
  import SparkTestSession.{spark, sfTiny}

  private val snapshotPath =
    Paths.get(sys.props.getOrElse("graft.plan.snapshots",
      "src/test/resources/plan_snapshots.txt"))

  private val features = Seq(
    // shuffles: "Exchange hashpartitioning/rangepartitioning/…".
    // Spark prefixes nested (non-last-child) branches with ':' glyphs,
    // which are not \s — the class must admit every tree-drawing glyph
    // (space, ':', '+', '-') or exchanges inside branches go uncounted.
    // "BroadcastExchange" cannot match: 'Broadcast' letters are outside
    // the glyph class.
    "shuffle" -> "(?m)^[\\s:+-]*Exchange ".r,
    "bcast" -> "BroadcastExchange".r,
    "smj" -> "SortMergeJoin".r,
    "bhj" -> "BroadcastHashJoin".r,
    "shj" -> "ShuffledHashJoin".r,
    "nlj" -> "BroadcastNestedLoopJoin".r,
    "cartesian" -> "CartesianProduct".r,
    "expand" -> "Expand".r,
    "scan" -> "FileScan".r)

  private def signature(name: String): String = {
    val plan = SparkEntry.queries(name)(spark, sfTiny)
      .queryExecution.executedPlan.toString
    features.map { case (k, re) => s"$k=${re.findAllIn(plan).size}" }
      .mkString(",")
  }

  // the streaming-replay headliners execute inside their builders (the
  // returned frame is a memory-sink fold, not the engine plan) — the
  // snapshot would be a trivial LocalTableScan, so only batch-planned
  // headliners are gated. Non-headliners whose SHAPE is the point
  // (r9 verdict: the RFM NTILE fix and the q16 TakeOrdered denylist
  // were invisible here because only headliners were pinned) ride
  // along as extras.
  private val extras = Seq("customer_rfm_segments", "q16_like_supplier_cnt",
    // round-10 shapes whose POINT is the plan: the windowed maintained
    // view (decoration must not add input-sized work), the new
    // value-rollup aggregates, the no-window OHLC aggregate, the LPA
    // round shape, and the pruned point lookup (scan count = pruned
    // bucket dirs, not the table)
    // (graph_label_propagation / incremental_sql_window_rank are
    // headliners now — gated via benchNames)
    "incremental_sql_quantile",
    "incremental_sql_argmax", "events_ohlc_bars",
    "snapshot_point_lookup",
    // round-11 shapes whose POINT is the plan: the set-semantics UNION
    // netting node, the bag INTERSECT ALL counts-netting, the SQL-text
    // as-of lowering (must stay the one-shuffle union-window plan),
    // and the view over a version-pinned branch (manifest-resolved
    // scans, no extra exchange)
    "incremental_sql_union_distinct", "incremental_sql_intersect_all",
    "incremental_sql_asof", "incremental_sql_over_branch",
    // round-12 shapes whose POINT is the plan: the star orphans-only
    // IS NULL selection (two plans, no main tree) and the NOT IN
    // anti-gate lowering (one extra co-partitioned shuffle, no
    // three-valued rewrite); the full star view is a headliner —
    // gated via benchNames
    "incremental_sql_q10_fullouter_star_isnull",
    "incremental_sql_not_in",
    // round-14 shapes whose POINT is the plan: gates on the pair-star —
    // NOT EXISTS keeps all six classes (gate hops spliced into the
    // replanned cores), EXISTS drops the orphan classes statically
    "incremental_sql_q10_fullouter_star_pair_gated",
    "incremental_sql_q10_fullouter_star_pair_gated_exists")
  private def gated: Seq[String] = SparkEntry.benchNames ++ extras

  test("headline queries keep their committed plan shape") {
    val current = gated.map(n => n -> signature(n))
    if (sys.env.contains("GRAFT_REGEN_PLANS")) {
      Files.createDirectories(snapshotPath.getParent)
      Files.write(snapshotPath,
        current.map { case (n, s) => s"$n|$s" }.asJava)
      info(s"regenerated ${snapshotPath.toAbsolutePath} (${current.size} entries)")
    } else {
      assert(Files.exists(snapshotPath),
        s"no committed snapshot at $snapshotPath — run once with GRAFT_REGEN_PLANS=1")
      val committed = Files.readAllLines(snapshotPath).asScala
        .filter(_.nonEmpty).map { l =>
          val Array(n, s) = l.split('|'); n -> s
        }.toMap
      current.foreach { case (n, sig) =>
        committed.get(n) match {
          case None =>
            fail(s"$n has no committed plan snapshot — " +
              "regenerate with GRAFT_REGEN_PLANS=1 and review the diff")
          case Some(want) =>
            assert(sig == want,
              s"$n plan shape changed: committed [$want] vs current [$sig] — " +
                "if intentional, regenerate with GRAFT_REGEN_PLANS=1 and commit the diff")
        }
      }
      // removed/renamed headliners leave stale rows behind — keep the
      // snapshot honest
      val stale = committed.keySet -- current.map(_._1).toSet
      assert(stale.isEmpty, s"stale snapshot rows: ${stale.toSeq.sorted.mkString(", ")}")
    }
  }
}
