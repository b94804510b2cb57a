package graft

import org.apache.spark.sql.catalyst.plans.logical.Window
import org.scalatest.funsuite.AnyFunSuite

/** BOARD-WIDE scale-shape gate: no registered entry may plan a Window
  * with an empty partitionSpec (an unpartitioned window = every row
  * through ONE task — the r9 RFM finding, invisible to the headliner
  * plan snapshots precisely because it wasn't a headliner). This walks
  * the optimized logical plan of EVERY batch entry on the tiny
  * fixture; the allowlist is for documented exceptions only and
  * starts EMPTY.
  *
  * Streaming-replay entries are skipped: their builders execute a
  * MemoryStream replay and return the sink fold, so the frame's plan
  * is a memory scan, not the engine plan — their shapes are gated by
  * their batch twins, which all run here. */
class WindowShapeSpec extends AnyFunSuite {
  import SparkTestSession.{spark, sfTiny}

  // replay-style entries (builders run a streaming query eagerly)
  private def isReplay(name: String): Boolean =
    name.contains("stream") || name.endsWith("_tws")

  // name -> justification; must stay empty unless a global window is
  // provably bounded (e.g. over a frame whose cardinality is fixed by
  // construction, not data-size-driven)
  private val allowlist: Map[String, String] = Map.empty

  test("no registered entry plans an unpartitioned Window") {
    // the sweep EXECUTES every builder (snapshot commits, fixpoint
    // loops) — fan out over a pool with one child session per entry,
    // like RelationalSpec's registry audit, so this suite is not a
    // sequential long pole
    import scala.concurrent.{Await, ExecutionContext, Future}
    import scala.concurrent.duration._
    val pool = java.util.concurrent.Executors.newFixedThreadPool(12)
    implicit val ec: ExecutionContext = ExecutionContext.fromExecutor(pool)
    val offenders =
      try Await.result(Future.sequence(
        SparkEntry.all.filterNot(q => isReplay(q.name)).map { q =>
          Future {
            val plan =
              try SparkTestSession.sweepFrame(q.name, sfTiny, q.fn)
                .queryExecution.optimizedPlan
              catch {
                case e: Throwable =>
                  fail(s"${q.name}: builder failed on $sfTiny: ${e.getMessage}")
              }
            val global = plan.collect { case w: Window if w.partitionSpec.isEmpty => w }
            if (global.nonEmpty && !allowlist.contains(q.name)) Some(q.name) else None
          }
        }), 25.minutes).flatten
      finally { pool.shutdown(); () }
    assert(offenders.isEmpty,
      s"unpartitioned Window (single-task total sort) in: ${offenders.mkString(", ")} — " +
        "replace with DistributedRank / TakeOrdered, or allowlist with a justification")
  }
}
