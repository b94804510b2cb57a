package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Event-time streaming analytics over the `events` shape
  * `(event_id, user_id, ts, event_type, value)` — the watermark +
  * windowed-state surface of Structured Streaming (the reference runs
  * processing-time only, SURVEY.md §2 "watermarks ABSENT"; this is the
  * Spark-native upgrade the north star asks for).
  *
  * Each builder takes a plain DataFrame and works on BOTH surfaces:
  * under `readStream` the watermark bounds state and admits/fences
  * late data; in batch `withWatermark` is a no-op and the same
  * expressions compute the full-history answer (that equivalence is
  * what the DuckDB oracle checks for `events_tumbling_window`).
  *
  * Scale: a tumbling-window aggregate shuffles once on
  * (window, group); state per key is one partial aggregate row, evicted
  * at `watermark - delay` — bounded regardless of stream length.
  * Sums fold in DECIMAL(18,2) (exact) and cast back, so float
  * accumulation order across partitions can never change the result.
  */
object StreamingAnalytics {

  /** Tumbling event-time window counts + exact value sums. */
  def tumblingAgg(events: DataFrame, delay: String = "1 hour", width: String = "1 hour"): DataFrame =
    events
      .withWatermark("ts", delay)
      .groupBy(window(col("ts"), width), col("event_type"))
      .agg(count(lit(1)).as("n_events"),
        round(sum(col("value").cast(DecimalType(18, 2))), 2).cast("double").as("sum_value"))
      .select(col("window.start").as("window_start"), col("event_type"),
        col("n_events"), col("sum_value"))

  /** SLIDING event-time windows (width > slide ⇒ overlapping): each
    * event contributes to width/slide windows — Spark expands the row
    * per window BEFORE the aggregate (one `Expand` + one shuffle on
    * (window, group), no self-join), which is the scalable shape: state
    * per key is still one partial row per open window, evicted at the
    * watermark. */
  def slidingAgg(events: DataFrame, delay: String = "1 hour",
                 width: String = "1 hour", slide: String = "30 minutes"): DataFrame =
    events
      .withWatermark("ts", delay)
      .groupBy(window(col("ts"), width, slide), col("event_type"))
      .agg(count(lit(1)).as("n_events"),
        round(sum(col("value").cast(DecimalType(18, 2))), 2).cast("double").as("sum_value"))
      .select(col("window.start").as("window_start"), col("event_type"),
        col("n_events"), col("sum_value"))

  /** STREAM-STREAM range join: same-key pairs with
    * `right.ts ∈ (left.ts, left.ts + windowSec]` — the continuous form
    * of [[graft.operators.RangeJoin.withinAfter]], with identical
    * output columns. Spark's native stream-stream inner join does the
    * heavy lifting: the event-time range condition on two watermarked
    * columns lets the state store evict a buffered row as soon as the
    * other side's watermark passes its join window, so state is
    * bounded by (delay + window) of traffic per key — the engine
    * maintains exactly the two-sided buffer the banded batch
    * formulation avoids materializing.
    *
    * Inner joins emit eagerly (no watermark wait for output); the
    * watermark only gates STATE EVICTION and late-data fencing. */
  def streamRangeJoin(left: DataFrame, right: DataFrame, keyCols: Seq[String], ts: String,
                      windowSec: Long, delay: String = "1 hour",
                      rightPrefix: String = "r_"): DataFrame = {
    require(windowSec > 0, "windowSec must be positive")
    val rValCols = right.columns.filterNot(keyCols.contains).toSeq
    val l = left.withWatermark(ts, delay).alias("l")
    val r = right.withWatermark(ts, delay).alias("r")
    // keyless range joins are legal (mirror of withinAfter's behavior)
    val keyCond = keyCols.map(k => col(s"l.$k") === col(s"r.$k"))
      .foldLeft(lit(true))(_ && _)
    val rangeCond = col(s"r.$ts") > col(s"l.$ts") &&
      col(s"r.$ts") <= col(s"l.$ts") + expr(s"INTERVAL $windowSec SECOND")
    l.join(r, keyCond && rangeCond, "inner")
      .select(left.columns.toSeq.map(c => col(s"l.$c").as(c)) ++
        rValCols.map(c => col(s"r.$c").as(s"$rightPrefix$c")): _*)
  }

  /** Exact streaming dedup on a key set, with state bounded by the
    * watermark (built-in `dropDuplicatesWithinWatermark` — duplicates
    * arriving within `delay` of each other are guaranteed dropped,
    * state evicted after). Batch flavor: plain `dropDuplicates`. */
  def dedupWithinWatermark(events: DataFrame, delay: String, keys: Seq[String]): DataFrame =
    events.withWatermark("ts", delay).dropDuplicatesWithinWatermark(keys)
}
