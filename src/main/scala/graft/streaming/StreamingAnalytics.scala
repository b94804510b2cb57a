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

  // ---- streaming AS-OF join ------------------------------------------

  /** One tagged input event of [[streamAsOfJoin]]: left rows are the
    * probe side (each emits exactly one match), right rows the
    * reference side ("latest right at or before the left's ts"). */
  final case class AsOfIn(key: Long, ts: java.sql.Timestamp, isRight: Boolean, id: Long)

  /** One as-of match: left-join semantics — `asof_*` is None when no
    * right row precedes the left. */
  final case class AsOfMatch(key: Long, left_id: Long, left_ts: java.sql.Timestamp,
                             asof_id: Option[Long], asof_ts: Option[java.sql.Timestamp])

  /** Per-key buffers: unfinalized lefts and still-reachable rights,
    * both as (tsMicros, id). */
  final case class AsOfBuf(lefts: List[(Long, Long)], rights: List[(Long, Long)])

  // getNanos is non-negative by Timestamp's invariant even pre-epoch,
  // so the truncating arithmetic here is exact for negative epochs too
  private def tsMicros(t: java.sql.Timestamp): Long =
    t.getTime * 1000L + (t.getNanos % 1000000) / 1000L
  // floorDiv/floorMod, NOT `/`/`%`: truncating division mis-rounds
  // negative micros and the negative remainder makes setNanos throw —
  // a pre-epoch event time would crash the streaming as-of join
  private def toTs(micros: Long): java.sql.Timestamp = {
    val t = new java.sql.Timestamp(Math.floorDiv(micros, 1000L))
    t.setNanos(Math.floorMod(micros, 1000000L).toInt * 1000)
    t
  }

  /** STREAMING AS-OF join — the continuous form of
    * [[graft.operators.AsOfJoin.asOfLeft]], which Spark's native
    * stream-stream join cannot express (its state eviction needs a
    * two-sided time RANGE; as-of's "latest right so far" keeps ONE
    * right row alive indefinitely). `flatMapGroupsWithState` with
    * event-time timeout instead:
    *
    *  - a left row BUFFERS until the watermark passes its event time —
    *    only then can no earlier right row still arrive (the watermark
    *    contract), so each left finalizes EXACTLY ONCE with the true
    *    latest right at-or-before it, late rights included;
    *  - rights buffer sorted; finalization matches by binary scan;
    *    eviction keeps every right newer than the watermark PLUS the
    *    single newest right at-or-below it (the candidate for every
    *    future left) — state per key is bounded by `delay` of traffic
    *    plus one row, the as-of analogue of the range join's
    *    two-sided eviction;
    *  - the event-time timeout re-finalizes a key when the watermark
    *    advances without new events for it, so quiet keys still flush.
    *
    * Ties: a right at exactly the left's ts matches (inclusive <=,
    * same as the batch operator); equal-ts rights resolve to the
    * larger id (mirror the registered query's max() dedup). Emission
    * order inside a batch is deterministic (ts, then id). */
  def streamAsOfJoin(events: org.apache.spark.sql.Dataset[AsOfIn],
                     delay: String = "1 hour",
                     toleranceMicros: Option[Long] = None)
      : org.apache.spark.sql.Dataset[AsOfMatch] = {
    import org.apache.spark.sql.streaming.{GroupStateTimeout, OutputMode}
    val spark = events.sparkSession
    import spark.implicits._
    events.toDF().withWatermark("ts", delay).as[AsOfIn]
      .groupByKey(_.key)
      .flatMapGroupsWithState[AsOfBuf, AsOfMatch](
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
        (key, it, state) =>
          val st0 = state.getOption.getOrElse(AsOfBuf(Nil, Nil))
          val incoming = it.toList
          val lefts = st0.lefts ++
            incoming.filterNot(_.isRight).map(e => (tsMicros(e.ts), e.id))
          // rights sorted by (ts, id): the last element <= a left's ts
          // is its match; equal-ts rights resolve to the larger id
          val rights = (st0.rights ++
            incoming.filter(_.isRight).map(e => (tsMicros(e.ts), e.id)))
            .sortBy(identity)
          val wmMicros = state.getCurrentWatermarkMs() * 1000L
          // finalize lefts the watermark has passed (strictly: a right
          // AT the watermark may still arrive in some semantics — be
          // conservative and require wm beyond the left's ts)
          val (done, pending) = lefts.partition(_._1 < wmMicros)
          val out = done.sortBy(identity).map { case (lts, lid) =>
            // tolerance: a match older than the bound reverts to the
            // NULL extension (same conditional as the batch operator —
            // the latest preceding right is also the nearest one)
            val m = rights.takeWhile(_._1 <= lts).lastOption
              .filter(r => toleranceMicros.forall(t => lts - r._1 <= t))
            AsOfMatch(key, lid, toTs(lts), m.map(_._2), m.map(r => toTs(r._1)))
          }
          // evict: rights newer than the watermark stay (future lefts
          // may precede them); of the rest only the newest survives as
          // the standing candidate
          val (past, future) = rights.partition(_._1 <= wmMicros)
          val kept = past.lastOption.toList ++ future
          if (pending.isEmpty && kept.isEmpty) state.remove()
          else {
            state.update(AsOfBuf(pending, kept))
            if (pending.nonEmpty) {
              // wake this key when the watermark passes its earliest
              // pending left, even if no new events arrive for it
              val wake = (pending.map(_._1).min / 1000L) + 1L
              state.setTimeoutTimestamp(math.max(wake, state.getCurrentWatermarkMs() + 1L))
            }
          }
          out.iterator
      }
  }

  // ---- streaming CEP pattern match --------------------------------------

  /** One input event of [[streamPatternMatch]]. */
  final case class PatIn(user: Long, ts: java.sql.Timestamp, etype: String, id: Long)

  /** One strict-contiguity match (same columns as the batch
    * `events_pattern_match` entry). */
  final case class PatMatch(user_id: Long, start_event: Long, start_us: Long,
                            end_event: Long, end_us: Long)

  /** Per-key CEP state: events not yet finalized by the watermark, and
    * the last two FINALIZED events (the only history strict contiguity
    * can ever look back into), both as (us, id, type). */
  final case class PatBuf(pending: List[(Long, Long, String)],
                          tail: List[(Long, Long, String)])

  /** STREAMING CEP — strict-contiguity `view NEXT click NEXT purchase`
    * within one hour, the continuous twin of the batch two-LEAD window
    * query (`events_pattern_match`) and the shape Flink ships as CEP
    * `next()`. Spark has no CEP library; `flatMapGroupsWithState`
    * expresses it directly:
    *
    *  - contiguity is a statement about the user's FULL event sequence
    *    in EVENT TIME, so an event may only take its place in the
    *    sequence once no earlier event can still arrive — i.e. once
    *    the watermark passes its timestamp. Arrivals buffer in
    *    `pending`; each invocation finalizes the watermark-passed
    *    prefix in (ts, id) order and slides the 3-event pattern window
    *    across it. Out-of-order arrival WITHIN the delay is therefore
    *    handled exactly — same matches as the batch query;
    *  - strict contiguity bounds lookback: a new event can only ever
    *    complete a pattern with the two finalized events immediately
    *    before it, so the remembered history is exactly 2 rows
    *    (`tail`) — per-key state is 2 + (delay's worth of pending)
    *    rows, the minimum any correct engine can hold;
    *  - an event-time timeout re-finalizes a key when the watermark
    *    advances without traffic for it, so quiet keys flush without
    *    waiting for their next event.
    *
    * Emission order inside a batch is deterministic ((us, id) of the
    * match start); matches are emitted exactly once, when their LAST
    * event finalizes. */
  def streamPatternMatch(events: org.apache.spark.sql.Dataset[PatIn],
                         delay: String = "1 hour",
                         first: String = "view", second: String = "click",
                         third: String = "purchase",
                         windowUs: Long = 3600000000L): org.apache.spark.sql.Dataset[PatMatch] = {
    import org.apache.spark.sql.streaming.{GroupStateTimeout, OutputMode}
    val spark = events.sparkSession
    import spark.implicits._
    events.toDF().withWatermark("ts", delay).as[PatIn]
      .groupByKey(_.user)
      .flatMapGroupsWithState[PatBuf, PatMatch](
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
        (key, it, state) =>
          val st0 = state.getOption.getOrElse(PatBuf(Nil, Nil))
          val pending = st0.pending ++
            it.map(e => (tsMicros(e.ts), e.id, e.etype))
          val wmMicros = state.getCurrentWatermarkMs() * 1000L
          val (done0, still) = pending.partition(_._1 < wmMicros)
          val done = done0.sortBy(t => (t._1, t._2))
          // slide the 3-window over [last-2-finalized ++ newly-finalized];
          // only triples ENDING in the new segment emit (earlier ones
          // already did, in the invocation that finalized their end)
          val seq = st0.tail ++ done
          // every 3-window over [tail ++ done] necessarily ENDS in the
          // new segment (|tail| <= 2, so indices i..i+2 always reach
          // past it) — emitted matches are therefore new by
          // construction, no dedup needed. A longer-pattern variant
          // with a bigger tail WOULD need an end-index check here.
          val out = seq.sliding(3).collect {
            case List(a, b, c)
              if a._3 == first && b._3 == second &&
                c._3 == third && c._1 - a._1 <= windowUs =>
              PatMatch(key, a._2, a._1, c._2, c._1)
          }.toList
          // tail TTL: a finalized event more than the pattern window
          // behind the watermark can never bound a future match (the
          // watermark fence means every future event has ts >= wm, so
          // the window constraint already fails) — evict it, and when
          // nothing is left REMOVE the key, so state tracks live keys
          // instead of total key cardinality. A tail-only key arms a
          // timeout at the instant its tail ages out, so dead keys
          // drain without waiting for traffic.
          val tail = seq.takeRight(2).filter(_._1 >= wmMicros - windowUs)
          if (still.isEmpty && tail.isEmpty) state.remove()
          else {
            state.update(PatBuf(still, tail))
            val wake =
              if (still.nonEmpty) (still.map(_._1).min / 1000L) + 1L
              else ((tail.map(_._1).max + windowUs) / 1000L) + 1L
            state.setTimeoutTimestamp(math.max(wake, state.getCurrentWatermarkMs() + 1L))
          }
          out.iterator
      }
  }

  // ---- streaming ABSENCE detection --------------------------------------

  /** One "click with NO purchase within the window" alert. */
  final case class AbsAlert(user_id: Long, click_id: Long, click_us: Long)

  /** Per-key absence state: undecided clicks and still-relevant
    * purchases, both as event-time micros. */
  final case class AbsBuf(clicks: List[(Long, Long)], purchases: List[Long])

  /** STREAMING ABSENCE detection — "A NOT followed by B within W", the
    * alerting shape NO join can express continuously: a join emits on
    * the presence of a row, but an absence alert must fire on the
    * PASSAGE OF TIME past a deadline with nothing arriving — i.e. a
    * per-key TIMER, which is exactly what Flink CEP's notFollowedBy +
    * within compiles to. `flatMapGroupsWithState` with event-time
    * timeout expresses it:
    *
    *  - a click becomes DECIDABLE only once the watermark passes
    *    click_ts + W: the watermark contract then guarantees every
    *    purchase that could clear it has arrived (a later-arriving
    *    in-window purchase would be late and fenced). Deciding earlier
    *    would emit alerts a straggler purchase should have cleared;
    *  - state per key: undecided clicks (bounded by W + delay of
    *    traffic) and purchases newer than `wm − W` (older ones can
    *    only clear already-decided clicks) — both eviction rules are
    *    forced by the semantics, no tuning knobs;
    *  - the event-time timeout wakes the key at its earliest pending
    *    deadline, so alerts fire even when the user goes silent — the
    *    whole point of absence detection.
    *
    * Emission is deterministic: decided clicks emit in (ts, id)
    * order. */
  def streamAbsenceAlerts(events: org.apache.spark.sql.Dataset[PatIn],
                          delay: String = "1 hour",
                          watched: String = "click", clearing: String = "purchase",
                          windowUs: Long = 3600000000L): org.apache.spark.sql.Dataset[AbsAlert] = {
    import org.apache.spark.sql.streaming.{GroupStateTimeout, OutputMode}
    val spark = events.sparkSession
    import spark.implicits._
    events.toDF().withWatermark("ts", delay).as[PatIn]
      .groupByKey(_.user)
      .flatMapGroupsWithState[AbsBuf, AbsAlert](
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
        (key, it, state) =>
          val st0 = state.getOption.getOrElse(AbsBuf(Nil, Nil))
          val incoming = it.toList
          val clicks = st0.clicks ++
            incoming.filter(_.etype == watched).map(e => (tsMicros(e.ts), e.id))
          val purchases = st0.purchases ++
            incoming.filter(_.etype == clearing).map(e => tsMicros(e.ts))
          val wmMicros = state.getCurrentWatermarkMs() * 1000L
          val (decided, pending) = clicks.partition(_._1 + windowUs < wmMicros)
          val out = decided.sortBy(identity).collect {
            case (cu, cid) if !purchases.exists(p => p > cu && p <= cu + windowUs) =>
              AbsAlert(key, cid, cu)
          }
          val keptPurchases = purchases.filter(_ > wmMicros - windowUs)
          if (pending.isEmpty && keptPurchases.isEmpty) state.remove()
          else {
            state.update(AbsBuf(pending, keptPurchases))
            // purchase-only keys arm a timeout too: the key wakes when
            // its newest purchase ages past the window, prunes to
            // empty and removes — without it a dead key held its last
            // purchases forever
            val wake =
              if (pending.nonEmpty) ((pending.map(_._1).min + windowUs) / 1000L) + 1L
              else ((keptPurchases.max + windowUs) / 1000L) + 1L
            state.setTimeoutTimestamp(math.max(wake, state.getCurrentWatermarkMs() + 1L))
          }
          out.iterator
      }
  }

  // ---- the SAME absence semantics on Spark 4's transformWithState -------

  import org.apache.spark.sql.streaming.{ExpiredTimerInfo, ListState, OutputMode, StatefulProcessor, TTLConfig, TimeMode, TimerValues}

  /** [[streamAbsenceAlerts]] re-expressed through `transformWithState`
    * — the arbitrary-state API that succeeds flatMapGroupsWithState:
    * TYPED state columns (two ListStates the (RocksDB) store indexes
    * individually, appends are O(append) instead of rewrite-the-blob)
    * and REAL per-key timers (`registerTimer`/`handleExpiredTimer`,
    * many per key) instead of the single timeout slot. The decision
    * rule is byte-identical to the flatMap twin — clicks decide once
    * the watermark passes their deadline, in-window purchases clear,
    * purchases evict at wm − W, dead keys drain — and the gated entry
    * lands on the SAME anti-interval-join oracle as the batch and
    * flatMap forms: three implementations, one truth. Each key keeps
    * AT MOST ONE registered timer (stale ones are deleted on every
    * decide), so timer state is O(keys), not O(events). */
  final class AbsenceProcessor(watched: String, clearing: String, windowUs: Long)
      extends StatefulProcessor[Long, PatIn, AbsAlert] {
    @transient private var clicks: ListState[(Long, Long)] = _
    @transient private var purchases: ListState[Long] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit = {
      clicks = getHandle.getListState("clicks",
        org.apache.spark.sql.Encoders.product[(Long, Long)], TTLConfig.NONE)
      purchases = getHandle.getListState("purchases",
        org.apache.spark.sql.Encoders.scalaLong, TTLConfig.NONE)
    }

    private def decide(key: Long, wmMicros: Long): Iterator[AbsAlert] = {
      val cl = clicks.get().toList
      val pu = purchases.get().toList
      val (decided, pending) = cl.partition(_._1 + windowUs < wmMicros)
      val out = decided.sorted.collect {
        case (cu, cid) if !pu.exists(p => p > cu && p <= cu + windowUs) =>
          AbsAlert(key, cid, cu)
      }
      val keptP = pu.filter(_ > wmMicros - windowUs)
      // the store refuses empty list puts — empty means clear
      if (pending.isEmpty) clicks.clear() else clicks.put(pending.toArray)
      if (keptP.isEmpty) purchases.clear() else purchases.put(keptP.toArray)
      val want: Option[Long] =
        if (pending.nonEmpty) Some((pending.map(_._1).min + windowUs) / 1000L + 1L)
        else if (keptP.nonEmpty) Some((keptP.max + windowUs) / 1000L + 1L)
        else None
      val have = getHandle.listTimers().toList
      have.filterNot(want.contains).foreach(getHandle.deleteTimer)
      want.filterNot(have.contains).foreach(getHandle.registerTimer)
      out.iterator
    }

    override def handleInputRows(key: Long, rows: Iterator[PatIn],
        timerValues: TimerValues): Iterator[AbsAlert] = {
      rows.foreach { e =>
        if (e.etype == watched) clicks.appendValue((tsMicros(e.ts), e.id))
        else if (e.etype == clearing) purchases.appendValue(tsMicros(e.ts))
      }
      decide(key, timerValues.getCurrentWatermarkInMs() * 1000L)
    }

    override def handleExpiredTimer(key: Long, timerValues: TimerValues,
        expiredTimerInfo: ExpiredTimerInfo): Iterator[AbsAlert] =
      decide(key, timerValues.getCurrentWatermarkInMs() * 1000L)
  }

  /** Builder: requires the RocksDB state store provider on the
    * session (`transformWithState`'s documented requirement — set
    * `spark.sql.streaming.stateStore.providerClass` to
    * `...state.RocksDBStateStoreProvider`). */
  def twsAbsenceAlerts(events: org.apache.spark.sql.Dataset[PatIn],
                       delay: String = "1 hour",
                       watched: String = "click", clearing: String = "purchase",
                       windowUs: Long = 3600000000L): org.apache.spark.sql.Dataset[AbsAlert] = {
    val spark = events.sparkSession
    import spark.implicits._
    events.toDF().withWatermark("ts", delay).as[PatIn]
      .groupByKey(_.user)
      .transformWithState(new AbsenceProcessor(watched, clearing, windowUs),
        TimeMode.EventTime(), OutputMode.Append())
  }

  /** [[streamPatternMatch]]'s strict-contiguity CEP machine as a
    * `StatefulProcessor`: `pending` (not-yet-finalized events) and
    * `tail` (the last two finalized events — the only history strict
    * contiguity can reach) as separate typed ListStates, and the
    * re-finalization wake-up as a real event-time timer. Decision
    * rule identical to the flatMap twin, TTL'd tails included; the
    * gated entry shares the batch two-LEAD oracle, making the THIRD
    * implementation of this view (window query / flatMap machine /
    * StatefulProcessor) agree bit-for-bit. */
  final class PatternProcessor(first: String, second: String, third: String,
      windowUs: Long) extends StatefulProcessor[Long, PatIn, PatMatch] {
    @transient private var pending: ListState[(Long, Long, String)] = _
    @transient private var tail: ListState[(Long, Long, String)] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit = {
      pending = getHandle.getListState("pending",
        org.apache.spark.sql.Encoders.product[(Long, Long, String)], TTLConfig.NONE)
      tail = getHandle.getListState("tail",
        org.apache.spark.sql.Encoders.product[(Long, Long, String)], TTLConfig.NONE)
    }

    private def finalizePrefix(key: Long, wmMicros: Long): Iterator[PatMatch] = {
      val (done0, still) = pending.get().toList.partition(_._1 < wmMicros)
      val done = done0.sortBy(t => (t._1, t._2))
      val seq = tail.get().toList ++ done
      val out = seq.sliding(3).collect {
        case List(a, b, c)
          if a._3 == first && b._3 == second &&
            c._3 == third && c._1 - a._1 <= windowUs =>
          PatMatch(key, a._2, a._1, c._2, c._1)
      }.toList
      val keptTail = seq.takeRight(2).filter(_._1 >= wmMicros - windowUs)
      if (still.isEmpty) pending.clear() else pending.put(still.toArray)
      if (keptTail.isEmpty) tail.clear() else tail.put(keptTail.toArray)
      val want: Option[Long] =
        if (still.nonEmpty) Some(still.map(_._1).min / 1000L + 1L)
        else if (keptTail.nonEmpty) Some((keptTail.map(_._1).max + windowUs) / 1000L + 1L)
        else None
      val have = getHandle.listTimers().toList
      have.filterNot(want.contains).foreach(getHandle.deleteTimer)
      want.filterNot(have.contains).foreach(getHandle.registerTimer)
      out.iterator
    }

    override def handleInputRows(key: Long, rows: Iterator[PatIn],
        timerValues: TimerValues): Iterator[PatMatch] = {
      rows.foreach(e => pending.appendValue((tsMicros(e.ts), e.id, e.etype)))
      finalizePrefix(key, timerValues.getCurrentWatermarkInMs() * 1000L)
    }

    override def handleExpiredTimer(key: Long, timerValues: TimerValues,
        expiredTimerInfo: ExpiredTimerInfo): Iterator[PatMatch] =
      finalizePrefix(key, timerValues.getCurrentWatermarkInMs() * 1000L)
  }

  def twsPatternMatch(events: org.apache.spark.sql.Dataset[PatIn],
                      delay: String = "1 hour",
                      first: String = "view", second: String = "click",
                      third: String = "purchase",
                      windowUs: Long = 3600000000L): org.apache.spark.sql.Dataset[PatMatch] = {
    val spark = events.sparkSession
    import spark.implicits._
    events.toDF().withWatermark("ts", delay).as[PatIn]
      .groupByKey(_.user)
      .transformWithState(new PatternProcessor(first, second, third, windowUs),
        TimeMode.EventTime(), OutputMode.Append())
  }
}
