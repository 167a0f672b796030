package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, Encoders}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

import java.sql.Timestamp

/** Structured Streaming variants of the batch event analytics
  * (graft.events.Events): the same aggregation semantics expressed as
  * an unbounded query. Batch parity is the design rule — a windowed
  * streaming aggregate over a finite input must equal the batch
  * `groupBy(window(...))` on the same rows (pinned by the spec).
  *
  * Scale notes: the windowed aggregate keeps one state row per
  * (window, event_type) — bounded by the watermark horizon, not the
  * stream length. Sessionization state is one row per open session per
  * user, evicted by processing-time timeout; both shapes run on a
  * 1000-executor cluster with state in the default HDFS-backed store
  * (or RocksDB via config, no code change).
  */
object EventsStream {

  /** Hourly tumbling-window counts per event type with a 2-hour
    * watermark for late data (reference pipeline is batch-only —
    * SURVEY.md §2.10 — so this is capability extension, not parity).
    */
  def hourlyCounts(events: DataFrame, exactValue: Boolean = false): DataFrame =
    events
      .withWatermark("ts", "2 hours")
      .groupBy(window(col("ts"), "1 hour").as("w"), col("event_type"))
      .agg(
        count(lit(1)).as("n_events"),
        // exactValue: decimal-sum variant (graft.functions.ExactAgg) —
        // order-independent, so the result is cross-engine
        // oracle-comparable; the decimal sum is just as mergeable as
        // the double sum, streaming state-wise
        (if (exactValue) graft.functions.ExactAgg.dsum(col("value"), 2)
         else sum(col("value"))).as("total_value")
      )
      .select(col("w.start").as("hour_ts"), col("event_type"), col("n_events"), col("total_value"))

  final case class Ev(user_id: Long, ts: Timestamp, value: Double)
  // start/lastSeen in MICROseconds (batch parity — the batch sessionize
  // compares unix_micros; ms truncation would merge events exactly at
  // the gap boundary that the batch splits); totalCents is the exact
  // 2-decimal sum (the batch side emits ExactAgg.dsum(value, 2) — an
  // arrival-order IEEE double accumulator would diverge from it)
  final case class SessionState(start: Long, lastSeen: Long, n: Long, totalCents: Long)
  final case class SessionOut(user_id: Long, session_start: Timestamp, session_end: Timestamp, n_events: Long, total_value: Double)

  private def microsOf(ts: Timestamp): Long =
    ts.getTime * 1000L + (ts.getNanos / 1000L) % 1000L
  private def tsOf(us: Long): Timestamp = {
    val t = new Timestamp(math.floorDiv(us, 1000000L) * 1000L)
    t.setNanos((math.floorMod(us, 1000000L) * 1000L).toInt)
    t
  }
  private def centsOf(v: Double): Long =
    java.math.BigDecimal.valueOf(v).setScale(2, java.math.RoundingMode.HALF_UP)
      .unscaledValue().longValueExact()

  /** Gap-based streaming sessionization via flatMapGroupsWithState:
    * one state row per user holding the open session; a batch closes
    * the session when it sees a gap > `gapMinutes` (emitting the
    * closed session) or — with the default ProcessingTimeTimeout —
    * when the state times out after inactivity. Pass NoTimeout for
    * deterministic finite-input runs (a processing-time timeout makes
    * the engine schedule continuous empty micro-batches to fire it).
    *
    * Late (out-of-order across micro-batches) events: there is no
    * watermark here, so an event older than the open session's
    * lastSeen can arrive. It merges into the open session with
    * monotone bounds (start = min, lastSeen = max) — bounds never
    * regress, so session_end >= session_start always holds and a late
    * straggler can never falsely close a session by dragging lastSeen
    * backwards. (An event predating start by more than the gap
    * ideally belongs to an earlier, already-emitted session; without
    * a watermark that session cannot be reopened — merging is the
    * bounded-error choice, the same one session_window makes.)
    */
  def sessionize(
      events: Dataset[Ev],
      gapMinutes: Int = 30,
      timeout: GroupStateTimeout = GroupStateTimeout.ProcessingTimeTimeout()
  ): Dataset[SessionOut] = {
    require(timeout == GroupStateTimeout.NoTimeout() || timeout == GroupStateTimeout.ProcessingTimeTimeout(),
      "sessionize supports NoTimeout or ProcessingTimeTimeout; EventTimeTimeout would need " +
        "setTimeoutTimestamp plus a watermark and is not implemented")
    val gapMs = gapMinutes.toLong * 60000L
    val gapUs = gapMinutes.toLong * 60000000L
    val withTimeout = timeout != GroupStateTimeout.NoTimeout()
    events
      .groupByKey(_.user_id)(Encoders.scalaLong)
      .flatMapGroupsWithState[SessionState, SessionOut](
        OutputMode.Append(), timeout
      ) { (userId: Long, batch: Iterator[Ev], state: GroupState[SessionState]) =>
        def emit(s: SessionState): SessionOut =
          SessionOut(userId, tsOf(s.start), tsOf(s.lastSeen), s.n, s.totalCents / 100.0)
        val out = Seq.newBuilder[SessionOut]
        var cur = state.getOption
        if (state.hasTimedOut) {
          cur.foreach(s => out += emit(s))
          state.remove()
          cur = None
        }
        batch.toSeq.sortBy(e => microsOf(e.ts)).foreach { e =>
          val t = microsOf(e.ts)
          cur match {
            case Some(s) if t - s.lastSeen <= gapUs => // covers late t: negative diff merges
              cur = Some(SessionState(math.min(s.start, t), math.max(s.lastSeen, t),
                s.n + 1, s.totalCents + centsOf(e.value)))
            case Some(s) =>
              out += emit(s)
              cur = Some(SessionState(t, t, 1L, centsOf(e.value)))
            case None =>
              cur = Some(SessionState(t, t, 1L, centsOf(e.value)))
          }
        }
        cur.foreach { s =>
          state.update(s)
          if (withTimeout) state.setTimeoutDuration(gapMs)
        }
        out.result().iterator
      }(Encoders.product[SessionState], Encoders.product[SessionOut])
  }

  /** Streaming exactly-once ingest dedup: drop events whose `idCol`
    * was already seen, keeping dedup state only within the watermark
    * horizon (`dropDuplicatesWithinWatermark`) — the at-least-once
    * source -> exactly-once corpus bridge. Unbounded `dropDuplicates`
    * state grows forever on a 100 TB stream; bounding it by the
    * watermark is the standard trade: a duplicate arriving later than
    * `delay` after the original slips through, which ingestion
    * tolerates because the batch layer's exact dedup (Dedup.exact)
    * catches stragglers downstream.
    */
  def dedupedEvents(events: DataFrame, tsCol: String = "ts",
                    idCol: String = "event_id", delay: String = "2 hours"): DataFrame =
    events
      .withWatermark(tsCol, delay)
      .dropDuplicatesWithinWatermark(idCol)

  /** Stream-stream INNER join: attribute each `click` to every `view`
    * by the same user in the preceding `horizonHours` — the funnel /
    * attribution primitive, and the remaining §2.10 feature family
    * (stateful two-input joins).
    *
    * State-bound mechanics at scale: both inputs carry a watermark and
    * the join predicate carries BOTH a key equality (`user_id` — the
    * state is hash-partitioned by it) and a time-range bound, so each
    * side buffers only `watermark + horizon` worth of rows per key
    * instead of the whole stream. On a finite drain (`availableNow`)
    * the inner-join output equals the batch join exactly — watermarks
    * only bound state/lateness, they never drop on-time matches —
    * which is what the oracle row checks.
    */
  def viewClickJoin(views: DataFrame, clicks: DataFrame,
                    horizonHours: Int = 6, delay: String = "2 hours"): DataFrame = {
    val v = views.filter(col("event_type") === "view")
      .select(col("event_id").as("view_id"), col("user_id"), col("ts").as("view_ts"))
      .withWatermark("view_ts", delay)
    val c = clicks.filter(col("event_type") === "click")
      .select(col("event_id").as("click_id"), col("user_id").as("c_user_id"),
        col("ts").as("click_ts"))
      .withWatermark("click_ts", delay)
    v.join(c,
      col("user_id") === col("c_user_id") &&
        col("click_ts") >= col("view_ts") &&
        col("click_ts") <= col("view_ts") + expr(s"INTERVAL $horizonHours HOURS"))
      .select(col("view_id"), col("click_id"), col("user_id"),
        col("view_ts"), col("click_ts"))
  }
}
