package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, Encoders}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{ExpiredTimerInfo, GroupState, GroupStateTimeout,
  ListState, OutputMode, StatefulProcessor, TTLConfig, TimeMode, TimerValues}

import java.sql.Timestamp

/** Sessionization of the transaction stream: contiguous activity per
  * customer separated by gaps > `gap`.
  *
  * Two implementations with identical output schema:
  *  - [[native]]: the built-in `session_window` (preferred — stock Catalyst
  *    state handling, works batch and streaming);
  *  - [[withState]]: `mapGroupsWithState` with an event-time timeout — the
  *    custom-state escape hatch for session logic the native window can't
  *    express (e.g. value-dependent gaps), here kept semantically aligned
  *    with the native version as the template.
  */
object Sessionize {

  final case class SessionEvent(customer_id: String, timestamp: Timestamp, amount: Double)
  final case class SessionState(start: Long, end: Long, total: Double, n: Int)
  final case class Session(
      customer_id: String, session_start: Timestamp, session_end: Timestamp,
      total_spent: Double, n_events: Int)

  /** Built-in session windows over event time. */
  def native(df: DataFrame, gap: String = "30 minutes"): DataFrame =
    df.groupBy(session_window(col("timestamp"), gap), col("customer_id"))
      .agg(sum(col("amount")).as("total_spent"), count(lit(1)).cast("int").as("n_events"))
      .select(col("customer_id"),
        col("session_window.start").as("session_start"),
        col("session_window.end").as("session_end"),
        col("total_spent"), col("n_events"))

  /** Streaming sessionization with `flatMapGroupsWithState` + event-time
    * timeout — the production custom-state form: a session is emitted
    * exactly once, when the watermark passes its close (last event + gap),
    * and state holds only the open sessions of active customers (bounded by
    * the watermark, unlike a naive keep-everything fold).
    *
    * Input must be watermarked on `timestamp` before calling. Output mode:
    * append.
    *
    * Ordering notes: each invocation sort-merges open sessions and new
    * events, so out-of-order events within the watermark join the correct
    * session. Events later than the watermark (flatMapGroupsWithState does
    * NOT auto-drop them) merge into a still-open session when they fit, or
    * surface as their own late session — never silently vanishing or
    * rewriting already-emitted sessions.
    */
  def streaming(ds: Dataset[SessionEvent], gapMs: Long = 30 * 60 * 1000L): Dataset[Session] = {
    import ds.sparkSession.implicits._
    ds.groupByKey(_.customer_id)
      .flatMapGroupsWithState[List[SessionState], Session](
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
        (customer: String, events: Iterator[SessionEvent], state: GroupState[List[SessionState]]) =>
          val wm = state.getCurrentWatermarkMs()
          val prior = state.getOption.getOrElse(Nil)
          // sort-and-fold: every event becomes a unit session, then open
          // sessions and events merge wherever gaps close — out-of-order
          // events within the watermark land in the right session instead
          // of being compared against only the newest one
          val units = prior ++ events.map { e =>
            val t = e.timestamp.getTime
            SessionState(t, t, e.amount, 1)
          }
          // INCLUSIVE merge (<= gapMs): Spark's native session_window merges
          // an event landing exactly at the previous session's end (pinned
          // empirically by the stream_session_window oracle's strict `> gap`
          // new-session form); the fmGWS twin is graded against the same
          // oracle, so the boundary case must merge here too
          val sessions = units.sortBy(s => (s.start, s.end))
            .foldLeft(List.empty[SessionState]) {
              case (cur :: rest, s) if s.start - cur.end <= gapMs =>
                cur.copy(end = math.max(cur.end, s.end),
                  total = cur.total + s.total, n = cur.n + s.n) :: rest
              case (acc, s) => s :: acc
            }
          // close STRICTLY past end+gap: at wm == end+gap an on-time event
          // at exactly end+gap can still arrive and must merge (inclusive)
          val (closed, open) = sessions.partition(_.end + gapMs < wm)
          if (open.nonEmpty) {
            state.update(open)
            // fire when the watermark passes the earliest possible close
            state.setTimeoutTimestamp(math.max(open.map(_.end).min + gapMs, wm + 1))
          } else {
            state.remove()
          }
          closed.sortBy(_.start).iterator.map(st =>
            Session(customer, new Timestamp(st.start), new Timestamp(st.end + gapMs),
              st.total, st.n))
      }
  }

  /** Sessionization on Spark 4's `transformWithState` — the successor
    * arbitrary-state API (SPARK-49589): explicit typed state variables
    * (`ListState`) instead of one opaque state value, first-class timers
    * instead of a single timeout slot, and schema-evolvable state. Session
    * algebra is identical to [[streaming]] (the fmGWS twin) and the native
    * `session_window`, graded against the same oracle
    * (`stream_session_tws`). One contract difference from fmGWS: the engine
    * enforces the watermark at the operator boundary — input rows below the
    * current watermark are dropped BEFORE the processor (exactly the native
    * operator's late-data semantics), where fmGWS hands late rows to user
    * code (spec-pinned in SpendingPipelineSpec).
    *
    * Requires the RocksDB state store provider
    * (`GraftSession.enableRocksDbState`) — transformWithState refuses the
    * default HDFS-backed provider by design.
    *
    * Input must be watermarked on `timestamp` before calling. Output mode:
    * append.
    */
  def transformWithStateStreaming(
      ds: Dataset[SessionEvent], gapMs: Long = 30 * 60 * 1000L): Dataset[Session] = {
    import ds.sparkSession.implicits._
    ds.groupByKey(_.customer_id)
      .transformWithState(new SessionStateProcessor(gapMs),
        TimeMode.EventTime(), OutputMode.Append())
  }

  /** mapGroupsWithState sessionization — the custom-state TEMPLATE,
    * exercised in batch mode (state lives within the batch). A production
    * streaming deployment must add `GroupStateTimeout.EventTimeTimeout` +
    * pruning of closed sessions from the state list, or state grows
    * unboundedly and open sessions re-emit every trigger; prefer [[native]]
    * (built-in state lifecycle) unless the gap rule is value-dependent. */
  def withState(ds: Dataset[SessionEvent], gapMs: Long = 30 * 60 * 1000L): Dataset[Session] = {
    import ds.sparkSession.implicits._
    ds.groupByKey(_.customer_id)
      .mapGroupsWithState[List[SessionState], List[Session]](
        GroupStateTimeout.NoTimeout) {
        (customer: String, events: Iterator[SessionEvent], state: GroupState[List[SessionState]]) =>
          val sorted = events.toSeq.sortBy(_.timestamp.getTime)
          var sessions = state.getOption.getOrElse(Nil)
          sorted.foreach { e =>
            val t = e.timestamp.getTime
            sessions match {
              case cur :: rest if t - cur.end <= gapMs => // inclusive: session_window merges an event at exactly end+gap (oracle-pinned)
                sessions = cur.copy(end = t, total = cur.total + e.amount, n = cur.n + 1) :: rest
              case _ =>
                sessions = SessionState(t, t, e.amount, 1) :: sessions
            }
          }
          state.update(sessions)
          sessions.reverse.map(st =>
            Session(customer, new Timestamp(st.start), new Timestamp(st.end + gapMs),
              st.total, st.n))
      }
      .flatMap(identity)
  }
}

/** The `StatefulProcessor` behind [[Sessionize.transformWithStateStreaming]].
  *
  * State: one `ListState` of open sessions per customer (RocksDB-resident,
  * bounded by the watermark — closed sessions are emitted and dropped, so a
  * key's state holds only its currently-open sessions). Timers: exactly one
  * event-time timer per key, kept at the earliest possible session close
  * (`min(end) + gap`), so a customer who goes quiet still has their last
  * session flushed when the watermark passes it — input-driven emission
  * alone would leak the final open session forever.
  *
  * Session algebra is byte-identical to the fmGWS twin
  * ([[Sessionize.streaming]]): unit sessions sort-merged with the open set
  * (out-of-order events within the watermark land in the right session),
  * INCLUSIVE `<= gap` merge (the native `session_window` merges an event at
  * exactly end+gap — oracle-pinned), STRICT `end + gap < wm` close.
  */
class SessionStateProcessor(gapMs: Long)
    extends StatefulProcessor[String, Sessionize.SessionEvent, Sessionize.Session] {
  import Sessionize.{Session, SessionEvent, SessionState}

  @transient private var open: ListState[SessionState] = _

  override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
    open = getHandle.getListState("open", Encoders.product[SessionState], TTLConfig.NONE)

  override def handleInputRows(customer: String, events: Iterator[SessionEvent],
      timers: TimerValues): Iterator[Session] = {
    val units = open.get().toList ++ events.map { e =>
      val t = e.timestamp.getTime
      SessionState(t, t, e.amount, 1)
    }
    settle(customer, units, timers.getCurrentWatermarkInMs())
  }

  /** Timer fire = "the watermark may have closed this key's sessions":
    * re-settle from state alone (no new input). The firing timer is already
    * being removed by the engine, so it is excluded from settle's cleanup
    * (deleting it again draws a TimerStateImpl warning). */
  override def handleExpiredTimer(customer: String, timers: TimerValues,
      expired: ExpiredTimerInfo): Iterator[Session] =
    settle(customer, open.get().toList, timers.getCurrentWatermarkInMs(),
      firing = expired.getExpiryTimeInMs())

  /** Merge, emit what the watermark closed, persist the rest, and leave
    * exactly one timer at the earliest possible close (never at/below the
    * current watermark, or a no-data batch would spin re-firing it). */
  private def settle(customer: String, units: List[SessionState],
      wm: Long, firing: Long = Long.MinValue): Iterator[Session] = {
    val sessions = units.sortBy(s => (s.start, s.end))
      .foldLeft(List.empty[SessionState]) {
        case (cur :: rest, s) if s.start - cur.end <= gapMs =>
          cur.copy(end = math.max(cur.end, s.end),
            total = cur.total + s.total, n = cur.n + s.n) :: rest
        case (acc, s) => s :: acc
      }
    val (closed, stillOpen) = sessions.partition(_.end + gapMs < wm)
    getHandle.listTimers().filter(_ != firing).foreach(getHandle.deleteTimer)
    if (stillOpen.nonEmpty) {
      open.put(stillOpen.toArray)
      getHandle.registerTimer(math.max(stillOpen.map(_.end).min + gapMs, wm + 1))
    } else {
      open.clear()
    }
    closed.sortBy(_.start).iterator.map(st =>
      Session(customer, new Timestamp(st.start), new Timestamp(st.end + gapMs),
        st.total, st.n))
  }
}
