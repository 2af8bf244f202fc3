package graft.streaming

import org.apache.spark.sql.{Dataset, Encoders}
import org.apache.spark.sql.streaming.{OutputMode, StatefulProcessor, TTLConfig,
  TimeMode, TimerValues, ValueState}

/** Streaming SCD2 changelog: the live twin of
  * [[graft.operators.AsOf.scd2Intervals]]'s change-detection half. Each
  * key holds ONE ValueState row `(last attribute, version counter)`; an
  * arriving event emits a change row iff its attribute differs from the
  * held one — the per-key dimension-history state machine, state bounded
  * at one row per key regardless of event volume (the interval-CLOSE
  * column stays a batch/downstream concern: append mode cannot revise an
  * emitted row, so the stream publishes the changelog `(key, attr,
  * valid_from, version)` and readers derive `valid_to` as the next
  * version's `valid_from` — exactly how CDC systems ship SCD2).
  *
  * Events inside one micro-batch arrive per key as an unordered iterator —
  * the processor sorts each key's batch slice by `(ts, id)` before folding
  * (bounded by the batch, not the stream). Cross-batch order is the
  * feed's contract, same as every keyed changelog consumer: replay in
  * commit order. */
object Scd2Stream {

  final case class Ev(key: String, ts: Long, attr: String, id: Long)
  final case class Change(key: String, attr: String, valid_from: Long, version: Long)

  def changes(ds: Dataset[Ev]): Dataset[Change] = {
    import ds.sparkSession.implicits._
    ds.groupByKey(_.key)
      .transformWithState(new Scd2Processor, TimeMode.None(), OutputMode.Append())
  }
}

class Scd2Processor
    extends StatefulProcessor[String, Scd2Stream.Ev, Scd2Stream.Change] {
  import Scd2Stream.{Change, Ev}

  // (last attribute value, versions emitted so far)
  @transient private var last: ValueState[(String, Long)] = _

  override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
    last = getHandle.getValueState("last",
      Encoders.tuple(Encoders.STRING, Encoders.scalaLong), TTLConfig.NONE)

  override def handleInputRows(key: String, rows: Iterator[Ev],
      timers: TimerValues): Iterator[Change] = {
    var (cur, version) =
      if (last.exists()) last.get() else (null: String, 0L)
    val out = Vector.newBuilder[Change]
    rows.toVector.sortBy(e => (e.ts, e.id)).foreach { e =>
      if (cur == null || cur != e.attr) {
        version += 1
        cur = e.attr
        out += Change(key, e.attr, e.ts, version)
      }
    }
    last.update((cur, version))
    out.result().iterator
  }
}
