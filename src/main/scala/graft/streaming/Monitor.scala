package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.streaming.StreamingQueryListener
import org.apache.spark.sql.streaming.StreamingQueryListener.{QueryProgressEvent, QueryStartedEvent, QueryTerminatedEvent}

/** Bounded in-memory capture of streaming progress — the observability
  * surface a long-running pipeline needs: per-micro-batch input volume and
  * rate, state-store rows/bytes (the watermark-eviction health signal the
  * scale soak graphs), and the current event-time watermark.
  *
  * Attach once per session ([[attach]]); every query's progress lands in
  * one bounded ring (oldest batches evicted past `maxBatches`, so a
  * months-long run holds constant memory). Read as a DataFrame ([[toDF]])
  * to alert on it with the same engine that runs the pipeline — e.g.
  * `monitor.toDF(spark).filter($"state_rows" > bound)` as a state-growth
  * alarm, or join against expected-throughput reference data.
  *
  * The driver-side footprint is `maxBatches` small records — no executor
  * cost; the listener bus delivers events asynchronously, so [[batches]]
  * immediately after `processAllAvailable()` may trail by a beat (tests
  * spin briefly; production readers don't care).
  */
class Monitor(maxBatches: Int = 256) extends StreamingQueryListener {
  import Monitor.Batch

  private val buf = new java.util.concurrent.ConcurrentLinkedDeque[Batch]

  override def onQueryStarted(e: QueryStartedEvent): Unit = ()
  override def onQueryTerminated(e: QueryTerminatedEvent): Unit = ()

  override def onQueryProgress(e: QueryProgressEvent): Unit = {
    val p = e.progress
    val so = p.stateOperators
    record(Batch(
      query_name = Option(p.name).getOrElse(""),
      batch_id = p.batchId,
      timestamp = p.timestamp,
      input_rows = p.numInputRows,
      rows_per_sec = p.inputRowsPerSecond,
      state_rows = if (so == null) 0L else so.map(_.numRowsTotal).sum,
      state_bytes = if (so == null) 0L else so.map(_.memoryUsedBytes).sum,
      watermark = Option(p.eventTime.get("watermark")).getOrElse("")))
  }

  private[streaming] def record(b: Batch): Unit = {
    buf.addLast(b)
    while (buf.size() > maxBatches) buf.pollFirst()
  }

  /** Oldest-first snapshot of the retained batches. */
  def batches: Seq[Batch] = {
    val it = buf.iterator()
    val b = Seq.newBuilder[Batch]
    while (it.hasNext) b += it.next()
    b.result()
  }

  /** The retained progress as a DataFrame (one row per micro-batch). */
  def toDF(spark: SparkSession): DataFrame = {
    import spark.implicits._
    batches.toDF()
  }

  def attach(spark: SparkSession): this.type = {
    spark.streams.addListener(this); this
  }

  def detach(spark: SparkSession): Unit = spark.streams.removeListener(this)
}

object Monitor {
  /** One micro-batch's health record. `rows_per_sec` is NaN on the first
    * batch (Spark reports no elapsed interval yet). */
  case class Batch(
      query_name: String,
      batch_id: Long,
      timestamp: String,
      input_rows: Long,
      rows_per_sec: Double,
      state_rows: Long,
      state_bytes: Long,
      watermark: String)
}
