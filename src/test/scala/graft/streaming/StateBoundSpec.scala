package graft.streaming

import graft.SparkSpec
import graft.streaming.SpendingPipeline.{Config, Sink, Source}
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

/** Watermark eviction must BOUND streaming state: as event time marches far
  * past the watermark batch after batch, dedup + window state for old data
  * is dropped, so total state rows plateau instead of growing with
  * cumulative input. This is the spec-sized twin of the bench's
  * `stream_state_2m` soak stage (which records the full curves at 2M
  * events under both state backends). */
class StateBoundSpec extends SparkSpec {

  test("daily-spend state plateaus under the watermark as input grows 8x") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val batches = 8
    val perBatch = 20000L
    val ms = MemoryStream[String]
    val daily = SpendingPipeline.dailySpend(spark, Source.Raw(ms.toDF()))
    val q = SpendingPipeline.start(daily, Sink.Memory("state_bound"),
      Config(), "state_bound_q")
    val stateRows =
      try {
        (0 until batches).map { b =>
          // ids continue across batches -> event time advances ~33 min per
          // batch at the generator's 10 events/s, far past the 5-minute
          // watermark, so each batch should evict the previous batch's state
          val chunk = graft.sources.DataGen
            .transactionsJson(spark, perBatch, startId = b * perBatch)
            .collect().map(_.getString(0))
          ms.addData(chunk.toIndexedSeq)
          q.processAllAvailable()
          q.lastProgress.stateOperators.map(_.numRowsTotal).sum
        }
      } finally q.stop()

    // state never grows with cumulative input: every batch's state is a
    // small fraction of the events fed so far ...
    val total = batches * perBatch
    assert(stateRows.last < total / 10,
      s"state did not plateau: $stateRows after $total events")
    // ... and the curve is flat once warm (batches after the first stay
    // within 2x of the smallest warm batch — a growing curve fails this)
    val warm = stateRows.drop(1)
    assert(warm.max <= 2 * warm.min.max(1L),
      s"state grew across warm batches: $stateRows")
  }
}
