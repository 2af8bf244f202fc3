package graft.streaming

import graft.SparkSpec
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions.col

/** Streaming document cleaning: fingerprint dedup must span micro-batches
  * (within the watermark) and the quality floor must drop junk documents. */
class DocumentPipelineSpec extends SparkSpec {

  private val goodA = "the quick brown fox jumps over the lazy dog and it runs far " +
    "away into the deep green forest while the hunter sleeps at home and the " +
    "birds sing in the trees above the quiet river for most of an afternoon"
  // same content as goodA modulo whitespace/case — same fingerprint
  private val goodADup = "  THE quick   brown fox jumps over the lazy dog and it runs far " +
    "away into the deep green forest while the hunter sleeps at home and the " +
    "birds sing in the trees above the quiet river for most of an afternoon "
  private val goodB = "a second perfectly reasonable document about the weather and " +
    "the sea and the long journey of a small boat that sails to the island in " +
    "the morning light while the fishermen prepare their nets for the day"
  private val junk = "@@@@ !!!! ???? ####"

  test("cross-batch fingerprint dedup + quality floor (streaming LLM tier)") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val ms = MemoryStream[(Long, String, java.sql.Timestamp)]
    def ts(s: String) = java.sql.Timestamp.valueOf(s)
    val docs = ms.toDF().toDF("doc_id", "text", "ingest_ts")
    val cleaned = DocumentPipeline.clean(docs)
      .select("doc_id", "text", "quality_score")
    val ckpt = java.nio.file.Files.createTempDirectory("graft-docstream").toString
    val q = cleaned.writeStream.outputMode("append")
      .option("checkpointLocation", ckpt)
      .format("memory").queryName("doc_stream").start()

    ms.addData((1L, goodA, ts("2025-03-10 12:00:00")), (2L, junk, ts("2025-03-10 12:00:10")))
    q.processAllAvailable()
    // one micro-batch later, still within the watermark: a re-crawl of doc 1
    // (whitespace/case variant -> identical fingerprint) plus a new doc
    ms.addData((3L, goodADup, ts("2025-03-10 12:01:00")), (4L, goodB, ts("2025-03-10 12:01:30")))
    q.processAllAvailable()
    q.stop()

    val out = spark.table("doc_stream")
    val kept = out.select("doc_id").as[Long].collect().toSet
    assert(kept == Set(1L, 4L),
      s"expected dedup to drop the re-crawl and quality to drop junk, kept $kept")
    // sanity on the score direction: kept docs clear the floor
    assert(out.filter(col("quality_score") < 0.3).count() == 0)
  }
}
