package graft.streaming

import graft.operators.TextAnalysis
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** The streaming face of the LLM-data tier: continuous document ingest ->
  * content-fingerprint dedup -> quality filter.
  *
  * Dedup keys on the normalized-content fingerprint (lowercased,
  * whitespace-collapsed md5 — [[TextAnalysis.fingerprint]]), so a re-crawl
  * of the same page with different whitespace/casing is one document. State
  * is bounded by the watermark (`dropDuplicatesWithinWatermark`): at 100 TB
  * of rolling crawl the dedup state holds only the watermark window, not
  * the corpus — cross-window exact dedup belongs to the batch compaction
  * pass ([[graft.operators.Dedup.exact]]).
  *
  * Everything here is scan-parallel expression work plus the one stateful
  * dedup operator; no other shuffle.
  */
object DocumentPipeline {

  /** Clean a streaming documents frame (must carry `text` and an event-time
    * column `tsCol`): watermark -> fingerprint dedup -> quality floor.
    * Output adds `fingerprint` and `quality_score`. */
  def clean(
      docs: DataFrame,
      tsCol: String = "ingest_ts",
      watermark: String = "10 minutes",
      minQuality: Double = 0.3): DataFrame =
    docs
      .withWatermark(tsCol, watermark)
      .withColumn("fingerprint", TextAnalysis.fingerprint(col("text")))
      .dropDuplicatesWithinWatermark(Seq("fingerprint"))
      .withColumn("quality_score", TextAnalysis.qualityScore(col("text")))
      .filter(col("quality_score") >= minQuality)
}
