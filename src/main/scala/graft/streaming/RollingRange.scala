package graft.streaming

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Streaming TIME-BASED rolling aggregate — the streaming twin of
  * [[graft.operators.Skew.slidingRangeAggChunked]] and the per-event form
  * of the most common feature-serving shape: `sum(v) OVER (PARTITION BY k
  * ORDER BY o RANGE BETWEEN p PRECEDING AND CURRENT ROW)` over an
  * arrival-ordered stream — "rolling last-24h spend per customer, emitted
  * with every event".
  *
  * Structured Streaming's built-in window() gives PER-WINDOW aggregates
  * (tumbling/sliding buckets); a per-EVENT rolling value needs the event's
  * own trailing frame. The exact decomposition across the batch/state
  * boundary:
  *
  *  1. STATE is the per-key TAIL: rows with ord within `preceding` of the
  *     key's max ord — O(arrival-rate x window horizon) rows, NOT
  *     O(history) (the same bound a watermarked stream-stream range join
  *     keeps). Under the family's ordering contract (per key, ord
  *     non-decreasing across batches and unique within the key) every
  *     frame row of a future event is inside that tail: a new row r has
  *     o_r >= prevMax_k, so its frame floor o_r - p >= prevMax_k - p.
  *  2. WITHIN each micro-batch: rolling values over tail ∪ batch via the
  *     chunk-parallel RANGE verb (a hot key's slice spreads over ord
  *     blocks; `chunks = 1` is the plain-window baseline arm), then only
  *     the batch's own rows ship to the sink.
  *  3. the new tail re-derives from tail ∪ batch and is localCheckpoint'ed
  *     (lineage cut) and optionally snapshotted per batchId to `stateDir`
  *     (Hadoop FS — non-local paths work) for the same replay/restart
  *     contract as [[ChunkedRunning]]: foreachBatch re-delivers a failed
  *     batch with the same batchId, the entry check reloads the newest
  *     snapshot <= batchId - 1, and the re-run recomputes against exactly
  *     the pre-batch tail (idempotent for an idempotent per-batchId sink).
  *
  * NULL ords are REJECTED loudly (per batch): a null-ord row's RANGE
  * frame is its whole null PEER GROUP — including peers that arrive in
  * FUTURE batches — so a per-event emission can never be final for it
  * (the batch verb, where every row is present at once, handles nulls
  * fine; a time-window stream needs real event times). Silently emitting
  * the peers-so-far value would deviate from the batch window's answer,
  * and this engine's streaming twins promise batch parity. NULL keys are
  * a normal partition. The sink receives exactly (keyCol, ordCol,
  * valueCol, resultCol) for the batch's rows.
  */
object RollingRange {

  def foreachBatch(
      keyCol: String,
      ordCol: String,
      valueCol: String,
      resultCol: String,
      agg: String = "sum",
      preceding: Long = 1L,
      chunks: Int = 32,
      stateDir: Option[String] = None)(
      sink: (DataFrame, Long) => Unit): (DataFrame, Long) => Unit = {
    require(preceding >= 1, s"preceding must be >= 1 ord unit, got $preceding")
    require(Set("sum", "min", "max", "count", "avg")(agg),
      s"RollingRange supports sum/min/max/count/avg, got '$agg'")
    require(chunks >= 1 && chunks <= 4096, s"chunks out of range: $chunks")

    // closure state: the tail after the last processed batch (serial per
    // query, so plain vars are safe) — columns (keyCol, ordCol, valueCol)
    var tail: Option[DataFrame] = None
    var lastId: Long = -1L

    def snapshotPath(dir: String, id: Long) = s"$dir/tail_$id"
    val snapName = "^tail_(\\d+)$".r
    def hadoopFs(spark: org.apache.spark.sql.SparkSession, dir: String) =
      new org.apache.hadoop.fs.Path(dir)
        .getFileSystem(spark.sessionState.newHadoopConf())
    def listSnapshots(
        spark: org.apache.spark.sql.SparkSession, dir: String): Seq[Long] = {
      val fs = hadoopFs(spark, dir)
      val p = new org.apache.hadoop.fs.Path(dir)
      if (!fs.exists(p)) Seq.empty
      else fs.listStatus(p).toSeq.flatMap(_.getPath.getName match {
        case snapName(id) => Some(id.toLong)
        case _ => None
      })
    }

    (batch: DataFrame, batchId: Long) => {
      Seq(keyCol, ordCol, valueCol).foreach(c =>
        require(batch.columns.contains(c),
          s"column '$c' not found in ${batch.columns.mkString("[", ",", "]")}"))
      Seq(resultCol, "__new", "__mk", "__mo").foreach(h =>
        require(!batch.columns.contains(h),
          s"batch already carries the internal/result column '$h'"))
      val spark = batch.sparkSession
      // replay/restart detection — identical contract to ChunkedRunning
      if (lastId != batchId - 1) {
        tail.foreach(_.unpersist())
        tail = stateDir.flatMap { dir =>
          val ids = listSnapshots(spark, dir).filter(_ <= batchId - 1)
          if (ids.isEmpty) None
          else Some(spark.read.parquet(snapshotPath(dir, ids.max)).persist())
        }
        lastId = batchId - 1
      }

      val slim = batch.select(col(keyCol), col(ordCol), col(valueCol))
      // fail loudly on null event times — their RANGE peer group spans
      // FUTURE batches, so no per-event emission can be final (class doc)
      require(slim.filter(col(ordCol).isNull).isEmpty,
        s"RollingRange requires non-null '$ordCol' event times: a null-ord " +
          "row's RANGE peer frame includes future arrivals")
      val tagged = slim.withColumn("__new", lit(true))
      val combined = tail match {
        case Some(t) => t.withColumn("__new", lit(false)).unionByName(tagged)
        case None => tagged
      }
      // rolling values over tail ∪ batch — every new row's frame is fully
      // present (ordering contract); tail rows recompute values too but
      // only the batch's rows ship
      val rolled = graft.operators.Skew.slidingRangeAggChunked(
        combined, keyCol, ordCol, valueCol, resultCol, agg,
        preceding = preceding, following = 0L, chunks = chunks)
      sink(rolled.filter(col("__new")).drop("__new"), batchId)

      // next tail: rows within `preceding` of the per-key max ord.
      // Null-safe key join: a NULL key is a normal partition.
      val maxes = combined.groupBy(col(keyCol).as("__mk"))
        .agg(max(col(ordCol)).as("__mo"))
      val nextTail = combined.drop("__new")
        .join(maxes, col(keyCol) <=> col("__mk"))
        .filter(col(ordCol) >= col("__mo") - preceding)
        .select(col(keyCol), col(ordCol), col(valueCol))
      val next = nextTail.localCheckpoint(true)
      stateDir.foreach { dir =>
        next.write.mode("overwrite").parquet(snapshotPath(dir, batchId))
        val fs = hadoopFs(spark, dir)
        listSnapshots(spark, dir).filter(_ < batchId - 1).foreach { old =>
          fs.delete(new org.apache.hadoop.fs.Path(snapshotPath(dir, old)), true)
        }
      }
      tail.foreach(_.unpersist())
      tail = Some(next)
      lastId = batchId
    }
  }
}
