package graft.streaming

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Streaming TIME-BASED rolling aggregate — the streaming twin of
  * [[graft.operators.Skew.slidingRangeAggChunked]] and the per-event form
  * of the most common feature-serving shape: `sum(v) OVER (PARTITION BY k
  * ORDER BY o RANGE BETWEEN p PRECEDING AND CURRENT ROW)` over a stream —
  * "rolling last-24h spend per customer, emitted with every event".
  *
  * Structured Streaming's built-in window() gives PER-WINDOW aggregates
  * (tumbling/sliding buckets); a per-EVENT rolling value needs the event's
  * own trailing frame. The exact decomposition across the batch/state
  * boundary, generalized to BOUNDED-DISORDER feeds (r13, VERDICT r12 #2 —
  * `slack` is the disorder bound; 0 = the kappa-ordered r12 form):
  *
  *  1. ARRIVAL CONTRACT, enforced loudly per batch: every arriving event
  *     of key k satisfies `ord >= highWater_k - slack`, ord is non-null,
  *     and ord is unique within its key (r14: uniqueness is PROBED, not
  *     assumed — count vs count-distinct per key over the working set
  *     rides the same census; a duplicate deeper than the tail is
  *     excluded by the disorder check itself). A deeper-late event would
  *     land inside an already-FINALIZED frame, so its rolling value — and
  *     the earlier emission it retro-invalidates — could never be final;
  *     the verb fails the batch rather than silently deviating from the
  *     batch window's answer (same loud-failure stance as the r12
  *     null-ord fix, which this subsumes). The whole census — new
  *     high-water, previous high-water, min/null-count of the batch's
  *     ords — rides ONE map-side-combined per-key aggregate (ADVICE r12:
  *     the old separate `isNull` scan is folded in).
  *  2. STATE is the per-key TAIL: rows with ord within `preceding +
  *     slack` of the key's high-water, each flagged emitted-or-pending —
  *     O(arrival-rate x (window + slack)) rows, NOT O(history). Every
  *     frame member of any pending or future event lies inside that tail.
  *  3. WITHIN each micro-batch: rolling values over tail ∪ batch via the
  *     chunk-parallel RANGE verb (a hot key's slice spreads over ord
  *     blocks; `chunks = 1` is the plain-window baseline arm). An event
  *     FINALIZES — emits exactly once, with its exact rolling value —
  *     when the key's high-water passes `ord + slack`: any future arrival
  *     f has `f >= highWater - slack`, so a finalized frame
  *     [ord - p, ord] can never receive one (f = ord would duplicate an
  *     existing ord — excluded by the uniqueness contract). With
  *     slack = 0 every batch row finalizes immediately.
  *  4. the new tail re-derives from tail ∪ batch, is localCheckpoint'ed
  *     (lineage cut) and optionally snapshotted per batchId to `stateDir`
  *     (Hadoop FS — non-local paths work) for the same replay/restart
  *     contract as [[ChunkedRunning]]: foreachBatch re-delivers a failed
  *     batch with the same batchId, the entry check reloads the newest
  *     snapshot <= batchId - 1, and the re-run recomputes against exactly
  *     the pre-batch tail (idempotent for an idempotent per-batchId sink).
  *
  * NULL ords are REJECTED loudly (per batch, via the same census): a
  * null-ord row's RANGE frame is its whole null PEER GROUP — including
  * peers that arrive in FUTURE batches — so a per-event emission can
  * never be final for it (the batch verb, where every row is present at
  * once, handles nulls fine; a time-window stream needs real event
  * times). NULL keys are a normal partition. The sink receives exactly
  * (keyCol, ordCol, valueCol, resultCol) for the rows finalized by this
  * batch — with slack > 0 that includes earlier batches' rows whose
  * frames just closed, and a stream's last `slack` ord units stay
  * pending until a later event (or a flush sentinel above
  * `highWater + slack`) closes them.
  */
object RollingRange {

  /** `chunks = 0` selects PER BATCH (r13 — the same census-driven gate
    * as [[ChunkedRunning]]): the per-key row count of the working set
    * (tail ∪ batch, what the verb actually windows over) rides the
    * census aggregate the contract check already computes, and the batch
    * chunks only when the hottest key holds at least `autoHotRows` rows;
    * otherwise the plain per-key RANGE window runs (`chunks = 1`). */
  def foreachBatch(
      keyCol: String,
      ordCol: String,
      valueCol: String,
      resultCol: String,
      agg: String = "sum",
      preceding: Long = 1L,
      chunks: Int = 32,
      stateDir: Option[String] = None,
      slack: Long = 0L,
      autoHotRows: Long = 4000000L,
      autoChunks: Int = 32)(
      sink: (DataFrame, Long) => Unit): (DataFrame, Long) => Unit = {
    require(preceding >= 1, s"preceding must be >= 1 ord unit, got $preceding")
    require(slack >= 0, s"slack must be >= 0 ord units, got $slack")
    require(Set("sum", "min", "max", "count", "avg")(agg),
      s"RollingRange supports sum/min/max/count/avg, got '$agg'")
    require(chunks >= 0 && chunks <= 4096, s"chunks out of range: $chunks")
    require(autoChunks >= 2 && autoChunks <= 4096 && autoHotRows >= 1,
      s"bad auto-chunk thresholds: autoChunks=$autoChunks autoHotRows=$autoHotRows")
    val horizon = preceding + slack

    // closure state: the tail after the last processed batch (serial per
    // query, so plain vars are safe) — columns (keyCol, ordCol, valueCol,
    // __emitted), pending rows flagged false
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
      Seq(resultCol, "__new", "__emitted", "__mk", "__mo", "__pm", "__nmin",
          "__nnull", "__cnt").foreach(h =>
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
        .withColumn("__emitted", lit(false))
        .withColumn("__new", lit(true))
      val combined = tail match {
        case Some(t) => t.withColumn("__new", lit(false)).unionByName(slim)
        case None => slim
      }
      // ONE per-key census carries the new high-water AND the whole
      // arrival-contract check — no separate null-scan, no separate
      // maxes job (ADVICE r12 / VERDICT r12 #1+#3). One row per key,
      // pinned so the violation probe, the emission join and the tail
      // rebuild all read the SAME computed relation.
      val census = combined.groupBy(col(keyCol).as("__mk")).agg(
        max(col(ordCol)).as("__mo"),
        max(when(!col("__new"), col(ordCol))).as("__pm"),
        min(when(col("__new"), col(ordCol))).as("__nmin"),
        count(when(col("__new") && col(ordCol).isNull, lit(1))).as("__nnull"),
        count(lit(1)).as("__cnt"),
        // uniqueness probe (r14, ADVICE r13): the slack-finality proof
        // excludes a late arrival landing ON a finalized row's ord only
        // via ord uniqueness — a duplicate inside the working set would
        // silently change an already-emitted frame's membership, so the
        // promised loud failure must actually check it. count vs
        // count(distinct) over the working set covers every duplicate the
        // proof cares about: deeper-than-tail duplicates are already
        // excluded by the disorder check itself.
        count(col(ordCol)).as("__cnn"),
        countDistinct(col(ordCol)).as("__dord"))
        .localCheckpoint(true)
      // fail loudly on contract violations: null event times (their RANGE
      // peer group spans future batches), deeper-than-slack disorder
      // (the event lands inside an already-finalized frame), and
      // duplicate ords within a key — all the silent-wrong class this
      // family refuses to emit
      val bad = census.filter(col("__nnull") > 0 ||
        (col("__pm").isNotNull && col("__nmin") < col("__pm") - slack) ||
        col("__dord") < col("__cnn")).take(1)
      require(bad.isEmpty, {
        val r = bad(0)
        if (r.getLong(r.fieldIndex("__nnull")) > 0)
          s"RollingRange requires non-null '$ordCol' event times: a " +
            "null-ord row's RANGE peer frame includes future arrivals " +
            s"(key=${r.get(0)})"
        else if (r.getLong(r.fieldIndex("__dord")) <
            r.getLong(r.fieldIndex("__cnn")))
          s"RollingRange requires '$ordCol' unique within key=${r.get(0)}: " +
            s"the working set holds ${r.getLong(r.fieldIndex("__cnn"))} " +
            s"non-null ords but only ${r.getLong(r.fieldIndex("__dord"))} " +
            "distinct values — a duplicate ord changes an already-emitted " +
            "frame's membership (dedup the feed, or compose a tiebreak " +
            "into the event time)"
        else
          s"RollingRange ordering contract violated for key=${r.get(0)}: " +
            s"batch min $ordCol=${r.get(r.fieldIndex("__nmin"))} is more " +
            s"than slack=$slack below the key's high-water " +
            s"${r.get(r.fieldIndex("__pm"))} — the event falls inside an " +
            "already-finalized frame (raise slack, or repair the feed)"
      })
      // chunks = 0: decide from THIS batch's hottest working-set key —
      // the per-key count already rides the pinned census, so the auto
      // gate costs one cheap scan of the one-row-per-key relation
      val effChunks =
        if (chunks > 0) chunks
        else {
          val top = census.agg(max(col("__cnt"))).collect()(0)
          if (!top.isNullAt(0) && top.getLong(0) >= autoHotRows) autoChunks
          else 1
        }
      // rolling values over tail ∪ batch — every finalizable row's frame
      // is fully present (arrival contract); pending/context rows compute
      // values too but only finalized rows ship
      val rolled = graft.operators.Skew.slidingRangeAggChunked(
        combined, keyCol, ordCol, valueCol, resultCol, agg,
        preceding = preceding, following = 0L, chunks = effChunks)
      val hw = census.select(col("__mk"), col("__mo"))
      // finality: the key's high-water passed ord + slack. slack = 0
      // degenerates to "every batch row, immediately" (the kappa-ordered
      // arm keeps its r12 join-free sink plan: a tail row is always
      // already emitted there, and a new row is always final).
      val fin = col(ordCol) <= col("__mo") - slack
      val out =
        if (slack == 0)
          rolled.filter(col("__new"))
            .select(col(keyCol), col(ordCol), col(valueCol), col(resultCol))
        else
          rolled.join(hw, col(keyCol) <=> col("__mk"))
            .filter(!col("__emitted") && fin)
            .select(col(keyCol), col(ordCol), col(valueCol), col(resultCol))
      sink(out, batchId)

      // next tail: frame context AND still-pending rows — pending rows
      // have ord > highWater - slack >= highWater - horizon, so the one
      // horizon filter keeps both. Null-safe key join: a NULL key is a
      // normal partition.
      val nextTail = combined.join(hw, col(keyCol) <=> col("__mk"))
        .filter(col(ordCol) >= col("__mo") - horizon)
        .select(col(keyCol), col(ordCol), col(valueCol),
          (col("__emitted") || fin).as("__emitted"))
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
