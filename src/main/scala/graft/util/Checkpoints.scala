package graft.util

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.graft.RddBridge

/** Tracked lineage cuts.
  *
  * Several operators (MinHash/SimHash near-dup) must cut lineage with
  * `localCheckpoint()`: their self-joins reference the same subtree from
  * both sides, and without a cut the subtree is either recomputed per side
  * or — worse — the self-join's attribute dedup can mis-resolve
  * (observed: different pair sets per run). A localCheckpoint persists its
  * RDD blocks for the life of the session, so a long-lived session running
  * many near-dup queries would accumulate dead blocks in the block manager.
  *
  * `cut` = `localCheckpoint()` + remember the backing RDD; `releaseAll`
  * unpersists every checkpoint this session created. Call `releaseAll`
  * after the consuming action (Bench and Verify do, between queries; a
  * library user holding a returned DataFrame across releaseAll must
  * re-create it). Only graft-created checkpoints are touched — user caches
  * are never unpersisted.
  */
object Checkpoints {
  private val tracked = scala.collection.mutable.Map[Int, org.apache.spark.rdd.RDD[_]]()

  /** Eager localCheckpoint with tracked release. */
  def cut(df: DataFrame): DataFrame = synchronized {
    val out = df.localCheckpoint()
    RddBridge.backingRdd(out).foreach(r => tracked(r.id) = r)
    out
  }

  /** Release every checkpoint block created via [[cut]]. Safe to call at
    * any point between actions; non-blocking. */
  def releaseAll(): Unit = synchronized {
    tracked.values.foreach(_.unpersist(blocking = false))
    tracked.clear()
  }

  /** Number of currently-tracked (unreleased) checkpoints. */
  def trackedCount: Int = synchronized(tracked.size)
}
