package org.apache.spark.sql.graft

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.LogicalRDD

/** Bridge to the private[sql] LogicalRDD node: after `df.localCheckpoint()`
  * the returned frame's plan is a LogicalRDD over the persisted checkpoint
  * RDD. Exposing that RDD lets the engine release the checkpoint's block
  * storage once the consuming action finishes (see graft.util.Checkpoints) —
  * without it, every near-dup query would leak its lineage-cut blocks into
  * the block manager for the life of the session. */
object RddBridge {
  def backingRdd(df: DataFrame): Option[RDD[_]] =
    df.queryExecution.analyzed.collectFirst { case l: LogicalRDD => l.rdd }
}
