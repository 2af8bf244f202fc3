package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Output layout for training consumption — the step after curation and
  * packing: route every row to one of `numShards` shards by content hash of
  * its id, sort within each shard, and write one parquet directory per
  * shard. The properties a training loader needs:
  *
  *   - shard assignment is a pure function of the id (xxhash64 — stable
  *     across runs and as the corpus grows, like [[Sampling.hashSplit]];
  *     re-sharding never reshuffles surviving rows between shards unless
  *     `numShards` changes),
  *   - rows inside a shard are contiguous and sorted (e.g. by the packer's
  *     `(bin, bin_offset)`), so a loader streams a shard sequentially,
  *   - `partitionBy` gives exact `shard=K` directories — a shard is a
  *     directory, not a "roughly one file" hope.
  *
  * Scale shape: one shuffle on the shard id (numShards-way), sort within
  * partitions only — never a global sort. At 100 TB pick numShards so a
  * shard is a few GB (the usual shard contract), thousands of shards; the
  * shuffle is the unavoidable one any layout step pays.
  */
object Layout {

  /** Stable shard id in [0, numShards). */
  def shardId(id: Column, numShards: Int): Column =
    pmod(xxhash64(id), lit(numShards.toLong)).cast("int")

  /** Route, sort, write. `sortCols` orders rows WITHIN each shard (pass the
    * packing order `(bin, bin_offset)` for packed corpora, or the doc id).
    * Returns the sharded frame it wrote (for inspection/tests). */
  def writeTrainingShards(
      df: DataFrame,
      outDir: String,
      numShards: Int,
      sortCols: Seq[Column],
      idCol: String = "doc_id"): DataFrame = {
    require(numShards > 0, s"numShards must be positive, got $numShards")
    val sharded = df.withColumn("shard", shardId(col(idCol), numShards))
      // one task per shard value (hash collisions may co-locate two shard
      // values in a task; partitionBy still splits them into exact dirs)
      .repartition(numShards, col("shard"))
      .sortWithinPartitions(col("shard") +: sortCols: _*)
    sharded.write.mode("overwrite").partitionBy("shard").parquet(outDir)
    sharded
  }
}
