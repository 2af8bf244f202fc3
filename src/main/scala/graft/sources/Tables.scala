package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Loader for the harness parquet tables (TPC-H-ish star schema plus the
  * `events` stream analog and the `documents`/`embeddings` LLM-pipeline
  * tables — see /root/repo/TESTDATA.md).
  *
  * Reads go through `spark.read.parquet` so Catalyst's column pruning and
  * filter pushdown reach the scan; never materialize a table driver-side.
  */
object Tables {
  val all: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  def apply(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  /** Spread `df` across all cores when the source produced fewer partitions
    * (a single small parquet file reads as one partition, which would pin
    * CPU-heavy per-row operators — simhash, minhash signatures, text
    * profiling — on one task). No-op when the input is already parallel, so
    * large multi-file tables pay no extra shuffle. */
  def ensureParallelism(df: DataFrame): DataFrame = {
    val p = df.sparkSession.sparkContext.defaultParallelism
    if (df.rdd.getNumPartitions < p) df.repartition(p) else df
  }

  def lineitem(spark: SparkSession, dir: String): DataFrame = apply(spark, dir, "lineitem")
  def orders(spark: SparkSession, dir: String): DataFrame = apply(spark, dir, "orders")
  def customer(spark: SparkSession, dir: String): DataFrame = apply(spark, dir, "customer")
  def supplier(spark: SparkSession, dir: String): DataFrame = apply(spark, dir, "supplier")
  def part(spark: SparkSession, dir: String): DataFrame = apply(spark, dir, "part")
  def nation(spark: SparkSession, dir: String): DataFrame = apply(spark, dir, "nation")
  def region(spark: SparkSession, dir: String): DataFrame = apply(spark, dir, "region")
  /** `events.ts` is written as parquet TIMESTAMP(NANOS), which Spark has no
    * native type for ([PARQUET_TYPE_ILLEGAL] by default). Read it as epoch
    * nanos via the legacy flag and truncate to a µs TimestampType with
    * integer arithmetic (a double round-trip would lose precision at 1e18).
    */
  def events(spark: SparkSession, dir: String): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    apply(spark, dir, "events")
      .withColumn("ts", timestamp_micros(expr("ts div 1000")))
  }
  def documents(spark: SparkSession, dir: String): DataFrame = apply(spark, dir, "documents")
  def embeddings(spark: SparkSession, dir: String): DataFrame = apply(spark, dir, "embeddings")
}
