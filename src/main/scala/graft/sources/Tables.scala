package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, TimestampNTZType, TimestampType}

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
  /** `events.ts` has shipped with different physical encodings across harness
    * versions: parquet TIMESTAMP(NANOS) (reads as LongType epoch-nanos under
    * the legacy flag), timestamp[us] without timezone (reads as
    * TIMESTAMP_NTZ), or a plain tz-adjusted timestamp. Hard-coding any one of
    * them breaks when the testdata regenerates, so branch on the type the
    * scan actually yields and normalize to a µs TimestampType. The session
    * timezone is UTC (GraftSession), so the NTZ→TZ cast is offset-free; the
    * nanos path truncates with integer arithmetic (a double round-trip would
    * lose precision at 1e18). The legacy flag stays set — it is a no-op on
    * µs-encoded files.
    */
  def events(spark: SparkSession, dir: String): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val df = apply(spark, dir, "events")
    val ts = df.schema("ts").dataType match {
      case LongType            => timestamp_micros(expr("ts div 1000"))
      case _: TimestampNTZType => col("ts").cast(TimestampType)
      case _                   => col("ts")
    }
    df.withColumn("ts", ts)
  }
  def documents(spark: SparkSession, dir: String): DataFrame = apply(spark, dir, "documents")
  def embeddings(spark: SparkSession, dir: String): DataFrame = apply(spark, dir, "embeddings")
}
