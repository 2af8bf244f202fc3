package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scratch: exact-distinct-per-key under a 60% hot key — which shapes
  * straggle and which spread. Deleted once the findings land in Bench. */
object ScratchSkew {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .appName("scratch-skew").master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.skewJoin.enabled", "false")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def bigSkewed = spark.range(20000000L).select(
      when(pmod(col("id"), lit(10)) < 6, lit(0L))
        .otherwise(pmod(xxhash64(col("id")), lit(999999L)) + 1L).as("key"),
      pmod(xxhash64(col("id"), lit(7)), lit(5000000L)).as("v"))

    def time(name: String)(f: => Long): Unit = {
      val t0 = System.nanoTime()
      val n = f
      println(f"$name%-28s ${(System.nanoTime() - t0) / 1e9}%.2f s  (result $n)")
    }

    // warmup
    bigSkewed.count()

    time("plain_count_distinct") {
      bigSkewed.groupBy("key").agg(count_distinct(col("v")).as("d"))
        .agg(sum(col("d"))).collect()(0).getLong(0)
    }
    time("plain_collect_set") {
      bigSkewed.groupBy("key").agg(size(collect_set(col("v"))).cast("long").as("d"))
        .agg(sum(col("d"))).collect()(0).getLong(0)
    }
    time("salted_two_phase") {
      bigSkewed
        .withColumn("__salt", pmod(xxhash64(col("v")), lit(32)))
        .groupBy(col("key"), col("__salt"))
        .agg(count_distinct(col("v")).as("__pd"))
        .groupBy(col("key")).agg(sum(col("__pd")).as("d"))
        .agg(sum(col("d"))).collect()(0).getLong(0)
    }
    println("--- plain_count_distinct plan ---")
    bigSkewed.groupBy("key").agg(count_distinct(col("v")).as("d"))
      .explain("formatted")
    spark.stop()
  }
}
