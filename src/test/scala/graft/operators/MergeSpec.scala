package graft.operators

import graft.SparkSpec
import graft.sources.Tables
import org.apache.spark.sql.functions._

import java.nio.file.{Files, Path, Paths}
import scala.jdk.CollectionConverters._

/** Partitioned upsert: updates replace their keys, survivors stay, appends
  * land — and UNTOUCHED partitions are not rewritten (the O(delta) claim,
  * pinned by file mtimes, not by plan reading). */
class MergeSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  private def filesUnder(p: Path): Map[String, Long] =
    Files.walk(p).iterator().asScala
      .filter(f => Files.isRegularFile(f) && f.toString.endsWith(".parquet"))
      .map(f => f.toString -> Files.getLastModifiedTime(f).toMillis).toMap

  test("upsert rewrites only the affected partitions; merge semantics exact") {
    val base = Files.createTempDirectory("graft-merge-spec").toString
    Layout.writeDatePartitioned(Tables.events(spark, dir), col("ts"), base)
    val d = Tables.events(spark, dir).withColumn("event_date", to_date(col("ts")))

    val before = spark.read.parquet(base)
    val beforeDay3 = before
      .filter(col("event_date") === lit("2024-01-03").cast("date")).count()
    val untouched = filesUnder(Paths.get(base, "event_date=2024-01-03"))
    assert(untouched.nonEmpty, "fixture day missing")

    // update half of day 05 in place, append shifted new keys
    val upd = d.filter(col("event_date") === lit("2024-01-05").cast("date") &&
        col("event_id") % 2 === 0)
      .withColumn("value", col("value") + 1000.0)
    val nw = d.filter(col("event_date") === lit("2024-01-05").cast("date") &&
        col("event_id") % 2 === 1)
      .withColumn("event_id", col("event_id") + 10000000L)
    val nUpd = upd.count(); val nNew = nw.count()
    val day5Before = d.filter(col("event_date") === lit("2024-01-05").cast("date"))
    val n5 = day5Before.count()
    Merge.upsertPartitioned(spark, base, upd.unionByName(nw),
      Seq("event_id"), "event_date")

    val after = spark.read.parquet(base)
    // untouched partition: same files, same mtimes, same rows
    assert(filesUnder(Paths.get(base, "event_date=2024-01-03")) == untouched,
      "an unaffected partition was rewritten")
    assert(after.filter(col("event_date") === lit("2024-01-03").cast("date"))
      .count() == beforeDay3)
    // affected partition: originals + appends, updates replaced not added
    val day5 = after.filter(col("event_date") === lit("2024-01-05").cast("date"))
    assert(day5.count() == n5 + nNew, "append/replace count off")
    val updatedSum = day5.filter(col("event_id") % 2 === 0 &&
        col("event_id") < 10000000L)
      .agg(count(lit(1))).collect()(0).getLong(0)
    assert(updatedSum == nUpd)
    // every updated key carries the new value (joins back exactly)
    val wrong = day5.join(upd.select(col("event_id"),
        col("value").as("expect")), Seq("event_id"))
      .filter(col("value") =!= col("expect")).count()
    assert(wrong == 0, s"$wrong updated rows kept stale values")
  }
}
