package graft.sources

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.TimestampType

import graft.SparkSpec

/** Schema-drift canary for the events loader (round-7 postmortem: the
  * harness testdata silently moved `ts` from parquet TIMESTAMP(NANOS) to
  * timestamp[us], and the hard-coded nanos shim errored 38/122 queries).
  * One fixture per physical encoding the loader claims to handle; a future
  * encoding change fails ONE named test here instead of the whole gate.
  */
class TablesSchemaSpec extends SparkSpec {

  /** Write an `events.parquet` whose `ts` column is produced by `tsExpr`,
    * then load it through `Tables.events` and return the resulting ts type. */
  private def roundTrip(name: String, tsSql: String) = {
    val dir = Files.createTempDirectory(s"events-canary-$name").toFile
    dir.deleteOnExit()
    spark.range(100)
      .select(col("id").as("event_id"), expr(tsSql).as("ts"),
        (col("id") % 7).as("user_id"))
      .coalesce(1).write.mode("overwrite").parquet(s"$dir/events.parquet")
    Tables.events(spark, dir.toString)
  }

  test("events loader: epoch-long ts (legacy nanos read path) -> TimestampType") {
    // Under spark.sql.legacy.parquet.nanosAsLong a TIMESTAMP(NANOS) column
    // surfaces as LongType; a plain int64 ts column exercises the same branch.
    val df = roundTrip("nanos", "1700000000000000000 + id * 1000000000")
    assert(df.schema("ts").dataType == TimestampType)
    // 1.7e18 nanos = 1.7e15 micros: integer truncation, not a double round-trip
    assert(df.agg(min("ts")).head.getTimestamp(0).getTime == 1700000000000L)
  }

  test("events loader: timestamp_ntz ts (current harness encoding) -> TimestampType") {
    val df = roundTrip("ntz", "cast(timestamp'2024-01-01 00:00:00' + make_interval(0,0,0,0,0,0,id) as timestamp_ntz)")
    assert(df.schema("ts").dataType == TimestampType)
    // session TZ is UTC, so the NTZ->TZ cast must be offset-free
    assert(df.agg(min("ts")).head.getTimestamp(0).getTime == 1704067200000L)
  }

  test("events loader: tz-adjusted timestamp ts -> passes through unchanged") {
    val df = roundTrip("tz", "timestamp'2024-01-01 00:00:00' + make_interval(0,0,0,0,0,0,id)")
    assert(df.schema("ts").dataType == TimestampType)
    assert(df.agg(min("ts")).head.getTimestamp(0).getTime == 1704067200000L)
  }

  test("events loader: real harness file yields TimestampType") {
    val df = Tables.events(spark, "/root/testdata/sf0.001")
    assert(df.schema("ts").dataType == TimestampType)
    assert(df.limit(1).count() == 1)
  }
}
