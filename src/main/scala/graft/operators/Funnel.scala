package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Event-sequence analytics: ordered conversion funnels and cohort
  * retention over an event log.
  *
  * Reference context: the reference pipeline stops at windowed per-customer
  * spend (`CustomerSpendingAnalysis.scala:78-88`); funnel and retention are
  * the next questions a production deployment asks of the same event
  * stream, provided here as first-class operators. Both are integer-exact
  * (timestamps, dates and counts — no floating-point aggregation), so they
  * hash-match a SQL oracle bit for bit.
  */
object Funnel {

  /** Strict ordered funnel by earliest qualifying occurrence: a user
    * reaches step k when they have a step-k event at-or-after their step-
    * (k-1) reach time, within `windowSec` of it (`windowSec <= 0` =
    * unbounded); the reach time is the EARLIEST such event. One output row
    * per step: `(step, step_name, n_users)` — a step nobody reaches still
    * emits its row with 0.
    *
    * 100 TB shape: the log is filtered to each step's type BEFORE any
    * shuffle (the filter reaches the parquet scan; a step frame carries one
    * row per user, not the log), and every stage groups and joins on the
    * SAME user key, so the first exchange's hash partitioning is reused
    * down the chain. The step loop runs over the static step list — plan
    * construction, not a driver data loop.
    */
  def ordered(events: DataFrame, userCol: String, typeCol: String,
      tsCol: String, steps: Seq[String], windowSec: Long = 0L): DataFrame = {
    require(steps.nonEmpty, "funnel needs at least one step")
    val log = events.select(col(userCol).as("u"), col(typeCol).as("t"),
      col(tsCol).as("ts"))
    // interval arithmetic, not epoch-second casts: casting to long would
    // truncate sub-second precision and flip boundary comparisons vs an
    // oracle computing at native resolution
    def within(reached: Column): Column =
      if (windowSec <= 0) lit(true)
      else col("ts") <= reached + expr(s"INTERVAL $windowSec SECOND")
    def stepRow(i: Int, name: String, reachedUsers: DataFrame): DataFrame =
      reachedUsers.agg(count(lit(1)).as("n_users"))
        .select(lit(i).cast("int").as("step"), lit(name).as("step_name"),
          col("n_users"))
    var cur = log.filter(col("t") === steps.head)
      .groupBy(col("u")).agg(min(col("ts")).as("reached"))
    var out = stepRow(1, steps.head, cur)
    steps.drop(1).zipWithIndex.foreach { case (st, i) =>
      cur = log.filter(col("t") === st)
        .join(cur, "u")
        .filter(col("ts") >= col("reached") && within(col("reached")))
        .groupBy(col("u")).agg(min(col("ts")).as("reached"))
      out = out.union(stepRow(i + 2, st, cur))
    }
    out
  }

  /** Cohort retention: users grouped by first-activity date; for each
    * offset day `0 <= d < periods`, how many of that cohort were active d
    * days later. Emits `(cohort, day_offset, n_users)` — (cohort, offset)
    * pairs with no active users emit nothing, matching plain SQL GROUP BY.
    *
    * 100 TB shape: two aggregations — the first-touch frame (one row per
    * user, min combines map-side) joined back on the user key the groupBy
    * just partitioned by, then the distinct count per (cohort, offset).
    * Nothing carries event payloads past the first projection.
    */
  def cohortRetention(events: DataFrame, userCol: String, tsCol: String,
      periods: Int): DataFrame = {
    require(periods > 0, "periods must be positive")
    val log = events.select(col(userCol).as("u"), to_date(col(tsCol)).as("day"))
    val first = log.groupBy(col("u")).agg(min(col("day")).as("cohort"))
    log.join(first, "u")
      .select(col("cohort"),
        datediff(col("day"), col("cohort")).as("day_offset"), col("u"))
      .filter(col("day_offset") < periods)
      .groupBy(col("cohort"), col("day_offset"))
      .agg(count_distinct(col("u")).as("n_users"))
      .select(col("cohort").cast("string").as("cohort"),
        col("day_offset").cast("int").as("day_offset"), col("n_users"))
  }
}
