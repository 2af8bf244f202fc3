package graft

import graft.functions.Exact._
import graft.operators.{Ingest, Spend}
import graft.sources.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Query names are keyed to SURVEY.md §2's operator inventory (p* = projections,
  * a* = aggregations, d* = dedup, t* = time ops, o* and e* = sort/set ops, q* =
  * headline analytics, ext_* = LLM-pipeline extension operators).
  *
  * Oracle notes (hard-won determinism rules, keep for future rounds):
  *  - Never `sum(double)` — order-dependent. Money columns are 2-dp; aggregate
  *    via decimal (graft.functions.Exact) and cast back to double: bit-identical
  *    in Spark and DuckDB.
  *  - Never output or ORDER BY the raw `ts` column: parquet stores ns, Spark
  *    truncates to µs, DuckDB keeps ns. Derived epoch-seconds / date strings
  *    are safe; tie-break orderings by a unique id instead of ts.
  *  - Alias every computed column identically in Spark and SQL.
  */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    queries("q1_lineitem_agg")(spark, "/root/testdata/sf0.001")

  private val one = lit(1).cast(DecimalType(3, 2))

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(

    // ---- headline analytics (bench) ------------------------------------
    "q1_lineitem_agg" -> ((s, dir) => {
      // TPC-H Q1 shape: scan-heavy groupBy/agg; predicate pushed to parquet.
      Tables.lineitem(s, dir)
        .filter(col("l_shipdate") <= lit("1998-09-02").cast("timestamp"))
        .groupBy(col("l_returnflag"), col("l_linestatus"))
        .agg(
          dsum(col("l_quantity")).as("sum_qty"),
          dsum(col("l_extendedprice")).as("sum_base_price"),
          sum(money(col("l_extendedprice")) * (one - money(col("l_discount"))))
            .cast("double").as("sum_disc_price"),
          sum(money(col("l_extendedprice")) * (one - money(col("l_discount")))
            * (one + money(col("l_tax")))).cast("double").as("sum_charge"),
          (sum(money(col("l_quantity"))).cast("double") / count(lit(1))).as("avg_qty"),
          count(lit(1)).as("count_order"))
        .orderBy(col("l_returnflag"), col("l_linestatus"))
    }),

    // ---- aggregations (SURVEY §2.5) ------------------------------------
    "a2_windowed_spend" -> ((s, dir) => {
      // Sliding 10-min/5-min event-time window, summed per user (A2).
      Spend.windowedSpend(Tables.events(s, dir), Spend.eventCols)
        .select(
          col("user_id"),
          col("window_start").cast("long").as("w_start"),
          col("window_end").cast("long").as("w_end"),
          col("total_spent"))
    }),

    "a3_daily_spend" -> ((s, dir) =>
      // Daily rollup: true daily totals per user (A3, §4.3-3 fix).
      Spend.dailySpend(Tables.events(s, dir), Spend.eventCols)),

    "a5_count" -> ((s, dir) =>
      Tables.events(s, dir).agg(count(lit(1)).as("n"))),

    "a6_sql_count" -> ((s, dir) => {
      // The reference's one SQL-text query (spark.sql over a named view).
      Tables.events(s, dir).createOrReplaceTempView("graft_events")
      s.sql("SELECT event_type, count(*) AS n FROM graft_events GROUP BY event_type")
    }),

    // ---- dedup (SURVEY §2.6) -------------------------------------------
    "d2_dedup_batch" -> ((s, dir) =>
      // Deterministic dedup: first event per (user, type) by event_id.
      Spend.dedupeBy(
        Tables.events(s, dir),
        keys = Seq("user_id", "event_type"),
        order = Seq("event_id"))
        .select(col("user_id"), col("event_type"), col("event_id"), col("value"))),

    // ---- projections / json (SURVEY §2.3) ------------------------------
    "p2_from_json_flatten" -> ((s, dir) => {
      // P2+P3+P7: JSON decode -> struct -> flatten.
      Tables.events(s, dir)
        .select(col("event_id"), from_json(col("props"), Schemas.eventProps).alias("data"))
        .select(col("event_id"), col("data.k").as("k"))
    }),

    // ---- sort / set ops (SURVEY §2.8) ----------------------------------
    "o1_sort_topk" -> ((s, dir) =>
      Tables.events(s, dir)
        .select(col("event_id"), col("user_id"), col("value"))
        .orderBy(col("value").desc, col("event_id"))
        .limit(100)),

    "e1_except" -> ((s, dir) => {
      val ev = Tables.events(s, dir)
      ev.filter(col("event_type") === "purchase").select(col("user_id"))
        .except(ev.filter(col("event_type") === "error").select(col("user_id")))
    })
  )

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] = Map(
    "q1_lineitem_agg" ->
      """SELECT l_returnflag, l_linestatus,
        |  CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
        |  CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_base_price,
        |  CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2)) * (CAST(1 AS DECIMAL(3,2)) - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS sum_disc_price,
        |  CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2)) * (CAST(1 AS DECIMAL(3,2)) - CAST(l_discount AS DECIMAL(18,2))) * (CAST(1 AS DECIMAL(3,2)) + CAST(l_tax AS DECIMAL(18,2)))) AS DOUBLE) AS sum_charge,
        |  CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) / count(*) AS avg_qty,
        |  count(*) AS count_order
        |FROM lineitem
        |WHERE l_shipdate <= TIMESTAMP '1998-09-02'
        |GROUP BY l_returnflag, l_linestatus
        |ORDER BY l_returnflag, l_linestatus""".stripMargin,

    "a2_windowed_spend" ->
      """SELECT user_id, w_start, w_start + 600 AS w_end,
        |  CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS total_spent
        |FROM (
        |  SELECT user_id, value,
        |    CAST(floor(epoch(ts)/300)*300 AS BIGINT) - s.off AS w_start
        |  FROM events, (SELECT unnest([0,300]) AS off) s)
        |GROUP BY user_id, w_start""".stripMargin,

    "a3_daily_spend" ->
      """SELECT user_id, strftime(ts, '%Y-%m-%d') AS transaction_date,
        |  CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS total_spent
        |FROM events GROUP BY user_id, strftime(ts, '%Y-%m-%d')""".stripMargin,

    "a5_count" -> "SELECT count(*) AS n FROM events",

    "a6_sql_count" ->
      "SELECT event_type, count(*) AS n FROM events GROUP BY event_type",

    "d2_dedup_batch" ->
      """SELECT user_id, event_type, event_id, value FROM (
        |  SELECT user_id, event_type, event_id, value,
        |    row_number() OVER (PARTITION BY user_id, event_type ORDER BY event_id) AS rn
        |  FROM events) t WHERE rn = 1""".stripMargin,

    "p2_from_json_flatten" ->
      "SELECT event_id, CAST(json_extract_string(props, '$.k') AS INTEGER) AS k FROM events",

    "o1_sort_topk" ->
      "SELECT event_id, user_id, value FROM events ORDER BY value DESC, event_id LIMIT 100",

    "e1_except" ->
      """SELECT DISTINCT user_id FROM events WHERE event_type = 'purchase'
        |EXCEPT
        |SELECT DISTINCT user_id FROM events WHERE event_type = 'error'""".stripMargin
  )
}
