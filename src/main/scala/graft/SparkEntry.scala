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
      ev.filter(col("event_type") === "purchase").select(col("event_id"))
        .except(ev.filter(col("value") >= 100.0).select(col("event_id")))
    }),

    // ---- sources (SURVEY §2.1) -----------------------------------------
    "s5_memory_relation" -> ((s, dir) => {
      // S5: in-memory local relation (Seq -> DataFrame).
      import s.implicits._
      Seq(("Credit Card", 1), ("Debit Card", 2), ("PayPal", 3), ("UPI", 4),
        ("Net Banking", 5)).toDF("payment_method", "method_id")
    }),

    "s6_datagen" -> ((s, dir) =>
      // S6: deterministic synthetic generator (rows-only check — hash
      // functions differ across engines, so no SQL oracle).
      graft.sources.DataGen.transactions(s, 1000)
        .select(col("transaction_id"), col("customer_id"), col("merchant_id"),
          col("amount"), col("payment_method"), col("status"))),

    // ---- projections / casts (SURVEY §2.3) -----------------------------
    "p1_cast_binary_string" -> ((s, dir) =>
      // P1: the Kafka wire cast, binary -> string, round-tripped.
      Tables.events(s, dir)
        .select(col("event_id"),
          col("props").cast("binary").cast("string").as("props_str"))),

    "p4_project_alias" -> ((s, dir) =>
      Tables.events(s, dir)
        .filter(col("event_type") === "purchase")
        .select(col("event_id").as("id"), col("value").as("amount"))),

    "p5_withcolumn" -> ((s, dir) =>
      Tables.events(s, dir)
        .withColumn("value_cents", (money(col("value")) * 100).cast("long"))
        .select(col("event_id"), col("value_cents"))),

    "p6_drop_column" -> ((s, dir) =>
      Tables.events(s, dir).drop("props", "ts")),

    "p7_struct_field_access" -> ((s, dir) =>
      // P7: build a struct column, read fields back via dotted access.
      Tables.events(s, dir)
        .select(col("event_id"), struct(col("user_id"), col("value")).as("s"))
        .select(col("event_id"), col("s.user_id").as("uid"), col("s.value").as("v"))),

    // ---- time ops (SURVEY §2.7) ----------------------------------------
    "t4_to_timestamp_parse" -> ((s, dir) =>
      // T4: format -> parse round trip with an explicit pattern.
      Tables.events(s, dir)
        .select(col("event_id"),
          to_timestamp(date_format(col("ts"), "yyyy-MM-dd HH:mm:ss"),
            "yyyy-MM-dd HH:mm:ss").cast("long").as("epoch_s"))),

    "t5_utc_normalize" -> ((s, dir) =>
      // T5: to_utc_timestamp no-op under a UTC session (parity with the
      // reference's redundant normalization).
      Tables.events(s, dir)
        .select(col("event_id"),
          to_utc_timestamp(col("ts"), "UTC").cast("long").as("utc_epoch"))),

    "t6_to_date_trunc" -> ((s, dir) =>
      Tables.events(s, dir)
        .groupBy(to_date(col("ts")).cast("string").as("day"))
        .agg(count(lit(1)).as("n"))),

    // ---- more dedup (SURVEY §2.6) --------------------------------------
    "d1_dedup_union_self" -> ((s, dir) => {
      // D1 batch analog: duplicate every row, dedup by id.
      val ev = Tables.events(s, dir)
      ev.union(ev).dropDuplicates("event_id")
        .select(col("event_id"), col("user_id"), col("value"))
    }),

    "d3_rollup_dedup_noop" -> ((s, dir) =>
      // D3: dedup on the rollup's own group keys (a no-op, kept for parity).
      Spend.dailySpend(Tables.events(s, dir), Spend.eventCols)
        .dropDuplicates("user_id", "transaction_date")),

    // ---- window functions / joins (beyond-reference capability) --------
    "w1_rank_per_user" -> ((s, dir) => {
      import org.apache.spark.sql.expressions.Window
      val w = Window.partitionBy(col("user_id"))
        .orderBy(col("value").desc, col("event_id"))
      Tables.events(s, dir)
        .filter(col("event_type") === "purchase")
        .withColumn("rn", row_number().over(w))
        .filter(col("rn") <= 3)
        .select(col("user_id"), col("event_id"), col("value"), col("rn"))
    }),

    "q3_join_revenue" -> ((s, dir) => {
      // TPC-H Q3 shape: fact-fact shuffle join + broadcast dim join.
      val c = Tables.customer(s, dir).filter(col("c_mktsegment") === "BUILDING")
      val o = Tables.orders(s, dir)
        .filter(col("o_orderdate") < lit("1998-01-01").cast("timestamp"))
      Tables.lineitem(s, dir)
        .join(o, col("l_orderkey") === col("o_orderkey"))
        .join(broadcast(c), col("o_custkey") === col("c_custkey"))
        .groupBy(col("l_orderkey"))
        .agg(sum(money(col("l_extendedprice")) * (one - money(col("l_discount"))))
          .cast("double").as("revenue"))
        .orderBy(col("revenue").desc, col("l_orderkey"))
        .limit(10)
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
      """SELECT DISTINCT event_id FROM events WHERE event_type = 'purchase'
        |EXCEPT
        |SELECT DISTINCT event_id FROM events WHERE value >= 100""".stripMargin,

    "s5_memory_relation" ->
      """SELECT * FROM (VALUES ('Credit Card', 1), ('Debit Card', 2),
        |('PayPal', 3), ('UPI', 4), ('Net Banking', 5))
        |AS t(payment_method, method_id)""".stripMargin,

    "p1_cast_binary_string" ->
      "SELECT event_id, decode(CAST(props AS BLOB)) AS props_str FROM events",

    "p4_project_alias" ->
      "SELECT event_id AS id, value AS amount FROM events WHERE event_type = 'purchase'",

    "p5_withcolumn" ->
      "SELECT event_id, CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT) AS value_cents FROM events",

    "p6_drop_column" ->
      "SELECT event_id, user_id, event_type, value FROM events",

    "p7_struct_field_access" ->
      "SELECT event_id, user_id AS uid, value AS v FROM events",

    "t4_to_timestamp_parse" ->
      """SELECT event_id, CAST(epoch(strptime(strftime(ts, '%Y-%m-%d %H:%M:%S'),
        |'%Y-%m-%d %H:%M:%S')) AS BIGINT) AS epoch_s FROM events""".stripMargin,

    "t5_utc_normalize" ->
      "SELECT event_id, CAST(floor(epoch(ts)) AS BIGINT) AS utc_epoch FROM events",

    "t6_to_date_trunc" ->
      """SELECT CAST(CAST(ts AS DATE) AS VARCHAR) AS day, count(*) AS n
        |FROM events GROUP BY 1""".stripMargin,

    "d1_dedup_union_self" ->
      """SELECT DISTINCT event_id, user_id, value
        |FROM (SELECT * FROM events UNION ALL SELECT * FROM events) u""".stripMargin,

    "d3_rollup_dedup_noop" ->
      """SELECT user_id, strftime(ts, '%Y-%m-%d') AS transaction_date,
        |  CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS total_spent
        |FROM events GROUP BY user_id, strftime(ts, '%Y-%m-%d')""".stripMargin,

    "w1_rank_per_user" ->
      """SELECT user_id, event_id, value, rn FROM (
        |  SELECT user_id, event_id, value,
        |    row_number() OVER (PARTITION BY user_id ORDER BY value DESC, event_id) AS rn
        |  FROM events WHERE event_type = 'purchase') t
        |WHERE rn <= 3""".stripMargin,

    "q3_join_revenue" ->
      """SELECT l_orderkey,
        |  CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2)) * (CAST(1 AS DECIMAL(3,2)) - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS revenue
        |FROM lineitem
        |JOIN orders ON l_orderkey = o_orderkey
        |JOIN customer ON o_custkey = c_custkey
        |WHERE c_mktsegment = 'BUILDING' AND o_orderdate < TIMESTAMP '1998-01-01'
        |GROUP BY l_orderkey
        |ORDER BY revenue DESC, l_orderkey
        |LIMIT 10""".stripMargin
  )
}
