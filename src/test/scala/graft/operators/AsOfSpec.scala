package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

import java.sql.Timestamp

/** As-of join semantics on handcrafted timelines (the sf-scale attribution
  * query x1_asof_attribution is oracle-checked against DuckDB's native
  * ASOF JOIN). */
class AsOfSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)

  // user 1: quotes at 10:00 and 11:00; user 2: none
  private lazy val quotes = Seq(
    (1L, ts("2024-01-01 10:00:00"), 100.0),
    (1L, ts("2024-01-01 11:00:00"), 110.0))
    .toDF("uid", "qts", "price")

  private lazy val trades = Seq(
    (1L, 1L, ts("2024-01-01 09:59:00")), // before any quote
    (2L, 1L, ts("2024-01-01 10:00:00")), // exactly at first quote
    (3L, 1L, ts("2024-01-01 10:30:00")), // between quotes
    (4L, 1L, ts("2024-01-01 12:00:00")), // after both
    (5L, 2L, ts("2024-01-01 10:30:00"))) // keyless user
    .toDF("trade_id", "uid", "tts")

  private def matchedPrices(df: org.apache.spark.sql.DataFrame): Map[Long, Option[Double]] =
    df.select(col("trade_id"), col("q_price"))
      .collect().map(r => r.getLong(0) -> (if (r.isNullAt(1)) None else Some(r.getDouble(1))))
      .toMap

  test("backward as-of matches latest quote <= trade, equal ts included") {
    val out = AsOf.joinAsOf(trades, quotes, keys = Seq("uid"),
      leftTs = "tts", rightTs = "qts", rightPrefix = "q_")
    assert(out.columns.toSeq ==
      Seq("trade_id", "uid", "tts", "q_qts", "q_price"))
    assert(matchedPrices(out) == Map(
      1L -> None, 2L -> Some(100.0), 3L -> Some(100.0), 4L -> Some(110.0), 5L -> None))
  }

  test("forward as-of matches earliest quote >= trade") {
    val out = AsOf.joinAsOf(trades, quotes, keys = Seq("uid"),
      leftTs = "tts", rightTs = "qts", rightPrefix = "q_", direction = "forward")
    assert(matchedPrices(out) == Map(
      1L -> Some(100.0), 2L -> Some(100.0), 3L -> Some(110.0), 4L -> None, 5L -> None))
  }

  test("tolerance nulls out too-distant matches but keeps the left row") {
    // 10 minutes in microseconds: trade 4 (1h after quote 2) is nulled
    val out = AsOf.joinAsOf(trades, quotes, keys = Seq("uid"),
      leftTs = "tts", rightTs = "qts", rightPrefix = "q_",
      tolerance = Some(lit(10L * 60 * 1000000)))
    assert(out.count() == 5)
    assert(matchedPrices(out) == Map(
      1L -> None, 2L -> Some(100.0), 3L -> None, 4L -> None, 5L -> None))
  }

  test("inner as-of drops unmatched left rows") {
    val out = AsOf.joinAsOf(trades, quotes, keys = Seq("uid"),
      leftTs = "tts", rightTs = "qts", rightPrefix = "q_", inner = true)
    assert(out.select("trade_id").as[Long].collect().toSet == Set(2L, 3L, 4L))
  }

  test("as-of plans one shuffle on the key, no cartesian/range explosion") {
    val out = AsOf.joinAsOf(trades, quotes, keys = Seq("uid"),
      leftTs = "tts", rightTs = "qts", rightPrefix = "q_")
    val plan = out.queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct") && !plan.contains("BroadcastNestedLoopJoin"),
      s"as-of must not plan a quadratic join:\n$plan")
  }

  test("scd2Intervals collapses runs, closes intervals, versions changes") {
    import org.apache.spark.sql.functions.col
    // user A: x x y x (runs x,y,x) ; user B: z (single open interval)
    val ev = Seq(
      ("A", 10L, "x", 1L), ("A", 20L, "x", 2L), ("A", 30L, "y", 3L),
      ("A", 40L, "x", 4L), ("B", 15L, "z", 5L))
      .toDF("u", "t", "attr", "id")
    val got = AsOf.scd2Intervals(ev, "u", "attr", col("t"), col("id"))
      .as[(String, String, Long, Option[Long], Long)].collect().sortBy(r => (r._1, r._5))
    assert(got.toSeq == Seq(
      ("A", "x", 10L, Some(30L), 1L),
      ("A", "y", 30L, Some(40L), 2L),
      ("A", "x", 40L, None, 3L),
      ("B", "z", 15L, None, 1L)))
    // intervals tile: each valid_to equals the next version's valid_from
    // (asserted by the fixture above); determinism under repartition
    val again = AsOf.scd2Intervals(ev.repartition(7), "u", "attr", col("t"), col("id"))
      .as[(String, String, Long, Option[Long], Long)].collect().sortBy(r => (r._1, r._5))
    assert(got.toSeq == again.toSeq)
  }
}
