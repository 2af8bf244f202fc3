package graft.plans

import graft.SparkSpec
import graft.operators.AsOf
import org.apache.spark.sql.functions._

/** The native sort-merge as-of operator: physical node planned, exact
  * parity with the composed union-window form, and the merge's edge
  * cases (exact-ts match, key-boundary candidate isolation, null pad). */
class AsOfNativeSpec extends SparkSpec {
  import spark.implicits._

  private def lhs = Seq(
    (1L, 100L, "p1"), (1L, 200L, "p2"), (1L, 50L, "p0"),
    (2L, 100L, "p3"), // key 2 has NO right rows: must null-pad, and key
    (3L, 10L, "p4") //   1's candidate must not leak into key 2 or 3
  ).toDF("k", "ts", "tag").select($"k", timestamp_micros($"ts").as("ts"), $"tag")

  private def rhs = Seq(
    (1L, 100L, "c_at_100"), // exact-ts: must match p1
    (1L, 60L, "c_at_60"),
    (3L, 20L, "c_after") // only right row for key 3 is AFTER the left ts
  ).toDF("k", "ts", "c").select($"k", timestamp_micros($"ts").as("ts"), $"c")

  test("native as-of: exact-ts match, null pad, no cross-key leak") {
    val out = AsOf.joinAsOfNative(lhs, rhs, Seq("k"), "ts", "ts")
      .select($"tag", $"right_c")
      .as[(String, Option[String])].collect().toMap
    assert(out == Map(
      "p0" -> None, // ts 50 precedes every key-1 right row
      "p1" -> Some("c_at_100"), // equal ts matches
      "p2" -> Some("c_at_100"), // latest <= 200 is still 100
      "p3" -> None, // key 2: no right rows at all
      "p4" -> None // key 3: the only right row is in the future
    ), s"got $out")
  }

  test("AsOfJoinExec is the planned operator, over exactly two exchanges") {
    // string pin (an AQE wrapper's collect() doesn't traverse its inner
    // plan, but its toString prints the whole tree — same idiom as
    // PlanSpec's join pins)
    val p = AsOf.joinAsOfNative(lhs, rhs, Seq("k"), "ts", "ts")
      .queryExecution.executedPlan.toString
    assert(p.contains("AsOfJoin"), s"native node not planned:\n$p")
    assert(!p.contains("Window") && !p.contains("Union"),
      s"composed-form machinery leaked into the native plan:\n$p")
    val exchanges = p.linesIterator.count(_.contains("Exchange hashpartitioning"))
    assert(exchanges == 2, s"expected one exchange per side, got $exchanges:\n$p")
  }

  test("parity with the composed form on the real events table") {
    val ev = spark.read.parquet("/root/testdata/sf0.01/events.parquet")
    val l = ev.filter($"event_type" === "purchase")
    val r = ev.filter($"event_type" === "click")
    val native = AsOf.joinAsOfNative(l, r, Seq("user_id"), "ts", "ts",
      rightCols = Seq("event_id"), rightPrefix = "click_")
      .select($"event_id", $"click_event_id", $"click_ts")
    val composed = AsOf.joinAsOf(l, r, Seq("user_id"), "ts", "ts",
      rightCols = Seq("event_id"), rightPrefix = "click_")
      .select($"event_id", $"click_event_id", $"click_ts")
    assert(native.exceptAll(composed).isEmpty && composed.exceptAll(native).isEmpty,
      "native and composed as-of disagree")
    assert(native.count() == l.count(), "LEFT semantics lost rows")
  }

  test("null timestamps: null left null-pads, null right is never a candidate") {
    // long-backed ts so nulls survive the projection (timestamp_micros(null))
    val l = Seq((1L, Some(100L), "ok"), (1L, None, "null_ts"))
      .toDF("k", "ts", "tag")
    val r = Seq((1L, Some(90L), "real"), (1L, None, "null_rts"))
      .toDF("k", "ts", "c")
    val out = AsOf.joinAsOfNative(l, r, Seq("k"), "ts", "ts")
      .select($"tag", $"right_c")
      .as[(String, Option[String])].collect().toMap
    // a null left ts matches NOTHING (it must not unbox to epoch 0 and
    // match); a null right ts is NEVER the candidate for a real left ts
    assert(out == Map("ok" -> Some("real"), "null_ts" -> None), s"got $out")
  }

  test("non-long-backed ts columns are rejected at plan time, by name") {
    val l = Seq((1L, 5, "a")).toDF("k", "ts", "tag") // IntegerType ts
    val r = Seq((1L, 4, "b")).toDF("k", "ts", "c")
    val e = intercept[RuntimeException] {
      AsOf.joinAsOfNative(l, r, Seq("k"), "ts", "ts")
    }
    assert(e.getMessage.contains("ts") && e.getMessage.contains("IntegerType"),
      s"expected a named plan-time type error, got: ${e.getMessage}")
  }
}
