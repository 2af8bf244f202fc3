package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Semantic invariants for the bitmap-retention / transition / weighted-
  * shortest-path operators on hand-built adversarial fixtures (the
  * cross-engine grading is the x55/x56/x57 oracles). */
class FunnelAnalyticsSpec extends SparkSpec {
  import spark.implicits._

  test("bitmapRetention: popcount stats match hand-built masks") {
    // A: days 0,1,7 (day-1 dup must OR away); B: 0,14; C starts a day
    // later: 0 only; D: offset 70 beyond the mask width is ignored
    val ev = Seq(
      (1L, "2024-01-01"), (1L, "2024-01-02"), (1L, "2024-01-02"),
      (1L, "2024-01-08"),
      (2L, "2024-01-01"), (2L, "2024-01-15"),
      (3L, "2024-01-02"),
      (4L, "2024-01-01"), (4L, "2024-03-11")
    ).toDF("user_id", "day").select($"user_id", $"day".cast("timestamp").as("ts"))
    val out = Funnel.bitmapRetention(ev, "user_id", "ts")
      .orderBy($"cohort")
      .as[(String, Long, Long, Long, Long, Long)].collect().toList
    assert(out == List(
      // cohort 01-01: A(3 days, d1+d7) + B(2 days, d14) + D(1 day kept, 70 dropped)
      ("2024-01-01", 3L, 6L, 1L, 1L, 1L),
      ("2024-01-02", 1L, 1L, 0L, 0L, 0L)), s"got $out")
  }

  test("transitions: tie-broken order, terminal rows absent, DIV share") {
    // user 1: a->b->b (equal ts on the last two — event_id breaks the tie);
    // user 2: a->c; the c and final b are terminal (no outgoing pair)
    val ev = Seq(
      (10L, 1L, "a", "2024-01-01 00:00:00"),
      (11L, 1L, "b", "2024-01-01 00:01:00"),
      (12L, 1L, "b", "2024-01-01 00:01:00"),
      (20L, 2L, "a", "2024-01-01 00:00:00"),
      (21L, 2L, "c", "2024-01-01 00:05:00")
    ).toDF("event_id", "user_id", "event_type", "s")
      .select($"event_id", $"user_id", $"event_type",
        $"s".cast("timestamp").as("ts"))
    val out = Funnel.transitions(ev, "user_id", "event_type", "ts", "event_id")
      .as[(String, String, Long, Long)].collect().toList
    // a's mass splits 1/1 -> 5000 bp each; b->b is all of b's mass
    assert(out == List(("a", "b", 1L, 5000L), ("a", "c", 1L, 5000L),
      ("b", "b", 1L, 10000L)), s"got $out")
  }

  test("reachTimes: earliest qualifying occurrence, window honored") {
    // user 1 converts signup->view inside the window; user 2's view is
    // BEFORE signup (must not count); user 3's view is past the window
    val ev = Seq(
      (1L, "signup", 0L), (1L, "view", 100L), (1L, "view", 50L),
      (2L, "view", 10L), (2L, "signup", 20L),
      (3L, "signup", 0L), (3L, "view", 4000L)
    ).toDF("user_id", "event_type", "s")
      .select($"user_id", $"event_type", timestamp_seconds($"s").as("ts"))
    val rt = Funnel.reachTimes(ev, "user_id", "event_type", "ts",
        Seq("signup", "view"), windowSec = 1000L)
      .select($"u", $"step", unix_seconds($"reached"))
      .as[(Long, Int, Long)].collect().toSet
    assert(rt == Set((1L, 1, 0L), (2L, 1, 20L), (3L, 1, 0L), (1L, 2, 50L)),
      s"got $rt")
  }

  test("attributionEven: books balance per conversion, remainder to first touch, window bound") {
    // user 1: purchase of 1.00 (100 cents) at t=1000 with three clicks in
    // window -> 34/33/33; one click at t=500 is outside the 300 s lookback
    // and one at t=1001 is after the conversion. user 2: no clicks -> the
    // purchase yields no credit rows.
    val ev = Seq(
      (10L, 1L, "click", 500L, 0.0), (11L, 1L, "click", 800L, 0.0),
      (12L, 1L, "click", 900L, 0.0), (13L, 1L, "click", 950L, 0.0),
      (14L, 1L, "purchase", 1000L, 1.00), (15L, 1L, "click", 1001L, 0.0),
      (16L, 2L, "purchase", 1000L, 5.00)
    ).toDF("event_id", "user_id", "event_type", "epoch", "value")
      .withColumn("ts", col("epoch").cast("timestamp"))
    val credits = Funnel.attributionEven(ev, "user_id", "event_type", "ts",
      "event_id", "value", "purchase", "click", windowSec = 300L)
      .orderBy("conv_id", "touch_rank")
      .collect().map(r => (r.getLong(0), r.getLong(2), r.getInt(3),
        r.getLong(4), r.getLong(5)))
    assert(credits.toSeq == Seq(
      (14L, 11L, 1, 3L, 34L), (14L, 12L, 2, 3L, 33L), (14L, 13L, 3, 3L, 33L)))
    // the invariant the float split cannot give: credits sum EXACTLY
    assert(credits.map(_._5).sum == 100L)
  }

  test("shortestPaths: cheaper multi-hop path beats the direct edge") {
    // seed 0: direct 0->3 costs 10, but 0->1->2->3 costs 3; the cheap
    // path needs 3 relaxation rounds to surface
    val e = Seq((0L, 3L, 10L), (0L, 1L, 1L), (1L, 2L, 1L), (2L, 3L, 1L),
      (3L, 4L, 1L)).toDF("src", "dst", "w")
    val seeds = Seq(0L).toDF("node")
    def dist(rounds: Int) =
      Graph.shortestPaths(e, seeds, rounds).as[(Long, Long)].collect().toMap
    val d1 = dist(1)
    assert(d1(3L) == 10L, s"round 1 must only know the direct edge: $d1")
    val d3 = dist(3)
    assert(d3(3L) == 3L && d3(2L) == 2L, s"got $d3")
    // node 4 via the cheap chain = 4 hops: absent at 3 rounds, 4 at 4
    // rounds is still beaten by 10+1 through the direct edge ONLY if
    // relaxed — both paths exist; min must win
    assert(!d3.contains(4L) || d3(4L) == 11L, s"got $d3")
    assert(dist(4)(4L) == 4L)
  }
}
