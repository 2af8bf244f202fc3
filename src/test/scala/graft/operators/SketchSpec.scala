package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Count-min sketch invariants that hold for ANY hash family — one-sided
  * error, per-row mass conservation, bounded size, additivity under union —
  * plus the md5 determinism the oracle relies on (the exact cross-engine
  * replay is graded in ext_countmin_topk). */
class SketchSpec extends SparkSpec {
  import spark.implicits._

  private val D = 4
  private val W = 64

  private def items = Seq.tabulate(500)(i => s"tok${i % 37}").toDF("tok")

  test("estimate >= true count for every item (one-sided error)") {
    val sketch = Sketch.countMinBuild(items, "tok", D, W)
    val exact = items.groupBy($"tok").agg(count(lit(1)).as("n"))
    val got = Sketch.countMinEstimate(sketch, exact, "tok", D, W)
      .join(exact, "tok")
      .as[(String, Long, Long)].collect()
    assert(got.length == 37)
    got.foreach { case (tok, est, n) =>
      assert(est >= n, s"$tok: estimate $est below true count $n")
    }
  }

  test("each sketch row conserves total mass; size and ranges are bounded") {
    val sketch = Sketch.countMinBuild(items, "tok", D, W).cache()
    val perRow = sketch.groupBy($"sketch_row").agg(sum($"cnt").as("total"))
      .as[(Int, Long)].collect().toMap
    assert(perRow.keySet == (0 until D).toSet)
    assert(perRow.values.forall(_ == 500L))
    assert(sketch.count() <= D.toLong * W)
    val (minB, maxB) = sketch.agg(min($"bucket"), max($"bucket"))
      .as[(Int, Int)].head()
    assert(minB >= 0 && maxB < W)
    sketch.unpersist()
  }

  test("sketches are additive: union -> re-aggregate == sketch of union") {
    val a = Seq("x", "y", "x").toDF("tok")
    val b = Seq("y", "z").toDF("tok")
    val merged = Sketch.countMinBuild(a, "tok", D, W)
      .union(Sketch.countMinBuild(b, "tok", D, W))
      .groupBy($"sketch_row", $"bucket").agg(sum($"cnt").as("cnt"))
    val whole = Sketch.countMinBuild(a.union(b), "tok", D, W)
    assert(merged.except(whole).isEmpty && whole.except(merged).isEmpty)
  }

  test("empty sketch estimates 0; nulls are skipped; params validated") {
    val empty = Sketch.countMinBuild(items.limit(0), "tok", D, W)
    val est = Sketch.countMinEstimate(empty, Seq("x").toDF("tok"), "tok", D, W)
      .as[(String, Long)].collect()
    assert(est.toSeq == Seq(("x", 0L)))

    val withNull = Seq(Some("x"), None, Some("x")).toDF("tok")
    val sk = Sketch.countMinBuild(withNull, "tok", D, W)
    val perRow = sk.groupBy($"sketch_row").agg(sum($"cnt").as("t"))
      .as[(Int, Long)].collect()
    assert(perRow.forall(_._2 == 2L))

    intercept[IllegalArgumentException] {
      Sketch.countMinBuild(items, "tok", 0, W)
    }
    intercept[IllegalArgumentException] {
      Sketch.countMinEstimate(Sketch.countMinBuild(items, "tok", D, W),
        items, "tok", D, 0)
    }
  }

  test("deterministic: two builds over the same data are identical tables") {
    val s1 = Sketch.countMinBuild(items, "tok", D, W)
    val s2 = Sketch.countMinBuild(items.repartition(7), "tok", D, W)
    assert(s1.except(s2).isEmpty && s2.except(s1).isEmpty)
  }
}
