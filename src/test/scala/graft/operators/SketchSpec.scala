package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Approximate (sketch) aggregates: no cross-engine oracle exists (HLL and
  * KLL/GK sketch layouts are engine-specific), so these are bounded-error
  * specs against the exact answers — the honest check for the sketch tier.
  * At 100 TB these are the single-pass, fixed-memory replacements for
  * count(DISTINCT) and exact percentile's full sort/shuffle.
  */
class SketchSpec extends SparkSpec {
  import spark.implicits._

  private lazy val events =
    graft.sources.Tables.events(spark, "/root/testdata/sf0.01")

  test("approx_count_distinct within its rsd bound of the exact count") {
    val exact = events.select(countDistinct(col("user_id"))).as[Long].head()
    val approx = events.select(approx_count_distinct(col("user_id"), rsd = 0.02))
      .as[Long].head()
    // HLL++ at rsd=0.02: allow 3 standard deviations
    assert(math.abs(approx - exact).toDouble / exact <= 0.06,
      s"approx=$approx exact=$exact")
  }

  test("approx percentile lands within a tight quantile band of the exact one") {
    val exact = events.select(expr("percentile(value, 0.5)")).as[Double].head()
    val approx = events.select(expr("percentile_approx(value, 0.5, 10000)"))
      .as[Double].head()
    // with accuracy=10000 the rank error is <= n/10000 ~ a handful of rows;
    // bound via the exact 49.5/50.5 percentile band around the median
    val (lo, hi) = events
      .select(expr("percentile(value, 0.49)"), expr("percentile(value, 0.51)"))
      .as[(Double, Double)].head()
    assert(approx >= lo && approx <= hi, s"approx=$approx band=[$lo,$hi] exact=$exact")
  }
}
