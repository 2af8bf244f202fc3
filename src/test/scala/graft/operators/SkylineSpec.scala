package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** The oracle row (ext_skyline) proves the frontier against the quadratic
  * NOT-EXISTS scan at sf0.01; this suite pins the dominance corner cases on
  * a hand-built set and the losslessness of the partition-local prune. */
class SkylineSpec extends SparkSpec {

  // (id, cost, size): frontier must be exactly the non-dominated rows
  private val rows = Seq(
    (1L, 10L, 5L),  // frontier: cheapest overall
    (2L, 10L, 3L),  // dominated by 1 (same cost, smaller size)
    (3L, 20L, 8L),  // frontier
    (4L, 20L, 8L),  // duplicate of 3 on both dims -> BOTH survive
    (5L, 25L, 8L),  // dominated by 3 (pricier, same size)
    (6L, 30L, 9L),  // frontier
    (7L, 40L, 9L),  // dominated by 6
    (8L, 50L, 12L), // frontier: biggest
    (9L, 50L, 1L))  // dominated by everything cheaper-or-equal and bigger

  test("frontier keeps exactly the non-dominated rows, both-dim ties survive") {
    import spark.implicits._
    val df = rows.toDF("id", "cost", "size")
    val got = Skyline.frontier2d(df, "cost", "size")
      .select("id").as[Long].collect().sorted
    assert(got.toSeq == Seq(1L, 3L, 4L, 6L, 8L))
  }

  test("partition-local prune is lossless: any partitioning, same frontier") {
    import spark.implicits._
    for (n <- Seq(1, 3, 7)) {
      val df = rows.toDF("id", "cost", "size").repartition(n, col("id"))
      val got = Skyline.frontier2d(df, "cost", "size")
        .select("id").as[Long].collect().sorted
      assert(got.toSeq == Seq(1L, 3L, 4L, 6L, 8L), s"failed at $n partitions")
    }
  }

  test("single row and all-duplicates degenerate sets survive whole") {
    import spark.implicits._
    val one = Seq((1L, 5L, 5L)).toDF("id", "cost", "size")
    assert(Skyline.frontier2d(one, "cost", "size").count() == 1)
    val dup = Seq((1L, 5L, 5L), (2L, 5L, 5L), (3L, 5L, 5L))
      .toDF("id", "cost", "size")
    assert(Skyline.frontier2d(dup, "cost", "size").count() == 3)
  }
}
