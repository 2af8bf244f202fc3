package graft.plans

import graft.{GraftExtensions, SparkSpec}
import org.apache.spark.sql.catalyst.plans.logical.{Window => LogicalWindow}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** The rule must fire exactly where it is provably value-identical to the
  * window idiom — and nowhere else. */
class TopKRewriteSpec extends SparkSpec {

  private def topk(df: org.apache.spark.sql.DataFrame, k: Int) = {
    val w = Window.partitionBy(col("g"))
      .orderBy(col("score").desc, col("id").asc)
    df.withColumn("rn", row_number().over(w)).filter(col("rn") <= k)
  }

  test("window idiom rewrites to the heap aggregate, values identical") {
    GraftExtensions.register(spark)
    import spark.implicits._
    val rows = (1 to 1000).map(i =>
      ((i % 7).toLong, (i % 13).toDouble, i.toLong))
    val df = rows.toDF("g", "score", "id") // non-nullable by construction
    val q = topk(df, 3)
    val opt = q.queryExecution.optimizedPlan
    // the Window OPERATOR must be gone (Spark's own WindowGroupLimit
    // leftover below the aggregate is fine — it only pre-trims groups)
    assert(opt.collectFirst { case w: LogicalWindow => w }.isEmpty,
      s"rule must remove the window:\n$opt")
    assert(opt.toString.contains("top_k_by_score") ||
      opt.toString.contains("__graft_top"),
      s"expected the heap aggregate:\n$opt")
    val got = q.select("g", "score", "id", "rn")
      .as[(Long, Double, Long, Int)].collect().toSet
    val expected = rows.groupBy(_._1).flatMap { case (g, rs) =>
      rs.map(r => (r._2, r._3)).sortBy(t => (-t._1, t._2)).take(3)
        .zipWithIndex.map { case ((s, i), r) => (g, s, i, r + 1) }
    }.toSet
    assert(got == expected, s"value mismatch:\ngot $got\nexp $expected")
  }

  test("extra child columns block the rewrite (schema would change)") {
    GraftExtensions.register(spark)
    import spark.implicits._
    val df = (1 to 100).map(i =>
      ((i % 5).toLong, i.toDouble, i.toLong, s"extra$i"))
      .toDF("g", "score", "id", "payload")
    val opt = topk(df, 3).queryExecution.optimizedPlan
    assert(opt.collectFirst { case w: LogicalWindow => w }.nonEmpty,
      s"must stay on the window path with extra columns:\n$opt")
  }

  test("nullable score blocks the rewrite (null ranking differs)") {
    GraftExtensions.register(spark)
    import spark.implicits._
    val df = (1 to 100).map(i =>
      ((i % 5).toLong, if (i % 9 == 0) None else Some(i.toDouble), i.toLong))
      .toDF("g", "score", "id") // Option -> nullable score
    val opt = topk(df, 3).queryExecution.optimizedPlan
    assert(opt.collectFirst { case w: LogicalWindow => w }.nonEmpty,
      s"must stay on the window path with nullable score:\n$opt")
  }

  test("ascending score blocks the rewrite (not the heap's tie rule)") {
    GraftExtensions.register(spark)
    import spark.implicits._
    val df = (1 to 100).map(i => ((i % 5).toLong, i.toDouble, i.toLong))
      .toDF("g", "score", "id")
    val w = Window.partitionBy(col("g"))
      .orderBy(col("score").asc, col("id").asc)
    val opt = df.withColumn("rn", row_number().over(w))
      .filter(col("rn") <= 3).queryExecution.optimizedPlan
    assert(opt.collectFirst { case w: LogicalWindow => w }.nonEmpty,
      s"must stay on the window path for ascending score:\n$opt")
  }
}
