package graft

import org.scalatest.funsuite.AnyFunSuite

/** Physical-plan regression guards: the properties that make these queries
  * scale (pushdown, pruning, broadcast, partial aggregation) must stay
  * visible in the plan — a silent regression here costs orders of magnitude
  * at 100 TB even while correctness stays green. */
class PlanSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"
  private def plan(name: String): String = {
    val df = SparkEntry.queries(name)(spark, dir)
    // formatted mode prints untruncated PushedFilters/ReadSchema
    df.queryExecution.explainString(
      org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
  }

  test("q1: filter pushed to parquet scan, columns pruned, partial agg") {
    val p = plan("q1_lineitem_agg")
    assert(p.contains("PushedFilters: [IsNotNull(l_shipdate), LessThanOrEqual(l_shipdate"))
    assert(!p.contains("l_orderkey"), "scan reads columns the query never uses")
    assert(p.contains("partial_sum"))
  }

  test("q3: dimension joins broadcast, top-k via TakeOrderedAndProject") {
    val p = plan("q3_join_revenue")
    assert(p.contains("BroadcastHashJoin"))
    assert(p.contains("TakeOrderedAndProject"))
    assert(!p.contains("SortMergeJoin"), "fact-side shuffle join not expected at this scale")
  }

  test("q6: both range predicates reach the scan") {
    val p = plan("q6_filter_sum")
    assert(p.contains("GreaterThanOrEqual(l_shipdate") && p.contains("LessThan(l_shipdate"))
    assert(p.contains("GreaterThanOrEqual(l_discount,0.05)"))
  }

  test("a2: windowed aggregation is partial+final around one exchange") {
    val p = plan("a2_windowed_spend")
    assert(p.contains("partial_sum"))
    assert("Exchange hashpartitioning".r.findAllIn(p).size <= 2) // executed+spark plan copies
  }

  test("ext_knn_brute: scoring runs through the codegen DotProduct") {
    val p = plan("ext_knn_brute")
    assert(p.contains("DotProduct") || p.contains("dotproduct"))
    assert(p.contains("BroadcastNestedLoopJoin"))
  }
}
