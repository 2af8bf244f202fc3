package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Hand-computed tests for the privacy audits (`operators.Pii` group
  * screens); the DuckDB oracle grades the same aggregates over the
  * customer table (`ext_k_anonymity`, `ext_l_diversity`). */
class PrivacySpec extends SparkSpec {
  import spark.implicits._

  // (zip, age) quasi-identifier, diagnosis as the sensitive value. Group
  // A: 5 rows but ONE diagnosis — the homogeneity attack k-anonymity
  // misses. Group B: 2 rows, 2 diagnoses. Group C: 4 rows, 3 diagnoses.
  private val rows = (
    Seq.fill(5)(("94105", 30, "flu")) ++
      Seq(("94110", 40, "flu"), ("94110", 40, "cold")) ++
      Seq(("94120", 50, "flu"), ("94120", 50, "cold"),
        ("94120", 50, "covid"), ("94120", 50, "covid"))
  ).toDF("zip", "age", "dx")

  test("kAnonymity flags small groups only") {
    val got = Pii.kAnonymity(rows, Seq("zip", "age"), k = 4)
      .orderBy("zip")
      .select("zip", "group_size", "at_risk")
      .as[(String, Long, Boolean)].collect().toSeq
    assert(got == Seq(("94105", 5L, false), ("94110", 2L, true),
      ("94120", 4L, false)))
  }

  test("lDiversity catches the homogeneous group k-anonymity passes") {
    val got = Pii.lDiversity(rows, Seq("zip", "age"), col("dx"), l = 2)
      .orderBy("zip")
      .select("zip", "group_size", "distinct_sensitive", "at_risk")
      .as[(String, Long, Long, Boolean)].collect().toSeq
    // 94105 is 5-anonymous yet 1-diverse -> at risk; the tiny 94110 group
    // is 2-diverse -> safe under l (its size is k-anonymity's problem)
    assert(got == Seq(("94105", 5L, 1L, true), ("94110", 2L, 2L, false),
      ("94120", 4L, 3L, false)))
  }
}
