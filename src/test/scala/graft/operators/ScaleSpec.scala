package graft.operators

import graft.SparkSpec
import graft.functions.Exact
import org.apache.spark.sql.functions._

/** Scale-machinery tests: salted aggregation equivalence and bucketed
  * co-located joins (shuffle elimination visible in the physical plan). */
class ScaleSpec extends SparkSpec {
  import spark.implicits._

  test("salted sum equals direct aggregation on a skewed distribution") {
    // 90% of rows hit one key — the shape salting exists for
    val rows = (0 until 20000).map { i =>
      (if (i % 10 == 0) s"u${i % 50}" else "hot", (i % 997) / 100.0)
    }
    val df = rows.toDF("user_id", "value")
    val direct = df.groupBy($"user_id").agg(Exact.dsum($"value").as("total"))
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    val salted = Skew.saltedSum(df, Seq("user_id"), "value", "total")
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    assert(salted == direct)
  }

  test("bucketed tables join without an exchange") {
    // default warehouse dir (./spark-warehouse, gitignored) — the
    // warehouse conf is static and can't move after session start
    val n = 10000
    spark.range(n).select($"id".as("k"), ($"id" % 97).as("v1"))
      .write.mode("overwrite").bucketBy(8, "k").sortBy("k")
      .saveAsTable("graft_bucketed_a")
    spark.range(n).select($"id".as("k"), ($"id" % 89).as("v2"))
      .write.mode("overwrite").bucketBy(8, "k").sortBy("k")
      .saveAsTable("graft_bucketed_b")
    try {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1") // force SMJ path
      val joined = spark.table("graft_bucketed_a")
        .join(spark.table("graft_bucketed_b"), "k")
      val plan = joined.queryExecution.executedPlan.toString
      assert(!plan.contains("Exchange"), s"bucketed join still shuffles:\n$plan")
      assert(joined.count() == n)
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", (64 * 1024 * 1024).toString)
      spark.sql("DROP TABLE IF EXISTS graft_bucketed_a")
      spark.sql("DROP TABLE IF EXISTS graft_bucketed_b")
    }
  }
}
