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

  test("salted distinct equals direct COUNT(DISTINCT) on a skewed distribution") {
    // hot key carries many distinct values AND repeated values across
    // partitions — the repeats are what a row-hash salt would over-count
    val rows = (0 until 20000).map { i =>
      (if (i % 10 == 0) s"u${i % 50}" else "hot", (i % 2377).toLong)
    }
    val df = rows.toDF("user_id", "v").repartition(8)
    val direct = df.groupBy($"user_id").agg(count_distinct($"v").as("d"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val salted = Skew.saltedDistinct(df, Seq("user_id"), "v", "d", saltBuckets = 7)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(salted == direct)
  }

  test("salted join equals the plain join on a skewed key distribution") {
    val big = (0 until 20000).map { i =>
      (if (i % 10 == 0) s"u${i % 50}" else "hot", i.toLong)
    }.toDF("user_id", "event_id")
    val dim = ((0 until 50).map(i => (s"u$i", s"seg${i % 5}")) :+ (("hot", "seg9")))
      .toDF("user_id", "segment")
    def norm(df: org.apache.spark.sql.DataFrame) =
      df.select("user_id", "event_id", "segment")
        .as[(String, Long, String)].collect().sorted.toSeq
    assert(norm(Skew.saltedJoin(big, dim, Seq("user_id"), saltBuckets = 8)) ==
      norm(big.join(dim, Seq("user_id"))))
    // left join keeps unmatched big rows exactly once
    val dimMissingHot = (0 until 50).map(i => (s"u$i", s"seg${i % 5}"))
      .toDF("user_id", "segment")
    val leftSalted = Skew.saltedJoin(big, dimMissingHot, Seq("user_id"),
      saltBuckets = 8, joinType = "left")
    val leftPlain = big.join(dimMissingHot, Seq("user_id"), "left")
    assert(leftSalted.count() == leftPlain.count())
    assert(leftSalted.filter($"segment".isNull).count() ==
      leftPlain.filter($"segment".isNull).count())
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
