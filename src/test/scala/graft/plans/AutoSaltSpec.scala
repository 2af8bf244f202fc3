package graft.plans

import graft.SparkSpec
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.catalyst.plans.logical.Aggregate

/** Stats-driven automatic salting of count(DISTINCT): fires only when
  * ANALYZE statistics prove few-groups-over-many-rows, rewrites to the
  * exact two-phase salted form, and leaves every other shape alone. */
class AutoSaltSpec extends SparkSpec {
  import spark.implicits._

  private def withConfs(kvs: (String, String)*)(body: => Unit): Unit = {
    val old = kvs.map { case (k, _) => k -> spark.conf.getOption(k) }
    kvs.foreach { case (k, v) => spark.conf.set(k, v) }
    try body
    finally old.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None) => spark.conf.unset(k)
    }
  }

  private def aggs(df: DataFrame): Seq[Aggregate] =
    df.queryExecution.optimizedPlan.collect { case a: Aggregate => a }

  private lazy val table: String = {
    val t = "graft_autosalt_spec"
    // a previous JVM's managed location may survive without its catalog
    // entry (fresh derby metastore per run) — clear both before creating
    spark.sql(s"DROP TABLE IF EXISTS $t")
    val loc = new java.io.File(
      spark.conf.get("spark.sql.warehouse.dir").stripPrefix("file:"), t)
    def rm(f: java.io.File): Unit = {
      if (f.isDirectory) f.listFiles().foreach(rm)
      f.delete(); ()
    }
    if (loc.exists()) rm(loc)
    // 4 event types (low ndv) x 20k rows, values with repeats
    spark.range(20000L)
      .selectExpr("concat('t', id % 4) AS k", "id % 997 AS v", "id AS w")
      .write.mode("overwrite").saveAsTable(t)
    spark.sql(s"ANALYZE TABLE $t COMPUTE STATISTICS FOR COLUMNS k, v")
    t
  }

  test("fires on proven shape: salted two-phase plan, identical results") {
    withConfs(
      "spark.graft.autoSalt.enabled" -> "true", // default OFF (see rule doc)
      "spark.sql.cbo.enabled" -> "true",
      "spark.graft.autoSalt.minRows" -> "1000",
      "spark.graft.autoSalt.buckets" -> "8") {
      val q = s"""SELECT k, count(DISTINCT v) AS d, count(*) AS n,
                 |  sum(w) AS sw, max(v) AS mx
                 |FROM $table GROUP BY k""".stripMargin
      val salted = spark.sql(q)
      val as = aggs(salted)
      assert(as.size == 2, s"expected outer+inner aggregate, got:\n" +
        salted.queryExecution.optimizedPlan)
      val inner = as.last
      assert(inner.groupingExpressions.size == 2 &&
        inner.groupingExpressions.last.toString.contains("pmod"),
        s"inner grouping must carry the salt:\n$inner")
      assert(as.head.groupingExpressions.size == 1, "outer groups by key only")
      val expected = withDisabled(spark.sql(q))
      assert(salted.collect().toSet == expected,
        "salted plan changed the answer")
      // physical sanity: the whole thing still plans and runs
      assert(salted.count() == 4)
    }
  }

  test("global count(DISTINCT) salts too (the no-keys single-reducer case)") {
    withConfs(
      "spark.graft.autoSalt.enabled" -> "true",
      "spark.sql.cbo.enabled" -> "true",
      "spark.graft.autoSalt.minRows" -> "1000") {
      val q = s"SELECT count(DISTINCT v) AS d FROM $table"
      val salted = spark.sql(q)
      assert(aggs(salted).size == 2, "global distinct should re-plan salted")
      assert(salted.collect().toSet == withDisabled(spark.sql(q)))
    }
  }

  test("does NOT fire: stats missing, too few rows, two distincts, decimal sum") {
    withConfs(
      "spark.graft.autoSalt.enabled" -> "true",
      "spark.sql.cbo.enabled" -> "true",
      "spark.graft.autoSalt.minRows" -> "1000") {
      // no ANALYZE on this view -> no ndv for the key -> no rewrite
      spark.range(20000L).selectExpr("id % 4 AS k", "id % 997 AS v")
        .createOrReplaceTempView("autosalt_nostats")
      assert(aggs(spark.sql(
        "SELECT k, count(DISTINCT v) AS d FROM autosalt_nostats GROUP BY k"))
        .size == 1, "must not fire without column stats")
      // two distinct aggregates need conflicting salts -> no salt (Spark's
      // own RewriteDistinctAggregates still expands, so count Aggregates
      // is not the signal here; absence of the pmod salt is)
      assert(!spark.sql(
        s"SELECT k, count(DISTINCT v) AS d, count(DISTINCT w) AS dw FROM $table GROUP BY k")
        .queryExecution.optimizedPlan.toString.contains("pmod"),
        "must not fire with two distinct columns")
      // decimal sum would widen through the outer re-sum -> no rewrite
      assert(aggs(spark.sql(
        s"SELECT k, count(DISTINCT v) AS d, sum(CAST(w AS DECIMAL(18,2))) AS sw FROM $table GROUP BY k"))
        .size == 1, "must not fire with a decimal sum")
      // below the row floor -> no rewrite
      withConfs("spark.graft.autoSalt.minRows" -> "1000000") {
        assert(aggs(spark.sql(
          s"SELECT k, count(DISTINCT v) AS d FROM $table GROUP BY k"))
          .size == 1, "must not fire under minRows")
      }
    }
  }

  test("OFF BY DEFAULT: stats alone never change a plan (round-10 measurement)") {
    withConfs(
      "spark.sql.cbo.enabled" -> "true",
      "spark.graft.autoSalt.minRows" -> "1000") {
      // identical stats-proven shape as the firing test — but no explicit
      // enabled=true, so the plan must stay Spark's native one-distinct form
      assert(!spark.sql(
        s"SELECT k, count(DISTINCT v) AS d FROM $table GROUP BY k")
        .queryExecution.optimizedPlan.toString.contains("pmod"),
        "AutoSalt must be inert unless spark.graft.autoSalt.enabled=true")
    }
  }

  private def withDisabled(build: => DataFrame) = {
    var out: Set[org.apache.spark.sql.Row] = null
    withConfs("spark.graft.autoSalt.enabled" -> "false") {
      out = build.collect().toSet
    }
    out
  }
}
