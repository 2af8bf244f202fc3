package graft.plans

import graft.SparkSpec
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Stats-driven hot-key running-window rewrite: fires on the proven
  * shape (avg-hot and histogram-hot), stays value-identical (nulls
  * included), and leaves every non-matching shape alone. */
class AutoChunkWindowSpec extends SparkSpec {
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

  private def freshTable(t: String)(writer: => Unit): Unit = {
    spark.sql(s"DROP TABLE IF EXISTS $t")
    val loc = new java.io.File(
      spark.conf.get("spark.sql.warehouse.dir").stripPrefix("file:"), t)
    def rm(f: java.io.File): Unit = {
      if (f.isDirectory) f.listFiles().foreach(rm)
      f.delete(); ()
    }
    if (loc.exists()) rm(loc)
    writer
  }

  private def runSum(t: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    spark.table(t).withColumn("run", sum(col("v")).over(
      Window.partitionBy(col("k")).orderBy(col("o"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
  }

  private def chunked(df: DataFrame): Boolean =
    df.queryExecution.optimizedPlan.toString.contains("__graft_chunk")

  private lazy val avgHotTable: String = {
    val t = "graft_autochunk_avg"
    freshTable(t) {
      // 2 keys x 10k rows (avg 5,000/key), every 7th value NULL — the
      // rewrite must replay the window's null discipline end to end
      spark.range(10000L).select(
          pmod(col("id"), lit(2L)).as("k"), col("id").as("o"),
          when(col("id") % 7 === 0, lit(null).cast("long"))
            .otherwise(pmod(xxhash64(col("id")), lit(100L))).as("v"))
        .write.saveAsTable(t)
      spark.sql(s"ANALYZE TABLE $t COMPUTE STATISTICS FOR COLUMNS k, o")
    }
    t
  }

  test("avg-hot path: fires, plan carries the chunk join, values identical") {
    withConfs(
      "spark.sql.cbo.enabled" -> "true",
      "spark.graft.autoChunk.minRows" -> "1000",
      "spark.graft.autoChunk.perKeyRows" -> "1000",
      "spark.graft.autoChunk.chunks" -> "8") {
      val df = runSum(avgHotTable)
      assert(chunked(df), s"rewrite must fire:\n${df.queryExecution.optimizedPlan}")
      var want: Set[org.apache.spark.sql.Row] = null
      withConfs("spark.graft.autoChunk.enabled" -> "false") {
        val plain = runSum(avgHotTable)
        assert(!chunked(plain), "disable conf must work")
        want = plain.collect().toSet
      }
      assert(df.collect().toSet == want, "rewrite changed the answer")
    }
  }

  test("histogram path: a 30% heavy hitter fires without the avg signal") {
    val t = "graft_autochunk_hist"
    freshTable(t) {
      withConfs("spark.sql.statistics.histogram.enabled" -> "true") {
        // key 0 holds 30% of 10k rows; 7k other keys keep the average tiny
        spark.range(10000L).select(
            when(pmod(col("id"), lit(10L)) < 3, lit(0L))
              .otherwise(col("id")).as("k"),
            col("id").as("o"),
            pmod(xxhash64(col("id")), lit(100L)).as("v"))
          .write.saveAsTable(t)
        spark.sql(s"ANALYZE TABLE $t COMPUTE STATISTICS FOR COLUMNS k, o")
      }
    }
    withConfs(
      "spark.sql.cbo.enabled" -> "true",
      "spark.graft.autoChunk.minRows" -> "1000",
      "spark.graft.autoChunk.perKeyRows" -> "1000000", // avg signal OFF
      "spark.graft.autoChunk.hotShare" -> "0.2") {
      val df = runSum(t)
      assert(chunked(df),
        s"histogram heavy hitter must fire:\n${df.queryExecution.optimizedPlan}")
      var want: Set[org.apache.spark.sql.Row] = null
      withConfs("spark.graft.autoChunk.enabled" -> "false") {
        want = runSum(t).collect().toSet
      }
      assert(df.collect().toSet == want, "rewrite changed the answer")
    }
  }

  test("RANGE default frame and min/max variants fire and stay identical") {
    import org.apache.spark.sql.expressions.Window
    withConfs(
      "spark.sql.cbo.enabled" -> "true",
      "spark.graft.autoChunk.minRows" -> "1000",
      "spark.graft.autoChunk.perKeyRows" -> "1000",
      "spark.graft.autoChunk.chunks" -> "8") {
      // the bare SQL spelling (no ROWS clause) defaults to RANGE
      // UNBOUNDED..CURRENT — peers can't straddle chunks, so it decomposes
      val rangeQ =
        s"""SELECT k, o, sum(v) OVER (PARTITION BY k ORDER BY o) AS run
           |FROM $avgHotTable""".stripMargin
      val rdf = spark.sql(rangeQ)
      assert(chunked(rdf), s"RANGE frame must fire:\n${rdf.queryExecution.optimizedPlan}")
      var rWant: Set[org.apache.spark.sql.Row] = null
      withConfs("spark.graft.autoChunk.enabled" -> "false") {
        rWant = spark.sql(rangeQ).collect().toSet
      }
      assert(rdf.collect().toSet == rWant, "RANGE rewrite changed the answer")
      // min and max (nulls included in the fixture)
      for ((a, fn) <- Seq[(String, org.apache.spark.sql.Column =>
          org.apache.spark.sql.Column)]("min" -> (min(_)), "max" -> (max(_)))) {
        def q = spark.table(avgHotTable).withColumn("run", fn(col("v")).over(
          Window.partitionBy(col("k")).orderBy(col("o"))
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
        assert(chunked(q), s"$a must fire")
        var want: Set[org.apache.spark.sql.Row] = null
        withConfs("spark.graft.autoChunk.enabled" -> "false") {
          want = q.collect().toSet
        }
        assert(q.collect().toSet == want, s"$a rewrite changed the answer")
      }
    }
  }

  test("does NOT fire: no stats, sliding frame, desc order, decimal sum") {
    import org.apache.spark.sql.expressions.Window
    withConfs(
      "spark.sql.cbo.enabled" -> "true",
      "spark.graft.autoChunk.minRows" -> "1000",
      "spark.graft.autoChunk.perKeyRows" -> "1000") {
      // stats-less view: no fire
      spark.range(10000L).select(pmod(col("id"), lit(2L)).as("k"),
          col("id").as("o"), col("id").as("v"))
        .createOrReplaceTempView("autochunk_nostats")
      assert(!chunked(spark.sql(
        """SELECT k, o, sum(v) OVER (PARTITION BY k ORDER BY o
          |ROWS UNBOUNDED PRECEDING) AS run FROM autochunk_nostats""".stripMargin)))
      // stats present, but non-matching shapes must stay plain
      val t = spark.table(avgHotTable)
      val sliding = t.withColumn("run", sum(col("v")).over(
        Window.partitionBy(col("k")).orderBy(col("o")).rowsBetween(-5, 0)))
      assert(!chunked(sliding), "sliding frame must not fire")
      val desc = t.withColumn("run", sum(col("v")).over(
        Window.partitionBy(col("k")).orderBy(col("o").desc)
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      assert(!chunked(desc), "descending order must not fire")
      val dec = t.withColumn("run",
        sum(col("v").cast("decimal(18,2)")).over(
          Window.partitionBy(col("k")).orderBy(col("o"))
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      assert(!chunked(dec), "decimal sum must not fire")
    }
  }
}
