package graft

import org.apache.spark.sql.SparkSession

/** Benchmark main: times every SparkEntry query on SPARK_GRAFT_SF_DIR and
  * prints ONE JSON line {"metric":...,"queries":{...}}. A warmup pass runs
  * first so JIT/codegen/page-cache costs don't land on the first query. */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = GraftSession.configure(
      SparkSession.builder().master(s"local[$cpus]"), shufflePartitions = cpus.toInt)
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    // warmup: touch every table + JIT the scan/agg paths
    graft.sources.Tables.all.foreach { t =>
      try {
        val df = if (t == "events") graft.sources.Tables.events(spark, sfDir)
        else graft.sources.Tables(spark, sfDir, t)
        df.count()
      } catch { case _: Throwable => () }
    }
    try SparkEntry.queries("q1_lineitem_agg")(spark, sfDir).count()
    catch { case _: Throwable => () }

    val results = SparkEntry.queries.toSeq.sortBy(_._1).map { case (name, fn) =>
      val t0 = System.nanoTime()
      // noop sink materializes every output column — a count() would let
      // Catalyst prune the very expressions being benchmarked
      val err = try { fn(spark, sfDir).write.mode("overwrite").format("noop").save(); None }
      catch { case t: Throwable => Some(t.toString) }
      (name, (System.nanoTime() - t0) / 1e9, err)
    }
    // a failed query reports -1, never its elapsed time — a broken query
    // must not read as a fast result
    val qs = results.map { case (k, v, err) => "\"" + k + "\":" + (if (err.isDefined) "-1" else v.toString) }
      .mkString("{", ",", "}")
    val errors = results.collect { case (k, _, Some(e)) =>
      "\"" + k + "\":\"" + e.replace("\\", "\\\\").replace("\"", "\\\"")
        .replaceAll("[\\r\\n\\t]", " ").take(300) + "\""
    }.mkString("{", ",", "}")
    val total = results.collect { case (_, v, None) => v }.sum

    // streaming throughput: canonical pipeline (parse -> dedup -> daily
    // totals) over a one-batch synthetic stream. The reference's producer
    // design point is 0.5 events/s (SURVEY.md §6).
    val eps = try {
      import graft.streaming.SpendingPipeline
      import graft.streaming.SpendingPipeline.{Config, Sink, Source}
      import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
      implicit val sqlCtx = spark.sqlContext
      import spark.implicits._
      val nEvents = 200000L
      val ms = MemoryStream[String]
      val payloads = graft.sources.DataGen.transactionsJson(spark, nEvents)
        .collect().map(_.getString(0))
      val daily = SpendingPipeline.dailySpend(spark, Source.Raw(ms.toDF()))
      // warmup micro-batch: pays query start, codegen/JIT and state-store
      // init once, so the timed region measures steady-state throughput
      ms.addData(payloads.take(1000).toIndexedSeq)
      val q = SpendingPipeline.start(daily, Sink.Memory("bench_stream"), Config(), "bench_stream_q")
      q.processAllAvailable()
      // measured batch, added in cpu-count chunks: MemoryStream scans one
      // partition per addData block, so chunking parallelizes the parse
      val rest = payloads.drop(1000)
      rest.grouped(math.max(1, rest.length / cpus.toInt)).foreach(c => ms.addData(c.toIndexedSeq))
      val t0 = System.nanoTime()
      q.processAllAvailable()
      val eps = rest.length / ((System.nanoTime() - t0) / 1e9)
      q.stop()
      eps
    } catch { case _: Throwable => -1.0 }

    println(s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"errors":$errors,"stream_events_per_sec":${eps.toLong},"sf":"$sfDir"}""")
    spark.stop()
  }
}
