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
      try { fn(spark, sfDir).write.mode("overwrite").format("noop").save() }
      catch { case _: Throwable => () }
      name -> (System.nanoTime() - t0) / 1e9
    }
    val qs = results.map { case (k, v) => "\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    val total = results.map(_._2).sum

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
      ms.addData(payloads.toIndexedSeq)
      val daily = SpendingPipeline.dailySpend(spark, Source.Raw(ms.toDF()))
      val t0 = System.nanoTime()
      val q = SpendingPipeline.start(daily, Sink.Memory("bench_stream"), Config(), "bench_stream_q")
      q.processAllAvailable(); q.stop()
      nEvents / ((System.nanoTime() - t0) / 1e9)
    } catch { case _: Throwable => -1.0 }

    println(s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"stream_events_per_sec":${eps.toLong},"sf":"$sfDir"}""")
    spark.stop()
  }
}
