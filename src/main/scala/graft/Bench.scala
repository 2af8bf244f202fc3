package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

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
    GraftExtensions.register(spark) // production parity: rules + SQL fns on

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

    // min-of-N timing: one sample per query proved too fragile — a burst of
    // machine contention during one run misgraded a whole round (r2: 72s
    // recorded vs 35s clean). Every query runs twice; anything still >1s
    // after two samples gets a third. The MIN is the headline number (least
    // contaminated by noise); the last sample is emitted alongside so a
    // genuine regression (min == last == slow) is distinguishable from a
    // noisy one (min fast, last slow).
    def runOnce(fn: (SparkSession, String) => DataFrame): (Double, Option[String]) = {
      val t0 = System.nanoTime()
      // noop sink materializes every output column — a count() would let
      // Catalyst prune the very expressions being benchmarked. scoped{}
      // releases the query's lineage-cut checkpoint blocks right after the
      // action (dozens of queries in one session would otherwise
      // accumulate dead blocks); the non-blocking unpersist is noise-level
      // inside the timed region.
      val err = try {
        graft.util.Checkpoints.scoped {
          fn(spark, sfDir).write.mode("overwrite").format("noop").save()
        }
        None
      } catch { case t: Throwable => Some(t.toString) }
      ((System.nanoTime() - t0) / 1e9, err)
    }
    val results = SparkEntry.queries.toSeq.sortBy(_._1).map { case (name, fn) =>
      // every query gets two samples regardless of the first's outcome
      // (a transient first-sample failure deserves the same retry a noisy
      // timing gets); a third when both are clean but slow
      val base = Seq(runOnce(fn), runOnce(fn))
      val samples =
        if (base.forall(_._2.isEmpty) && base.map(_._1).min > 1.0) base :+ runOnce(fn)
        else base
      // error noise gets the same tolerance as timing noise: a query with
      // at least one CLEAN sample succeeded (min/last over clean samples);
      // only a query with zero clean samples reports failed. Errors from
      // queries that ALSO had a clean sample are kept as flaky signals.
      val clean = samples.collect { case (t, None) => t }
      val errs = samples.flatMap(_._2)
      val err = if (clean.nonEmpty) None else errs.headOption
      val flaky = if (clean.nonEmpty) errs.headOption else None
      (name, clean.headOption.map(_ => clean.min).getOrElse(-1.0),
        clean.lastOption.getOrElse(-1.0), err, flaky)
    }
    // a failed query reports -1, never its elapsed time — a broken query
    // must not read as a fast result
    val qs = results.map { case (k, v, _, err, _) =>
      "\"" + k + "\":" + (if (err.isDefined) "-1" else v.toString)
    }.mkString("{", ",", "}")
    val qsLast = results.map { case (k, _, last, err, _) =>
      "\"" + k + "\":" + (if (err.isDefined) "-1" else last.toString)
    }.mkString("{", ",", "}")
    val errors = results.collect { case (k, _, _, Some(e), _) =>
      "\"" + k + "\":\"" + graft.util.Json.escape(e, maxLen = 300) + "\""
    }.mkString("{", ",", "}")
    // intermittent defects (clean sample + error sample) are a real signal
    // — surfaced separately instead of silently discarded
    val flakyErrors = results.collect { case (k, _, _, _, Some(e)) =>
      "\"" + k + "\":\"" + graft.util.Json.escape(e, maxLen = 300) + "\""
    }.mkString("{", ",", "}")
    val total = results.collect { case (_, v, _, None, _) => v }.sum

    // streaming throughput: canonical pipeline (parse -> dedup -> daily
    // totals) over a one-batch synthetic stream. The reference's producer
    // design point is 0.5 events/s (SURVEY.md §6). Best-of-2 like the batch
    // queries — each round measured INDEPENDENTLY, so one round's failure
    // can't discard the other's clean sample, and the payload array is
    // generated once (it's round-invariant).
    val payloads: Array[String] =
      try graft.sources.DataGen.transactionsJson(spark, 200000L)
        .collect().map(_.getString(0))
      catch { case _: Throwable => Array.empty }
    def streamEpsOnce(round: Int): Double = {
      import graft.streaming.SpendingPipeline
      import graft.streaming.SpendingPipeline.{Config, Sink, Source}
      import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
      implicit val sqlCtx = spark.sqlContext
      import spark.implicits._
      val ms = MemoryStream[String]
      val daily = SpendingPipeline.dailySpend(spark, Source.Raw(ms.toDF()))
      // warmup micro-batch: pays query start, codegen/JIT and state-store
      // init once, so the timed region measures steady-state throughput
      ms.addData(payloads.take(1000).toIndexedSeq)
      val q = SpendingPipeline.start(daily, Sink.Memory(s"bench_stream_$round"),
        Config(), s"bench_stream_q_$round")
      try {
        q.processAllAvailable()
        // measured batch, added in cpu-count chunks: MemoryStream scans one
        // partition per addData block, so chunking parallelizes the parse.
        // t0 starts BEFORE the adds — the running query may begin
        // processing as soon as the first chunk lands, so starting the
        // clock after the loop would undercount elapsed time and inflate
        // events/s
        val rest = payloads.drop(1000)
        val t0 = System.nanoTime()
        rest.grouped(math.max(1, rest.length / cpus.toInt)).foreach(c => ms.addData(c.toIndexedSeq))
        q.processAllAvailable()
        rest.length / ((System.nanoTime() - t0) / 1e9)
      } finally q.stop() // a failed round must not leave its query running
    }
    def epsRound(round: Int): Double =
      if (payloads.isEmpty) -1.0
      else try streamEpsOnce(round) catch { case _: Throwable => -1.0 }
    val eps = math.max(epsRound(1), epsRound(2))

    println(s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"queries_last":$qsLast,"errors":$errors,"flaky_errors":$flakyErrors,"stream_events_per_sec":${eps.toLong},"sf":"$sfDir"}""")
    spark.stop()
  }
}
