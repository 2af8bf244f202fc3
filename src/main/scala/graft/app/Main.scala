package graft.app

import graft.GraftSession
import graft.sinks.Sinks
import graft.streaming.SpendingPipeline
import graft.streaming.SpendingPipeline.{Config, Sink, Source}
import org.apache.spark.sql.SparkSession

/** Application entry point: config -> source -> pipeline -> sink ->
  * awaitAnyTermination — the engine's equivalent of the reference's
  * CustomerSpendingAnalysis.main
  * (/root/reference/src/main/scala/com/example/kafka/CustomerSpendingAnalysis.scala:186-220),
  * with sources/sinks selected by arguments instead of hard-coding Kafka and
  * Postgres.
  *
  * Usage:
  *   graft.app.Main kafka <bootstrap> <topic> jdbc <url> <table> <user> <pass>
  *   graft.app.Main synthetic <rowsPerSecond> console
  *   graft.app.Main files <path> parquet <outPath>
  */
object Main {
  def main(args: Array[String]): Unit = {
    val spark: SparkSession = GraftSession.configure(
      SparkSession.builder().appName("graft-spending")).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val (source, rest) = args.toList match {
      case "kafka" :: bootstrap :: topic :: tail =>
        (Source.Kafka(bootstrap, topic, maxOffsetsPerTrigger = Some(100000L)), tail)
      case "synthetic" :: rps :: tail => (Source.Synthetic(rps.toLong), tail)
      case "files" :: path :: tail => (Source.JsonFiles(path), tail)
      case other => sys.error(s"unknown source spec: $other")
    }
    val sink = rest match {
      case "jdbc" :: url :: table :: user :: pass :: Nil =>
        Sink.JdbcUpsert(Sinks.Jdbc(url, table, user, pass),
          keyCols = Seq("customer_id", "transaction_date"))
      case "parquet" :: path :: Nil => Sink.Parquet(path)
      case "console" :: Nil => Sink.Console()
      case Nil => Sink.Console()
      case other => sys.error(s"unknown sink spec: $other")
    }

    SpendingPipeline.run(spark, source, sink, Config())
    spark.streams.awaitAnyTermination()
  }
}
