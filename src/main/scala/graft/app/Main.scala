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
  *   graft.app.Main                    — no args: application.conf fallback
  *
  * With no arguments the reference's fallback applies
  * (CustomerSpendingAnalysis.scala:196-210): read `application.conf` from
  * the classpath (kafka.bootstrap.servers, db.url/user/password) and run
  * Kafka -> daily spend -> JDBC upsert on the reference's fixed topic and
  * table. Args always win.
  */
object Main {

  private[app] val FallbackTopic = "transactions_topic"
  private[app] val FallbackTable = "public.customer_daily_spending"

  /** Resolve (source, sink) from args; with no args, from a parsed config
    * map (the application.conf fallback). Pure — unit-testable without a
    * SparkSession. */
  private[app] def resolve(
      args: Seq[String],
      conf: => Option[Map[String, String]]): (Source, Sink) = {
    if (args.isEmpty) {
      val c = conf.getOrElse(sys.error(
        "no arguments and no application.conf on the classpath"))
      def req(k: String) = c.getOrElse(k, sys.error(s"application.conf missing key: $k"))
      return (
        Source.Kafka(req("kafka.bootstrap.servers"), FallbackTopic,
          maxOffsetsPerTrigger = Some(100000L)),
        Sink.JdbcUpsert(
          Sinks.Jdbc(req("db.url"), FallbackTable, req("db.user"), req("db.password")),
          keyCols = Seq("customer_id", "transaction_date")))
    }
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
    (source, sink)
  }

  def main(args: Array[String]): Unit = {
    val spark: SparkSession = GraftSession.configure(
      SparkSession.builder().appName("graft-spending")).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val (source, sink) = resolve(args.toSeq, AppConfig.fromResource())
    SpendingPipeline.run(spark, source, sink, Config())
    spark.streams.awaitAnyTermination()
  }
}
