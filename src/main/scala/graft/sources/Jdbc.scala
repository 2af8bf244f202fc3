package graft.sources

import graft.sinks.Sinks
import org.apache.spark.sql.{DataFrame, SparkSession}

/** JDBC batch source/sink (SURVEY §2.1 S4, §2.2 K2), sharing the one
  * connection config type ([[Sinks.Jdbc]]) with the streaming upsert sink.
  *
  * Mirrors the reference's verification reads and static appends
  * (/root/reference/src/test/scala/com/example/kafka/CustomerSpendingIntegrationTest.scala:340-347,
  * /root/reference/src/main/scala/com/example/kafka/CustomerSpendingAnalysis.scala:122-138)
  * through the built-in `jdbc` format. Offline (no driver jar) these compile
  * and config-check; tests substitute parquet reads per SURVEY §5.
  */
object Jdbc {

  /** Batch scan of a JDBC table (S4). */
  def read(spark: SparkSession, conf: Sinks.Jdbc): DataFrame = {
    val r = spark.read.format("jdbc")
      .option("url", conf.url)
      .option("dbtable", conf.table)
      .option("user", conf.user)
      .option("password", conf.password)
    conf.driver.foreach(d => r.option("driver", d))
    r.load()
  }

  /** Static append (K2) — kept for parity; the idempotent path is
    * [[Sinks.upsert]]. */
  def append(df: DataFrame, conf: Sinks.Jdbc): Unit = {
    val w = df.write.format("jdbc")
      .option("url", conf.url)
      .option("dbtable", conf.table)
      .option("user", conf.user)
      .option("password", conf.password)
      .mode("append")
    conf.driver.foreach(d => w.option("driver", d))
    w.save()
  }
}
