package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Deterministic synthetic transaction generator.
  *
  * Same field domains as the reference's producer
  * (/root/reference/src/main/scala/com/example/kafka/KafkaProducerApp.scala:29-48):
  * customers 1-1000, merchants 1-500, 5 payment methods, 3 statuses, 2-dp
  * amounts — but seeded and expression-based, so it runs distributed at any
  * scale (spark.range for batch, the rate source for streaming) instead of a
  * single-threaded driver loop at 0.5 events/s.
  */
object DataGen {
  private val paymentMethods =
    Seq("Credit Card", "Debit Card", "PayPal", "UPI", "Net Banking")
  private val statuses = Seq("Success", "Pending", "Failed")

  /** Pseudo-random non-negative long derived from the row id: the first 60
    * bits of md5(seed#salt#id). md5-derived (not xxhash64) so generation is
    * deterministic per (seed, id), fully parallel, AND engine-portable — a
    * SQL oracle reproduces every generated row bit-for-bit
    * (CAST(CAST('0x' || substr(md5(...), 1, 15) AS UBIGINT) AS BIGINT) in
    * DuckDB). 60 bits fit a signed long, so no ANSI overflow and no abs(). */
  private def prand(id: org.apache.spark.sql.Column, seed: Long, salt: String) =
    conv(substring(md5(concat_ws("#", lit(seed), lit(salt), id).cast("binary")), 1, 15),
      16, 10).cast("long")

  /** Columns of one synthetic transaction for a given id column. */
  private def fields(id: org.apache.spark.sql.Column, seed: Long, startEpoch: Long, eventsPerSecond: Double) = {
    val ts = timestamp_seconds(lit(startEpoch) + (id / eventsPerSecond))
    Seq(
      md5(concat_ws("-", lit(seed), id)).as("transaction_id"),
      (prand(id, seed, "cust") % 1000 + 1).cast("string").as("customer_id"),
      (prand(id, seed, "merch") % 500 + 1).cast("int").as("merchant_id"),
      ts.as("timestamp"),
      ((prand(id, seed, "amt") % 99900 + 100) / lit(100.0)).as("amount"),
      // array(lit(...)) rather than typedLit: typedLit needs runtime Scala
      // reflection, which breaks in REPL/console classloaders on JDK 17
      element_at(
        array(paymentMethods.map(lit): _*), (prand(id, seed, "pm") % 5 + 1).cast("int")
      ).as("payment_method"),
      element_at(
        array(statuses.map(lit): _*), (prand(id, seed, "st") % 3 + 1).cast("int")
      ).as("status"))
  }

  /** Batch: `n` deterministic transactions as flat typed columns, ids
    * `startId until startId + n` — a non-zero `startId` continues the same
    * deterministic sequence (event time keeps advancing), which lets a soak
    * generate a multi-million-row stream in driver-sized chunks. */
  def transactions(
      spark: SparkSession,
      n: Long,
      seed: Long = 42L,
      startEpoch: Long = 1704067200L, // 2024-01-01T00:00:00Z
      eventsPerSecond: Double = 10.0,
      startId: Long = 0L): DataFrame =
    spark.range(startId, startId + n)
      .select(fields(col("id"), seed, startEpoch, eventsPerSecond): _*)

  /** Derived refund stream for stream-stream join rows: every Failed
    * transaction produces exactly one refund event carrying the same
    * `transaction_id`, a deterministic 0-2399 s delay after the original
    * event time, and the original amount. The delay is md5-derived like
    * every other field, so a SQL oracle reproduces each refund bit-for-bit
    * — and because the delay range (2,400 s) exceeds a 30-minute join
    * window, a time-range stream-stream join genuinely drops the ~25% of
    * refunds that land outside the window instead of trivially matching
    * everything. */
  def refunds(
      spark: SparkSession,
      n: Long,
      seed: Long = 42L,
      startEpoch: Long = 1704067200L,
      eventsPerSecond: Double = 10.0,
      startId: Long = 0L): DataFrame = {
    val id = col("id")
    val delay = prand(id, seed, "rdelay") % 2400
    spark.range(startId, startId + n)
      .filter(element_at(
        array(statuses.map(lit): _*), (prand(id, seed, "st") % 3 + 1).cast("int"))
        === "Failed")
      .select(
        md5(concat_ws("-", lit(seed), id)).as("transaction_id"),
        timestamp_seconds(lit(startEpoch) + (id / eventsPerSecond) + delay)
          .as("refund_ts"),
        ((prand(id, seed, "amt") % 99900 + 100) / lit(100.0)).as("refund_amount"))
  }

  /** Batch: same rows wire-encoded as a JSON `value` column (Kafka shape). */
  def transactionsJson(
      spark: SparkSession, n: Long, seed: Long = 42L, startId: Long = 0L): DataFrame =
    transactions(spark, n, seed, startId = startId)
      .select(to_json(struct(col("*"))).as("value"))

  /** Batch: `n` synthetic documents with planted near-duplicates, for
    * dedup soaks at sizes the parquet fixtures don't cover. Docs come in
    * groups of `groupSize` sharing `tokensPerDoc - 1` of their tokens; every
    * non-canonical group member has one token mutated (so intra-group
    * shingle Jaccard stays high and MinHash banding finds the pairs, while
    * groups are mutually unrelated). Pure expressions — generates at scan
    * speed on any cluster size. */
  def documents(
      spark: SparkSession,
      n: Long,
      seed: Long = 42L,
      groupSize: Int = 5,
      tokensPerDoc: Int = 30): DataFrame = {
    val base = (col("id") / groupSize).cast("long")
    def tok(j: Int) =
      substring(md5(concat_ws("#", lit(seed), lit("t"), base, lit(j)).cast("binary")), 1, 8)
    val mutated = substring(
      md5(concat_ws("#", lit(seed), lit("m"), col("id")).cast("binary")), 1, 8)
    val toks = (0 until tokensPerDoc).map { j =>
      if (j == tokensPerDoc / 2)
        when(col("id") % groupSize === 0, tok(j)).otherwise(mutated)
      else tok(j)
    }
    spark.range(n).select(col("id").as("doc_id"), concat_ws(" ", toks: _*).as("text"))
  }

  /** Streaming: rate-source-driven generator producing the Kafka wire shape
    * (`value` JSON string). Replaces the reference's Thread.sleep loop. */
  def stream(spark: SparkSession, rowsPerSecond: Long, seed: Long = 42L): DataFrame = {
    val rate = spark.readStream
      .format("rate")
      .option("rowsPerSecond", rowsPerSecond.toString)
      .load()
    rate.select(
      to_json(struct(fields(col("value"), seed, 1704067200L, rowsPerSecond.toDouble): _*))
        .as("value"))
  }
}
