package graft.operators

import graft.Schemas
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType

/** Payload decoding: raw source rows -> typed transaction rows.
  *
  * Works identically on batch and streaming DataFrames (the plan is the
  * same; only the source differs). Mirrors the reference semantics of
  * cast -> from_json -> flatten
  * (/root/reference/src/main/scala/com/example/kafka/CustomerSpendingAnalysis.scala:39-42)
  * as one collapsed projection that Catalyst fuses into a single stage; the
  * unaccessed JSON fields are pruned by OptimizeJsonExprs.
  */
object Ingest {

  /** Decode a `value: binary|string` column (Kafka wire shape) into flat
    * transaction columns. Malformed JSON yields null fields (PERMISSIVE),
    * matching `from_json` defaults in the reference.
    */
  def parseTransactions(raw: DataFrame, schema: StructType = Schemas.transaction): DataFrame =
    raw
      .select(from_json(col("value").cast("string"), schema).alias("data"))
      .select("data.*")

  /** Same, keeping only the 7 canonical columns. */
  def parseCanonical(raw: DataFrame): DataFrame =
    parseTransactions(raw).select(Schemas.canonicalColumns.map(col): _*)

  /** Drop rows whose required fields failed to parse. */
  def wellFormed(parsed: DataFrame): DataFrame =
    parsed.filter(col("transaction_id").isNotNull && col("timestamp").isNotNull)

  /** Typed view: compile-time field checks where downstream logic is
    * hand-written Scala (Dataset[T] per SURVEY.md §1.3). */
  def typedTransactions(raw: DataFrame): org.apache.spark.sql.Dataset[Schemas.Transaction] = {
    val spark = raw.sparkSession
    import spark.implicits._
    wellFormed(parseTransactions(raw)).as[Schemas.Transaction]
  }
}
