package graft.operators

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** PII detection and redaction for training-data pipelines: emails, IPv4
  * addresses and phone-like digit runs are counted and replaced with typed
  * placeholder tokens (the standard pre-training scrub).
  *
  * The regexes use only constructs with identical semantics in Java's
  * engine and RE2-style engines (character classes, bounded repetition,
  * `\b`), so redaction and counts are engine-portable and oracle-checked
  * against DuckDB. Scan-parallel expression work — no shuffle, full parquet
  * read bandwidth at any scale.
  */
object Pii {

  /** Email addresses (pragmatic form). */
  val emailRe = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"

  /** IPv4 dotted quads, octet-range checked. */
  val ipv4Re =
    "\\b(25[0-5]|2[0-4][0-9]|1[0-9][0-9]|[1-9]?[0-9])(\\.(25[0-5]|2[0-4][0-9]|1[0-9][0-9]|[1-9]?[0-9])){3}\\b"

  /** Phone-like runs: 9+ chars of digits/space/()/- starting with an
    * optional + and a digit, ending in a digit. Applied AFTER emails and
    * IPs are redacted, so their digit runs can't double-match. */
  val phoneRe = "\\+?[0-9][0-9() -]{7,}[0-9]"

  def emailCount(text: Column): Column = regexp_count(text, lit(emailRe))
  def ipv4Count(text: Column): Column = regexp_count(text, lit(ipv4Re))
  def phoneCount(text: Column): Column =
    regexp_count(redactIpv4(redactEmails(text)), lit(phoneRe))

  def redactEmails(text: Column): Column = regexp_replace(text, emailRe, "<EMAIL>")
  def redactIpv4(text: Column): Column = regexp_replace(text, ipv4Re, "<IP>")
  private def redactPhones(text: Column): Column = regexp_replace(text, phoneRe, "<PHONE>")

  /** Full scrub: email -> IP -> phone (order matters — see [[phoneRe]]). */
  def redact(text: Column): Column =
    redactPhones(redactIpv4(redactEmails(text)))

  /** k-anonymity audit over a set of quasi-identifier columns: the size of
    * every QI combination, flagged where fewer than `k` records share it —
    * the re-identification risk screen run before a table feeds a training
    * corpus. One group-by on the QI tuple; the at-risk flag is a pure
    * projection. At 100 TB the QI group count (not the row count) bounds
    * the result — pick QIs with sane cardinality or pre-generalize
    * (truncate zip codes, bucket ages) upstream. */
  def kAnonymity(df: org.apache.spark.sql.DataFrame,
      quasiIds: Seq[String], k: Int): org.apache.spark.sql.DataFrame = {
    require(k >= 2, s"k must be >= 2, got $k")
    df.groupBy(quasiIds.map(col): _*)
      .agg(count(lit(1)).as("group_size"))
      .withColumn("at_risk", col("group_size") < k)
  }

  /** l-diversity audit — the attack k-anonymity misses: a group can be
    * large yet leak because every member shares ONE sensitive value
    * (homogeneity attack). A quasi-identifier group is l-diverse when it
    * carries at least `l` DISTINCT sensitive values; groups below are
    * flagged. One grouped distinct aggregate: the shuffle carries
    * (QI, sensitive) pairs — bounded by the QI x sensitive cross
    * cardinality, never the row count. */
  def lDiversity(df: org.apache.spark.sql.DataFrame,
      quasiIds: Seq[String], sensitive: org.apache.spark.sql.Column,
      l: Int): org.apache.spark.sql.DataFrame = {
    require(l >= 2, s"l must be >= 2, got $l")
    df.groupBy(quasiIds.map(col): _*)
      .agg(count(lit(1)).as("group_size"),
        countDistinct(sensitive).as("distinct_sensitive"))
      .withColumn("at_risk", col("distinct_sensitive") < l)
  }
}
