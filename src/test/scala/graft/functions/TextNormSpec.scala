package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Unicode normalization: composed/decomposed forms must collapse to one
  * fingerprint key, non-decomposable letters must survive accent stripping,
  * and the ASCII fast paths must be identity (the exact multilingual values
  * are oracle-checked against DuckDB's utf8proc in ext_text_normalize). */
class TextNormSpec extends SparkSpec {
  import spark.implicits._

  private val composed = "café"        // é as U+00E9
  private val decomposed = "café"     // e + combining acute

  private def one(c: org.apache.spark.sql.Column): String =
    Seq(0).toDF("i").select(c.as("v")).as[String].head()

  test("nfc composes decomposed input; composed input is unchanged") {
    assert(one(TextNorm.nfc(lit(decomposed))) == composed)
    assert(one(TextNorm.nfc(lit(composed))) == composed)
    assert(composed != decomposed) // the fixture really is two byte strings
  }

  test("stripAccents drops marks from either form; ß ﬁ ø survive") {
    assert(one(TextNorm.stripAccents(lit(composed))) == "cafe")
    assert(one(TextNorm.stripAccents(lit(decomposed))) == "cafe")
    // non-decomposable letters are NOT accents: they must pass through
    assert(one(TextNorm.stripAccents(lit("straße ﬁre øl"))) ==
      "straße ﬁre øl")
  }

  test("foldKey unifies case, accents and composition into one dedup key") {
    val keys = Seq("CafÉ", decomposed, "CAFÉ", "cafe")
      .zipWithIndex.map { case (s, i) => (i.toLong, s) }
      .toDF("id", "s")
      .select(TextNorm.foldKey(col("s")).as("k")).as[String].collect().toSet
    assert(keys == Set("cafe"))
  }

  test("ascii fast path is identity; null in, null out") {
    val df = Seq((1L, "plain ascii"), (2L, null.asInstanceOf[String]))
      .toDF("id", "s")
      .select(col("id"), TextNorm.nfc(col("s")).as("n"),
        TextNorm.stripAccents(col("s")).as("a"))
      .as[(Long, Option[String], Option[String])].collect()
      .map { case (id, n, a) => id -> ((n, a)) }.toMap
    assert(df(1L) == ((Some("plain ascii"), Some("plain ascii"))))
    assert(df(2L) == ((None, None)))
  }

  test("non-string input is a loud analysis error") {
    val ex = intercept[Exception] {
      Seq(1).toDF("i").select(TextNorm.nfc(col("i"))).collect()
    }
    assert(ex.getMessage.toLowerCase.contains("string") ||
      ex.getMessage.contains("DATATYPE_MISMATCH"))
  }
}
