package graft.operators

import graft.SparkSpec

/** Behavioral tests for the Gopher-style structural rule filter
  * (`TextAnalysis.gopherRules`); the DuckDB oracle grades the same
  * expressions over the full documents table. */
class GopherRulesSpec extends SparkSpec {
  import spark.implicits._

  private def rules(rows: (Long, String)*) =
    TextAnalysis.gopherRules(rows.toDF("doc_id", "text"), minWords = 3)

  test("clean prose passes every rule") {
    val out = rules((1L, "The quick brown fox jumps over the lazy sleeping dog"))
      .select("n_words", "gopher_keep").as[(Int, Boolean)].collect().head
    assert(out == ((10, true)))
  }

  test("word-count and mean-word-length bounds reject") {
    val out = rules(
      (1L, "too short"),                       // 2 words < minWords 3
      (2L, "ab cd ef gh"),                     // mean len 2 < 3
      (3L, "supercalifragilistic expialidocious incomprehensibilities"))
      .orderBy("doc_id").select("gopher_keep").as[Boolean].collect().toSeq
    assert(out == Seq(false, false, false))    // doc 3: mean len > 10
  }

  test("symbol ratio counts # and ... literally") {
    val out = rules((1L, "### heading with many hashes here ..."))
      .select("symbol_ratio", "gopher_keep").as[(Double, Boolean)].collect().head
    // 3 hashes + 1 ellipsis over 7 words
    assert(math.abs(out._1 - 4.0 / 7.0) < 1e-12 && !out._2)
  }

  test("bullet-heavy and ellipsis-heavy layouts reject") {
    val bullets = (1 to 10).map(i => s"- item number $i").mkString("\n")
    val ellipses = (1 to 10).map(i => s"truncated line $i ...").mkString("\n")
    val out = rules((1L, bullets), (2L, ellipses))
      .orderBy("doc_id")
      .select("bullet_line_frac", "ellipsis_line_frac", "gopher_keep")
      .as[(Double, Double, Boolean)].collect().toSeq
    assert(out(0) == ((1.0, 0.0, false)))
    assert(out(1) == ((0.0, 1.0, false)))
  }

  test("alpha-word fraction rejects number soup") {
    val out = rules((1L, "12 34 56 78 90 11 22 33 44 only two words alpha"))
      .select("alpha_word_frac", "gopher_keep").as[(Double, Boolean)].collect().head
    assert(out._1 < 0.8 && !out._2)
  }

  test("empty and blank lines are ignored by the line rules") {
    val text = "real prose line with words here\n\n   \n- one bullet line"
    val out = rules((1L, text))
      .select("bullet_line_frac").as[Double].collect().head
    assert(out == 0.5) // 2 content lines, 1 bullet
  }
}
