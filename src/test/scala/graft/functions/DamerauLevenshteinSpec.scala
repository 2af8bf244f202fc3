package graft.functions

import graft.SparkSpec

/** The oracle row (ext_fuzzy_dl) hash-checks against DuckDB's builtin; this
  * pins the algorithm variant on the canonical hand cases — in particular
  * the one where TRUE Damerau-Levenshtein and the common OSA restriction
  * disagree. */
class DamerauLevenshteinSpec extends SparkSpec {

  private def dl(a: String, b: String): Int =
    DamerauLevenshtein.distance(
      a.codePoints().toArray, b.codePoints().toArray)

  test("hand-known distances, unrestricted-variant pin") {
    assert(dl("", "") == 0)
    assert(dl("", "abc") == 3)
    assert(dl("abc", "") == 3)
    assert(dl("abc", "abc") == 0)
    assert(dl("ab", "ba") == 1)          // one transposition
    assert(dl("kitten", "sitting") == 3) // pure Levenshtein case
    // THE variant discriminator: OSA says 3, true DL says 2
    // (transpose CA -> AC, then insert B)
    assert(dl("CA", "ABC") == 2)
    assert(dl("a cat", "a abct") == 2)   // transposition then later edit
    assert(dl("abcd", "acbd") == 1)
  }

  test("SQL surface: graft_damerau resolves and matches the direct call") {
    graft.GraftExtensions.register(spark)
    val got = spark.sql(
      "SELECT graft_damerau('CA', 'ABC') AS d, graft_damerau('ab', 'ba') AS t")
      .head()
    assert(got.getInt(0) == 2 && got.getInt(1) == 1)
  }

  test("symmetry and triangle sanity on unicode code points") {
    val pairs = Seq(("héllo", "hello"), ("naïve", "naive"), ("日本語", "日語本"))
    for ((a, b) <- pairs) {
      assert(dl(a, b) == dl(b, a), s"asymmetric on ($a, $b)")
    }
    assert(dl("日本語", "日語本") == 1) // code-point transposition
  }
}
