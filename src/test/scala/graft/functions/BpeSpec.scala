package graft.functions

import graft.SparkSpec
import graft.operators.Dedup
import org.apache.spark.sql.functions._

/** The greedy subword tokenizer: hand-checked counts, agreement between the
  * Catalyst expression and the driver reference on arbitrary text, and the
  * generated merge table's shape (the exact per-doc counts on real data are
  * oracle-checked in ext_bpe_tokens). */
class BpeSpec extends SparkSpec {
  import spark.implicits._

  test("merge table is the advertised generated set") {
    val t = Bpe.mergeTable
    assert(t.length == 144 + 216)
    assert(t.count(_.length == 2) == 144 && t.count(_.length == 3) == 216)
    assert(t.distinct.length == t.length)
    // a 3-gram over the top-6 letters and a 2-gram over the top-12
    assert(Bpe.merges3.contains("ion") && Bpe.merges2.contains("th"))
    // nothing outside the letter lists, no spaces ever
    assert(t.forall(_.forall("etaoinshrdlu".contains(_))))
  }

  test("greedy longest-match: hand-checked counts") {
    // "the" -> "th"+"e" ('h' is not a top-6 letter, so no "the" 3-gram)
    assert(Bpe.tokenCountRef("the") == 2L)
    // "ion" is a top-6 3-gram: one token
    assert(Bpe.tokenCountRef("ion") == 1L)
    // 'q', 'w' are outside the table: single-char tokens
    assert(Bpe.tokenCountRef("qw") == 2L)
    // spaces separate words and are never tokens; merges never cross them
    assert(Bpe.tokenCountRef("ion ion") == 2L)
    assert(Bpe.tokenCountRef("") == 0L)
    assert(Bpe.tokenCountRef("   ") == 0L) // whitespace-only: no tokens
    // greedy means LONGEST first: "etain" = "eta"+"in" (3+2), not "et"+"ai"+"n"
    assert(Bpe.tokenCountRef("etain") == 2L)
  }

  test("expression agrees with the driver reference on arbitrary text") {
    val rnd = new scala.util.Random(13L)
    val alphabet = "etaoinshrdlu qwxyz09.!é中"
    val texts = (0 until 300).map { i =>
      (i.toLong, (0 until rnd.nextInt(80)).map(_ => alphabet(rnd.nextInt(alphabet.length))).mkString)
    }
    val got = texts.toDF("id", "text")
      .select(col("id"), Bpe.tokenCount(Dedup.normalize(col("text"))).as("n"))
      .as[(Long, Long)].collect().toMap
    texts.foreach { case (id, raw) =>
      val normalized = raw.toLowerCase.trim.replaceAll("\\s+", " ")
      assert(got(id) == Bpe.tokenCountRef(normalized), s"id=$id text='$raw'")
    }
  }

  test("pairStats counts in-word adjacent char pairs, ties by pair text") {
    // "abab" -> ab, ba, ab; "ab cd" -> ab, cd; single chars drop out
    val docs = Seq((1L, "abab ab"), (2L, "AB  cd x")).toDF("doc_id", "text")
    val got = Bpe.pairStats(docs, k = 10).as[(String, Long)].collect().toSeq
    assert(got == Seq(("ab", 4L), ("ba", 1L), ("cd", 1L)))
    // k truncates at the (n DESC, pair) order deterministically
    assert(Bpe.pairStats(docs, k = 2).as[(String, Long)].collect().toSeq ==
      Seq(("ab", 4L), ("ba", 1L)))
  }

  test("counts are positive and bounded by character count on real docs") {
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val stats = docs.select(
        Bpe.tokenCount(Dedup.normalize(col("text"))).as("n"),
        length(regexp_replace(Dedup.normalize(col("text")), " ", "")).as("chars"))
      .agg(min(col("n")), max(col("n") - col("chars")), sum(when(col("n") > col("chars") / 3, 0).otherwise(1)))
      .collect()(0)
    assert(stats.getLong(0) > 0L) // every doc tokenizes to something
    assert(stats.getLong(1) <= 0L) // never more tokens than non-space chars
    // compression is bounded: a token covers at most 3 chars
    assert(stats.getLong(2) == 0L)
  }

  test("trainMerges reproduces the textbook Sennrich example") {
    import spark.implicits._
    // the classic corpus: low x5, lower x2, newest x6, widest x3.
    // Hand-computed: r1 pair counts peak at es=9 tied with st=9, (e,s)
    // wins lexicographically; r2 (es,t)=9; r3 lo=7 ties ow=7, (l,o) wins.
    val text = (Seq.fill(5)("low") ++ Seq.fill(2)("lower") ++
      Seq.fill(6)("newest") ++ Seq.fill(3)("widest")).mkString(" ")
    val df = Seq((1L, text)).toDF("doc_id", "text")
    val got = Bpe.trainMerges(df, rounds = 3)
      .as[(Int, String, String, Long)].collect().toList
    assert(got == List((1, "e", "s", 9L), (2, "es", "t", 9L), (3, "l", "o", 7L)),
      s"got $got")
    // merging continues correctly past multi-char symbols: round 4 merges
    // (lo, w) -> "low" with count 7
    val r4 = Bpe.trainMerges(df, rounds = 4)
      .as[(Int, String, String, Long)].collect().last
    assert(r4 == ((4, "lo", "w", 7L)), s"round 4: $r4")
    // identical-symbol runs follow greedy left-to-right: "aaaa" with one
    // word merges (a,a) twice -> [aa, aa], then (aa,aa) next round
    val runs = Bpe.trainMerges(Seq((1L, "aaaa")).toDF("doc_id", "text"), rounds = 2)
      .as[(Int, String, String, Long)].collect().toList
    assert(runs == List((1, "a", "a", 3L), (2, "aa", "aa", 1L)), s"runs: $runs")
  }
}
