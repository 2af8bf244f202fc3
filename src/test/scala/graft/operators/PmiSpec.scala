package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class PmiSpec extends SparkSpec {
  import spark.implicits._

  // "zz qq" always co-occurs (6 times, exclusively); filler bigrams mix
  // freely so their PMI ratio stays near 1
  private def corpus = Seq(
    "zz qq the cat sat", "zz qq the dog sat", "zz qq a cat ran",
    "zz qq a dog ran", "zz qq the cat ran", "zz qq a dog sat",
    "the cat ran a dog", "a dog sat the cat", "the dog ran a cat"
  ).zipWithIndex.map { case (t, i) => (i.toLong, t) }.toDF("doc_id", "text")

  test("a planted exclusive collocation ranks first; Q16 score is exact") {
    val top = TextAnalysis.pmiCollocations(corpus, minCount = 5, k = 10)
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getLong(3)))
    assert(top.head._1 == "zz" && top.head._2 == "qq", s"top = ${top.head}")
    // zz appears only as left of qq: c_ab = c_l = c_r = 6, and the corpus
    // holds 9 docs x 4 bigrams = 36 occurrences, so the exact Q16 score
    // is (6 * 36 * 65536) div (6 * 6) = 36 * 65536 / 6
    assert(top.head._3 == 6L)
    val expected = (6L * 36L * 65536L) / (6L * 6L)
    assert(top.head._4 == expected, s"score ${top.head._4} != $expected")
  }

  test("minCount suppresses hapax pairs; ranking is partition invariant") {
    val a = TextAnalysis.pmiCollocations(corpus, minCount = 5, k = 10)
    assert(a.filter(col("c_ab") < 5).isEmpty)
    val b = TextAnalysis.pmiCollocations(corpus.repartition(7), minCount = 5, k = 10)
    assert(a.exceptAll(b).isEmpty && b.exceptAll(a).isEmpty)
  }
}
