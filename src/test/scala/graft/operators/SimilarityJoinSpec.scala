package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Exact similarity joins: prefix-filtered Jaccard (PPJoin family) and
  * positional-q-gram-blocked Levenshtein. Both are LOSSLESS candidate
  * generators, so every test's ground truth is a brute-force all-pairs
  * computation the pruned path must equal exactly. */
class SimilarityJoinSpec extends SparkSpec {
  import spark.implicits._

  // documents with a planted near-dup pair (1,2), a containment-ish pair,
  // and unrelated filler; doc 9 is sub-shingle-length
  private def docs: DataFrame = Seq(
    (1L, "the quick brown fox jumps over the lazy dog near the river bank"),
    (2L, "the quick brown fox jumps over the lazy dog near the river bend"),
    (3L, "an entirely different document about spark physical plans and shuffles"),
    (4L, "the quick brown fox jumps over the lazy dog"),
    (5L, "tokenizer vocabularies and byte pair encodings for language models"),
    (9L, "too short")
  ).toDF("doc_id", "text")

  private def bruteJaccard(df: DataFrame, thr: Double): DataFrame = {
    val sh = df.select(col("doc_id").as("id"),
      Dedup.wordShingles(col("text")).as("sh")).filter(col("sh").isNotNull)
    sh.select(col("id").as("id_a"), col("sh").as("sh_a"))
      .crossJoin(sh.select(col("id").as("id_b"), col("sh").as("sh_b")))
      .filter(col("id_a") < col("id_b"))
      .withColumn("jaccard", Dedup.jaccard(col("sh_a"), col("sh_b")))
      .filter(col("jaccard") >= thr)
      .select(col("id_a"), col("id_b"), col("jaccard"))
  }

  test("prefixJaccardPairs equals the all-pairs exact join (lossless pruning)") {
    val pruned = Dedup.prefixJaccardPairs(docs, thrNum = 3, thrDen = 10)
    val brute = bruteJaccard(docs, 0.3)
    assert(pruned.exceptAll(brute).isEmpty && brute.exceptAll(pruned).isEmpty,
      "prefix-filtered result differs from brute force")
    assert(pruned.filter(col("id_a") === 1 && col("id_b") === 2).count() == 1,
      "planted near-dup pair missing")
    assert(pruned.filter(col("id_a") === 3 || col("id_b") === 3).isEmpty,
      "unrelated doc paired")
  }

  test("prefixJaccardPairs is partition-count invariant") {
    val a = Dedup.prefixJaccardPairs(docs, thrNum = 3, thrDen = 10)
    val b = Dedup.prefixJaccardPairs(docs.repartition(7), thrNum = 3, thrDen = 10)
    assert(a.exceptAll(b).isEmpty && b.exceptAll(a).isEmpty)
  }

  test("prefixJaccardPairs at threshold 1 returns only identical shingle sets") {
    val withTwin = docs.union(Seq((6L,
      "the   QUICK brown fox jumps over the lazy dog")).toDF("doc_id", "text"))
    val eq = Dedup.prefixJaccardPairs(withTwin, thrNum = 1, thrDen = 1)
    // doc 6 normalizes to doc 4's text: jaccard exactly 1; nothing else ties
    assert(eq.select("id_a", "id_b").as[(Long, Long)].collect().toSet ==
      Set((4L, 6L)))
  }

  // strings exercising every blocking regime: long (count bound active),
  // boundary distances, the short bucket (< q*(maxDist+1)), and sub-q
  private def names: DataFrame = Seq(
    (1L, "annotation pipeline alpha"),
    (2L, "annotation pipeline alphb"),   // dist 1 from 1
    (3L, "annotation pipeline omega"),   // dist 4 from 1 (alpha -> omega)
    (4L, "completely unrelated string"),
    (5L, "ab"),                          // sub-q short
    (6L, "abc"),                         // dist 1 from 5
    (7L, "abcd efgh"),                   // short bucket
    (8L, "abcd efgi")                    // dist 1 from 7
  ).toDF("id", "name")

  private def bruteEdit(df: DataFrame, d: Int): DataFrame =
    df.select(col("id").as("id_a"), col("name").as("v_a"))
      .crossJoin(df.select(col("id").as("id_b"), col("name").as("v_b")))
      .filter(col("id_a") < col("id_b"))
      .withColumn("distance", levenshtein(col("v_a"), col("v_b")))
      .filter(col("distance") <= d)
      .select(col("id_a"), col("id_b"), col("distance"))

  test("editDistancePairs equals brute force across long, short and sub-q strings") {
    for (d <- Seq(1, 2, 4)) {
      val pruned = Dedup.editDistancePairs(names, "name", "id", maxDist = d, q = 3)
      val brute = bruteEdit(names, d)
      assert(pruned.exceptAll(brute).isEmpty && brute.exceptAll(pruned).isEmpty,
        s"blocked result differs from brute force at maxDist=$d")
    }
  }

  test("editDistancePairs boundary: distance exactly maxDist kept, maxDist+1 dropped") {
    val pruned = Dedup.editDistancePairs(names, "name", "id", maxDist = 4, q = 3)
    assert(pruned.filter(col("id_a") === 1 && col("id_b") === 3)
      .select("distance").as[Int].head() == 4)
    val tight = Dedup.editDistancePairs(names, "name", "id", maxDist = 3, q = 3)
    assert(tight.filter(col("id_a") === 1 && col("id_b") === 3).isEmpty)
  }

  test("editDistanceLink equals the cross brute force; never matches within a side") {
    val left = names.filter(col("id") % 2 === 1)
    val right = names.filter(col("id") % 2 === 0)
    val linked = Dedup.editDistanceLink(left, right, "name", "id", maxDist = 2, q = 3)
    val brute = left.select(col("id").as("id_a"), col("name").as("v_a"))
      .crossJoin(right.select(col("id").as("id_b"), col("name").as("v_b")))
      .withColumn("distance", levenshtein(col("v_a"), col("v_b")))
      .filter(col("distance") <= 2)
      .select(col("id_a"), col("id_b"), col("distance"))
    assert(linked.exceptAll(brute).isEmpty && brute.exceptAll(linked).isEmpty,
      "cross-linkage differs from brute force")
    // ids 1 and 2 are within distance 1 but sit on opposite sides — the
    // ONLY orientation produced is (left=1, right=2)
    assert(linked.filter(col("id_a") === 2).isEmpty, "right-side id surfaced as id_a")
  }

  test("editDistancePairs is partition-count invariant") {
    val a = Dedup.editDistancePairs(names, "name", "id", maxDist = 2, q = 3)
    val b = Dedup.editDistancePairs(names.repartition(5), "name", "id", maxDist = 2, q = 3)
    assert(a.exceptAll(b).isEmpty && b.exceptAll(a).isEmpty)
  }
}
