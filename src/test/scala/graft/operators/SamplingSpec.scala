package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Content-hash sampling invariants (exact values are oracle-checked in
  * x2_hash_split / x3_source_quota). */
class SamplingSpec extends SparkSpec {
  import spark.implicits._

  private lazy val ids = spark.range(10000).toDF("id")

  test("hashSplit fractions land near their targets") {
    val counts = Sampling.hashSplit(ids, "id",
        Seq("train" -> 0.8, "val" -> 0.1, "test" -> 0.1))
      .groupBy("split").count().as[(String, Long)].collect().toMap
    assert(counts.keySet == Set("train", "val", "test"))
    assert(math.abs(counts("train") - 8000L) < 300, counts)
    assert(math.abs(counts("val") - 1000L) < 150, counts)
    assert(math.abs(counts("test") - 1000L) < 150, counts)
  }

  test("growing the corpus never moves an existing row between splits") {
    val small = Sampling.hashSplit(ids.filter(col("id") < 1000), "id",
      Seq("train" -> 0.5, "val" -> 0.5))
    val big = Sampling.hashSplit(ids, "id", Seq("train" -> 0.5, "val" -> 0.5))
      .filter(col("id") < 1000)
    assert(small.exceptAll(big).isEmpty && big.exceptAll(small).isEmpty)
  }

  test("different salts give independent assignments") {
    val a = Sampling.deterministicSample(ids, "id", 0.5, salt = "a")
      .as[Long].collect().toSet
    val b = Sampling.deterministicSample(ids, "id", 0.5, salt = "b")
      .as[Long].collect().toSet
    val overlap = (a intersect b).size.toDouble / 10000
    assert(overlap > 0.2 && overlap < 0.3, s"expected ~0.25 overlap, got $overlap")
  }

  test("fractions summing to 1.0 are exhaustive; fraction 1.0 keeps all rows") {
    // strict hex compares top out below "ffffffff…" — the final bucket and
    // the full-fraction sample must special-case to catch the top hash value
    val n = Sampling.hashSplit(ids, "id", Seq("train" -> 0.8, "val" -> 0.1, "test" -> 0.1))
      .filter(col("split") === "rest").count()
    assert(n == 0L)
    assert(Sampling.deterministicSample(ids, "id", 1.0).count() == 10000L)
  }

  test("samples are nested: sample(f1) is a subset of sample(f2) for f1 <= f2") {
    // the property that makes content-hash sampling safe to widen later:
    // raising the fraction only ADDS rows, never reshuffles existing ones
    val small = ids.limit(500)
    val rnd = new scala.util.Random(7)
    (1 to 5).foreach { _ =>
      val (a, b) = (rnd.nextDouble(), rnd.nextDouble())
      val (lo, hi) = if (a <= b) (a, b) else (b, a)
      val s1 = Sampling.deterministicSample(small, "id", lo).as[Long].collect().toSet
      val s2 = Sampling.deterministicSample(small, "id", hi).as[Long].collect().toSet
      assert(s1.subsetOf(s2), s"f=$lo not nested in f=$hi")
    }
  }

  test("hexThreshold is monotone and boundary-exact") {
    assert(Sampling.hexThreshold(0.0) == "00000000")
    assert(Sampling.hexThreshold(1.0) == "ffffffff")
    val fs = (0 to 100).map(_ / 100.0)
    fs.sliding(2).foreach { case Seq(a, b) =>
      assert(Sampling.hexThreshold(a) <= Sampling.hexThreshold(b))
    }
  }

  test("packSequences matches a driver-side greedy fold, shard by shard") {
    val rnd = new scala.util.Random(9L)
    val rows = (0L until 300L).map(i => (i, s"s${i % 4}", rnd.nextInt(200) + 1))
    val df = rows.toDF("doc_id", "source", "n")
    val got = Sampling.packSequences(df, col("n"), contextLen = 512)
      .select("doc_id", "n_tokens", "bin", "bin_offset")
      .as[(Long, Long, Long, Long)].collect().map(r => r._1 -> r).toMap
    // reference: stream each shard's docs in id order, accumulate tokens
    rows.groupBy(_._2).foreach { case (_, docs) =>
      var acc = 0L
      docs.sortBy(_._1).foreach { case (id, _, n) =>
        assert(got(id) == ((id, n.toLong, acc / 512, acc % 512)),
          s"doc $id: got ${got(id)}, acc=$acc n=$n")
        acc += n
      }
    }
    // offsets live in [0, contextLen)
    assert(got.values.forall(r => r._4 >= 0 && r._4 < 512))
  }

  test("perKeyQuota keeps exactly n deterministic rows per key") {
    val df = Seq(
      ("s1", 1L, 10L), ("s1", 2L, 30L), ("s1", 3L, 30L), ("s1", 4L, 20L),
      ("s2", 5L, 5L))
      .toDF("source", "doc_id", "n_chars")
    val kept = Sampling.perKeyQuota(df, "source", 2,
        Seq(col("n_chars").desc, col("doc_id")))
      .select("doc_id").as[Long].collect().toSet
    // s1: ties on 30 broken by doc_id (2 then 3); s2 keeps its only row
    assert(kept == Set(2L, 3L, 5L))
  }
}
