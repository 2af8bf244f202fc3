package graft.operators

import graft.functions.{TopKByScore, TopKHeap}
import org.scalacheck.{Gen, Properties}
import org.scalacheck.Prop.{forAll, propBoolean}

/** Generative (ScalaCheck) layer over the pure-JVM kernels — the parts
  * whose correctness the oracle gate can only sample, exercised here over
  * arbitrary inputs: the bounded top-k heap (vs a sort-based reference,
  * including NaN / infinities / signed zero / dense ties), its shuffle
  * serialization, and the driver-local Lloyd trainer. Spark-bound
  * operators keep their example-based specs + DuckDB oracles; these
  * properties cover the input space no fixture enumerates. */
object GraftProperties extends Properties("graft") {

  // doubles dense in the hazards: ties (small int-valued doubles), signed
  // zero, infinities, NaN — exactly the values a double ORDER BY must
  // totally order the same way everywhere
  private val score: Gen[Double] = Gen.frequency(
    5 -> Gen.choose(-4, 4).map(_.toDouble),
    3 -> Gen.choose(-1e9, 1e9),
    1 -> Gen.oneOf(0.0, -0.0, Double.PositiveInfinity,
      Double.NegativeInfinity, Double.NaN))

  private val entry: Gen[(Double, Long)] =
    for { s <- score; id <- Gen.choose(-100L, 100L) } yield (s, id)

  private val entries: Gen[List[(Double, Long)]] = Gen.listOf(entry)

  /** The window-rank reference: sort by (score DESC, id ASC) under Spark's
    * total order on doubles (java.lang.Double.compare), take k. */
  private def reference(xs: List[(Double, Long)], k: Int): List[(Double, Long)] =
    xs.sortWith { case ((s1, i1), (s2, i2)) =>
      val c = java.lang.Double.compare(s2, s1)
      if (c != 0) c < 0 else i1 < i2
    }.take(k)

  private def heapOf(xs: List[(Double, Long)], k: Int): TopKHeap = {
    val h = new TopKHeap(k)
    xs.foreach { case (s, i) => h.insert(s, i) }
    h
  }

  private def drain(h: TopKHeap): List[(Double, Long)] =
    h.sortedDesc.toList.map(e => (e.score, e.id))

  // NaN-tolerant pair equality: the reference and heap must agree on
  // WHICH entries survive and their order — (NaN, 3) == (NaN, 3)
  private def samePairs(a: List[(Double, Long)], b: List[(Double, Long)]): Boolean =
    a.lengthCompare(b.length) == 0 && a.zip(b).forall { case ((s1, i1), (s2, i2)) =>
      i1 == i2 && java.lang.Double.compare(s1, s2) == 0
    }

  property("topKHeap matches the sort reference for any input and k") =
    forAll(entries, Gen.choose(1, 12)) { (xs, k) =>
      samePairs(drain(heapOf(xs, k)), reference(xs, k))
    }

  property("topKHeap never holds more than k entries") =
    forAll(entries, Gen.choose(1, 12)) { (xs, k) =>
      drain(heapOf(xs, k)).lengthCompare(math.min(k, xs.length)) == 0
    }

  property("topKHeap merge equals the heap of the concatenation") =
    forAll(entries, entries, Gen.choose(1, 12)) { (xs, ys, k) =>
      val merged = heapOf(xs, k)
      merged.mergeFrom(heapOf(ys, k))
      samePairs(drain(merged), reference(xs ++ ys, k))
    }

  property("TopKByScore serialization round-trips the buffer exactly") =
    forAll(entries, Gen.choose(1, 12)) { (xs, k) =>
      import org.apache.spark.sql.catalyst.expressions.BoundReference
      import org.apache.spark.sql.types.{DoubleType, LongType}
      val agg = TopKByScore(
        BoundReference(0, DoubleType, nullable = true),
        BoundReference(1, LongType, nullable = true), k)
      val h = heapOf(xs, k)
      samePairs(drain(agg.deserialize(agg.serialize(h))), drain(h))
    }

  // ---- driver-local Lloyd trainer ------------------------------------

  private val vecs: Gen[List[Array[Double]]] = for {
    dim <- Gen.choose(1, 6)
    n <- Gen.choose(1, 40)
    vs <- Gen.listOfN(n,
      Gen.listOfN(dim, Gen.choose(-100.0, 100.0)).map(_.toArray))
  } yield vs

  property("lloydCentroids: deterministic, bounded count, width-preserving") =
    forAll(vecs, Gen.choose(1, 8), Gen.choose(0L, 3L)) { (vs, nlist, seed) =>
      val a = Similarity.lloydCentroids(vs.toArray, nlist, seed)
      val b = Similarity.lloydCentroids(vs.toArray, nlist, seed)
      (a.length == b.length &&
        a.zip(b).forall { case (x, y) => x.sameElements(y) }) :| "deterministic" &&
        (a.nonEmpty && a.length <= nlist) :| "1..nlist centroids" &&
        a.forall(_.length == vs.head.length) :| "width preserved" &&
        a.forall(_.forall(d => !d.isNaN && !d.isInfinite)) :| "finite"
    }

  // ---- Damerau-Levenshtein metric properties -------------------------

  private val shortStr: Gen[String] =
    Gen.choose(0, 8).flatMap(n =>
      Gen.listOfN(n, Gen.oneOf('a', 'b', 'c')).map(_.mkString))

  private def dl(a: String, b: String): Int =
    graft.functions.DamerauLevenshtein.distance(
      a.codePoints().toArray, b.codePoints().toArray)

  property("damerau: metric axioms over a small alphabet") =
    forAll(shortStr, shortStr, shortStr) { (a, b, c) =>
      (dl(a, a) == 0) :| "identity" &&
        (dl(a, b) == dl(b, a)) :| "symmetry" &&
        ((a == b) == (dl(a, b) == 0)) :| "separation" &&
        (dl(a, c) <= dl(a, b) + dl(b, c)) :| "triangle inequality" &&
        (dl(a, b) >= math.abs(a.length - b.length)) :| "length lower bound" &&
        (dl(a, b) <= math.max(a.length, b.length)) :| "length upper bound"
    }

  property("damerau: adjacent transposition costs exactly one") =
    forAll(shortStr.suchThat(_.length >= 2), Gen.choose(0, 6)) { (s, off) =>
      val i = off % (s.length - 1)
      val t = s.substring(0, i) + s.charAt(i + 1) + s.charAt(i) +
        s.substring(i + 2)
      (dl(s, t) <= 1) :| s"one swap must cost <= 1: '$s' vs '$t'"
    }

  // ---- content-hash sampling thresholds ------------------------------

  property("hexThreshold: 8 lowercase hex chars, monotone, pinned endpoints") =
    forAll(Gen.choose(0.0, 1.0), Gen.choose(0.0, 1.0)) { (f1, f2) =>
      val (lo, hi) = if (f1 <= f2) (f1, f2) else (f2, f1)
      val (tl, th) = (Sampling.hexThreshold(lo), Sampling.hexThreshold(hi))
      (tl.length == 8 && tl.forall(c => c.isDigit || ('a' to 'f').contains(c))) :|
        "8 hex chars" &&
        (tl <= th) :| "monotone in fraction" &&
        (Sampling.hexThreshold(0.0) == "00000000" &&
          Sampling.hexThreshold(1.0) == "ffffffff") :| "endpoints"
    }
}
