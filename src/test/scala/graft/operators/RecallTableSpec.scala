package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** README's "ANN recall vs parameters" table, recomputed — the sf0.01
  * column is asserted against the README text itself, so the documented
  * numbers cannot drift from what the code measures (everything here is
  * deterministic: seeded hyperplanes, content-pinned IVF training sample,
  * fixed parquet fixtures). */
class RecallTableSpec extends SparkSpec {
  import spark.implicits._

  private lazy val emb = spark.read.parquet("/root/testdata/sf0.01/embeddings.parquet")
  private lazy val queries = emb.filter(col("vec_id") < 10).withColumnRenamed("vec_id", "q_id")
  private lazy val brute = Similarity.bruteForceTopK(emb, queries, k = 5)

  private def mean(df: org.apache.spark.sql.DataFrame): Double =
    Similarity.recallAtK(df, brute).select("mean_recall").distinct().as[Double].head()

  test("README recall table matches recomputed sf0.01 values") {
    val readme = new String(java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get("README.md")), "UTF-8")
    // (README row marker, recomputed mean recall@5)
    val rows = Seq(
      "nPlanes=2, tables=8" ->
        mean(Similarity.lshTopKMulti(emb, queries, k = 5, nPlanes = 2, tables = 8)),
      "nPlanes=2, tables=4" ->
        mean(Similarity.lshTopKMulti(emb, queries, k = 5, nPlanes = 2, tables = 4)),
      "nPlanes=3, tables=8" ->
        mean(Similarity.lshTopKMulti(emb, queries, k = 5, nPlanes = 3, tables = 8)),
      "nPlanes=4, tables=8" ->
        mean(Similarity.lshTopKMulti(emb, queries, k = 5, nPlanes = 4, tables = 8)),
      "nPlanes=8" ->
        mean(Similarity.lshTopK(emb, queries, k = 5, nPlanes = 8)),
      "nPlanes=8, nprobe=4" ->
        mean(Similarity.lshTopKMultiProbe(emb, queries, k = 5, nprobe = 4)),
      "nPlanes=8, nprobe=9" ->
        mean(Similarity.lshTopKMultiProbe(emb, queries, k = 5, nprobe = 9)),
      "nlist=16, nprobe=1" ->
        mean(Similarity.ivfTopK(emb, queries, k = 5, nprobe = 1)),
      "nlist=16, nprobe=2" ->
        mean(Similarity.ivfTopK(emb, queries, k = 5, nprobe = 2)),
      "nlist=16, nprobe=4" ->
        mean(Similarity.ivfTopK(emb, queries, k = 5)),
      "nlist=16, nprobe=8" ->
        mean(Similarity.ivfTopK(emb, queries, k = 5, nprobe = 8)))
    rows.foreach { case (marker, recall) =>
      val line = readme.linesIterator.find(l => l.contains(marker) && l.startsWith("|"))
      assert(line.isDefined, s"README recall table lost its '$marker' row")
      val formatted = f"$recall%.2f"
      assert(line.get.contains(formatted),
        s"README row '$marker' drifted: recomputed $formatted, line: ${line.get}")
    }
  }
}
