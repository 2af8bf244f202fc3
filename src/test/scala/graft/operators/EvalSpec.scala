package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Hand-computed tests for the evaluation-metrics tier
  * (`operators.Eval`); the DuckDB oracle grades the same assemblies over
  * the full events/documents tables (`ext_auc`, `ext_eval_confusion`,
  * `ext_search_mrr`, `ext_search_ndcg`). */
class EvalSpec extends SparkSpec {
  import spark.implicits._

  test("aucByGroup: hand pairs, ties count half, degenerate cases") {
    // g0: pos scores {3, 2}, neg {1, 2} -> wins 3, tie 1 of 4 pairs:
    // AUC = 3.5/4. g1: perfect separation -> 1.0. g2: inverted -> 0.0.
    val rows = Seq(
      (0L, 3L, true), (0L, 2L, true), (0L, 1L, false), (0L, 2L, false),
      (1L, 9L, true), (1L, 8L, true), (1L, 1L, false),
      (2L, 1L, true), (2L, 5L, false)).toDF("g", "s", "y")
    val got = Eval.aucByGroup(rows, col("g"), col("s"), col("y"))
      .orderBy("segment")
      .select("segment", "n_pos", "n_neg", "auc")
      .as[(Long, Long, Long, Double)].collect().toSeq
    assert(got == Seq((0L, 2L, 2L, 3.5 / 4.0), (1L, 2L, 1L, 1.0),
      (2L, 1L, 1L, 0.0)))
  }

  test("aucByGroup: a constant score is exactly chance") {
    val rows = (1 to 40).map(i => (0L, 7L, i % 3 == 0))
      .toDF("g", "s", "y")
    val auc = Eval.aucByGroup(rows, col("g"), col("s"), col("y"))
      .select("auc").as[Double].collect().head
    assert(auc == 0.5)
  }

  test("confusion: hand-computed counts and every derived metric") {
    // tp=2 fp=1 fn=1 tn=6
    val rows = (Seq((true, true), (true, true), (false, true), (true, false)) ++
      Seq.fill(6)((false, false))).toDF("y", "p")
    val r = Eval.confusion(rows, col("y"), col("p")).collect().head
    assert((r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)) ==
      ((2L, 1L, 1L, 6L)))
    assert(r.getDouble(4) == 2.0 / 3.0) // precision
    assert(r.getDouble(5) == 2.0 / 3.0) // recall
    assert(r.getDouble(6) == 4.0 / 6.0) // f1
    assert(r.getDouble(7) == 8.0 / 10.0) // accuracy
    // kappa = 2(tp*tn - fp*fn) / ((tp+fp)(fp+tn) + (tp+fn)(fn+tn))
    assert(r.getDouble(8) == 22.0 / 42.0)
  }

  test("rankedRun equals the window idiom and honors the k bound") {
    val docs = Seq(
      (1L, "x x x y"), (2L, "x x y y"), (3L, "x y"), (4L, "y y y")
    ).toDF("doc_id", "text")
    val run = Eval.rankedRun(docs, col("text"), col("doc_id"),
      Seq("x", "y"), k = 2)
    // window reference: tf DESC, doc_id ASC, top 2 per term
    val tf = docs
      .select(col("doc_id"), explode(split(col("text"), " ")).as("tok"))
      .filter(col("tok").isin("x", "y"))
      .groupBy(col("tok").as("query"), col("doc_id"))
      .agg(count(lit(1)).as("tf"))
    val w = Window.partitionBy(col("query"))
      .orderBy(col("tf").desc, col("doc_id").asc)
    val ref = tf.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= 2)
      .select("query", "rank", "doc_id", "tf")
    assert(run.orderBy("query", "rank").collect().toSeq ==
      ref.orderBy("query", "rank").collect().toSeq)
    assert(run.groupBy("query").count().select(max("count"))
      .as[Long].collect().head == 2L)
  }

  test("dcgFold: hand fold, and an ideal ranking scores ndcg 1.0") {
    val w = Eval.dcgWeights(10)
    val rels = Seq(2, 0, 1, 0, 0, 0, 0, 0, 0, 0)
    val expected = rels.zip(w).foldLeft(0.0) { case (a, (r, wt)) => a + r * wt }
    val df = Seq(Tuple1(rels)).toDF("rels")
    val got = df.select(Eval.dcgFold(col("rels"), 10).as("dcg"),
      Eval.dcgFold(sort_array(col("rels"), asc = false), 10).as("idcg"))
      .as[(Double, Double)].collect().head
    assert(got._1 == expected)
    // ideal permutation: already-descending rels make dcg == idcg
    val ideal = Seq(2, 1, 0, 0, 0, 0, 0, 0, 0, 0)
    val idealExpected = ideal.zip(w).foldLeft(0.0) {
      case (a, (r, wt)) => a + r * wt }
    assert(got._2 == idealExpected)
  }
}
