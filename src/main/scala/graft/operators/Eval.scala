package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Offline evaluation metrics — the measurement half of a training-data
  * pipeline: once a corpus is filtered/deduped/labeled, you grade the
  * classifiers and retrievers that produced the labels. (The reference
  * pipeline stops at aggregation — kafka_sparkStreaming_sbt
  * `CustomerSpendingAnalysis.scala` — so this tier, like dedup/ANN, is
  * capability beyond it, built to the same exactness bar.)
  *
  * Every metric here is assembled from EXACT integer counts; doubles
  * appear only in a final mirrored IEEE expression (one division, or an
  * ordered literal-weight fold), so values are bit-reproducible
  * cross-engine — the same discipline as [[graft.operators.Quality]] and
  * `ext_corr_exact`.
  */
object Eval {

  /** Exact ROC-AUC per group from an INTEGER score, Mann-Whitney style
    * over a (group, score) histogram:
    *
    *   AUC = [ Σ_s pos_s · (2·negBelow_s + neg_s) ] / (2 · P · N)
    *
    * — each positive beats the negatives scored strictly below it and
    * half-beats the ties, which is exactly the trapezoidal area under the
    * ROC curve. The histogram is the scale shape: the one shuffle carries
    * a row per (group, DISTINCT score) — callers bin continuous scores
    * first (the binning IS the operator's contract), so at 100 TB the
    * ordered cumulative pass runs over a bounded few-thousand-row
    * histogram per group, never the raw rows, and groups parallelize
    * across the cluster. All terms are exact longs; the single division
    * is the only double op.
    */
  def aucByGroup(
      rows: DataFrame, group: Column, score: Column, label: Column): DataFrame = {
    val h = rows
      .groupBy(group.as("segment"), score.cast("long").as("s"))
      .agg(sum(when(label, 1L).otherwise(0L)).as("pos"),
        sum(when(label, 0L).otherwise(1L)).as("neg"))
    val below = Window.partitionBy(col("segment")).orderBy(col("s"))
      .rowsBetween(Window.unboundedPreceding, -1)
    h.withColumn("neg_below", coalesce(sum(col("neg")).over(below), lit(0L)))
      .groupBy(col("segment"))
      .agg(sum(col("pos")).as("n_pos"), sum(col("neg")).as("n_neg"),
        sum(col("pos") * (col("neg_below") * 2 + col("neg"))).as("auc_num2"))
      // a single-class group (n_pos or n_neg = 0) has no defined AUC —
      // explicit NULL, never NaN (oracle mirrors with NULLIF)
      .withColumn("auc", safeDiv(col("auc_num2").cast("double"),
        (col("n_pos") * col("n_neg") * 2).cast("double")))
  }

  /** Confusion-matrix suite for a boolean classifier: tp/fp/fn/tn plus
    * precision, recall, F1, accuracy, and Cohen's kappa — ONE scan, one
    * combinable aggregate (k metrics ≠ k passes), each metric a single
    * division of exact integer terms. Kappa's n² products widen through
    * DECIMAL(18,0) → the (19,0)·(19,0) = (38,0) products stay exact far
    * past long range AND inside both engines' 38-digit decimal ceiling
    * (a 19-digit cast would already overflow DuckDB's width-38 multiply).
    */
  def confusion(rows: DataFrame, label: Column, pred: Column): DataFrame = {
    def cnt(c: Column) = sum(when(c, 1L).otherwise(0L))
    metricsFromCounts(rows.agg(
      cnt(label && pred).as("tp"), cnt(!label && pred).as("fp"),
      cnt(label && !pred).as("fn"), cnt(!label && !pred).as("tn")))
  }

  /** The metric suite derived from an already-counted (tp, fp, fn, tn)
    * row — split out so the streaming twin can maintain the four counts
    * in complete mode (additive longs, state bounded by construction) and
    * project the metrics only after finalization. */
  def metricsFromCounts(counted: DataFrame): DataFrame = {
    def dec(c: Column) = c.cast("decimal(18,0)")
    val Seq(tp, fp, fn, tn) = Seq("tp", "fp", "fn", "tn").map(col)
    val kNum = (dec(tp) * dec(tn) - dec(fp) * dec(fn)) * 2
    val kDen = (dec(tp) + dec(fp)) * (dec(fp) + dec(tn)) +
      (dec(tp) + dec(fn)) * (dec(fn) + dec(tn))
    // degenerate inputs (a zero denominator: no predicted positives, no
    // labeled positives, an empty relation) surface as explicit NULL, not
    // a silent NaN the downstream hash/grade layer can't distinguish —
    // the same guard degreeAssortativity applies to its undefined case.
    // The oracle mirrors with NULLIF on the identical cast denominators.
    counted.select(tp, fp, fn, tn,
      safeDiv(tp.cast("double"), (tp + fp).cast("double")).as("precision"),
      safeDiv(tp.cast("double"), (tp + fn).cast("double")).as("recall"),
      safeDiv((tp * 2).cast("double"), (tp * 2 + fp + fn).cast("double"))
        .as("f1"),
      safeDiv((tp + tn).cast("double"),
        (tp + fp + fn + tn).cast("double")).as("accuracy"),
      safeDiv(kNum.cast("double"), kDen.cast("double")).as("kappa"))
  }

  /** `num / den` with a zero denominator yielding NULL instead of
    * NaN/Infinity — the non-zero branch divides the exact same cast
    * operands, so defined values are bit-identical to the unguarded
    * division (cross-engine mirror: `num / NULLIF(den, 0)`). */
  private def safeDiv(num: Column, den: Column): Column =
    when(den === 0.0, lit(null).cast("double")).otherwise(num / den)

  /** Term-frequency retrieval over an inverted-index shape: ONE pass
    * tokenizes the corpus, keeps only the query terms, counts tf per
    * (term, doc), and takes each term's top-k docs by (tf DESC, doc_id
    * ASC) through the bounded-heap aggregate — so the shuffle carries at
    * most k candidates per term per task and no per-term sort of the full
    * posting list ever runs. Returns (query, rank, doc_id, tf) — the
    * ranked run an eval metric (MRR, NDCG) grades. At 100 TB this is the
    * standard scale shape: explode → filter to the query vocabulary →
    * count → bounded top-k; never a corpus × queries cross join.
    */
  def rankedRun(
      docs: DataFrame, textCol: Column, idCol: Column,
      terms: Seq[String], k: Int): DataFrame = {
    require(terms.nonEmpty && k >= 1)
    val tf = docs
      .select(idCol.as("doc_id"), explode(split(textCol, " ")).as("tok"))
      .filter(col("tok").isin(terms: _*))
      .groupBy(col("tok").as("query"), col("doc_id"))
      .agg(count(lit(1)).as("tf"))
    import org.apache.spark.sql.graft.ColumnBridge
    tf.groupBy(col("query"))
      .agg(ColumnBridge.column(graft.functions.TopKByScore(
        ColumnBridge.expression(col("tf").cast("double")),
        ColumnBridge.expression(col("doc_id")), k).toAggregateExpression())
        .as("hits"))
      .select(col("query"), posexplode(col("hits")).as(Seq("pos", "hit")))
      .select(col("query"), (col("pos") + 1).as("rank"),
        col("hit.id").as("doc_id"), col("hit.score").cast("long").as("tf"))
  }

  /** Position-discount weights 1/log2(rank+1) for ranks 1..k — computed
    * once driver-side so BOTH engines consume the identical double
    * literals (never each engine's own log). */
  def dcgWeights(k: Int): Seq[Double] =
    (1 to k).map(r => 1.0 / (math.log(r + 1.0) / math.log(2.0)))

  /** DCG@k from per-rank graded relevance as an ORDERED left fold over
    * literal weights — Spark's `aggregate` and DuckDB's `list_reduce`
    * fold the same products in the same order, so the double is
    * bit-identical cross-engine. `rels` must be rank-ordered (pad to k
    * with zeros before calling). */
  def dcgFold(rels: Column, k: Int): Column = {
    val w = array(dcgWeights(k).map(lit): _*)
    aggregate(zip_with(rels, w, (r, wt) => r.cast("double") * wt),
      lit(0.0), (acc, x) => acc + x)
  }
}
