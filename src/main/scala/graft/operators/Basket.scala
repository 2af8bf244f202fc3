package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Market-basket association rules: support / confidence / lift for item
  * pairs that co-occur in the same basket (reference computes only flat
  * rollups — this is the classic retail-analytics tier on top).
  *
  * Scale shape: the only join is the basket-key self-join, hash-partitioned
  * on the basket id, whose fan-out per basket is bounded by (distinct items
  * per basket choose 2) — baskets are small by nature, so the pair stream is
  * a small constant times the input, never |items|². Item totals and the
  * basket count are dimension-sized and broadcast onto the pair counts.
  * Support and confidence are exact integer basis points; lift is the one
  * mirrored double division (its integer numerator n_ab·N can outgrow a
  * long at extreme scale, where the two exact bp columns remain the
  * overflow-safe signal).
  */
object Basket {

  /** Association rules over `(basketCol, itemCol)` rows. Each unordered
    * item pair seen in at least `minPairs` baskets, with both conditional
    * confidences. Input rows need not be distinct. */
  def pairRules(df: DataFrame, basketCol: String, itemCol: String,
      minPairs: Long = 5L): DataFrame = {
    // one row per (basket, item) BEFORE the self-join — same reason the
    // co-occurrence graph dedups: repeated lines would multiply pair rows
    val bi = graft.util.Checkpoints.cut(
      df.select(col(basketCol).as("b"), col(itemCol).as("i")).distinct())
    val nBaskets = bi.agg(countDistinct(col("b")).as("n_baskets"))
    val itemCnt = bi.groupBy(col("i")).agg(count(lit(1)).as("ni"))
    val pairs = bi.select(col("b"), col("i").as("item_a"))
      .join(bi.select(col("b"), col("i").as("item_b")), Seq("b"))
      .filter(col("item_a") < col("item_b"))
      .groupBy(col("item_a"), col("item_b"))
      .agg(count(lit(1)).as("n_ab"))
      .filter(col("n_ab") >= minPairs)
    pairs
      .join(broadcast(itemCnt.select(col("i").as("item_a"), col("ni").as("n_a"))),
        Seq("item_a"))
      .join(broadcast(itemCnt.select(col("i").as("item_b"), col("ni").as("n_b"))),
        Seq("item_b"))
      .crossJoin(broadcast(nBaskets))
      .select(col("item_a"), col("item_b"), col("n_ab"), col("n_a"),
        col("n_b"), col("n_baskets"),
        expr("n_ab * 10000 div n_baskets").as("support_bp"),
        expr("n_ab * 10000 div n_a").as("conf_a_to_b_bp"),
        expr("n_ab * 10000 div n_b").as("conf_b_to_a_bp"),
        ((col("n_ab") * col("n_baskets")).cast("double") /
          (col("n_a") * col("n_b")).cast("double")).as("lift"))
  }
}
