package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Pareto-frontier (skyline) queries: the rows no other row dominates.
  *
  * Design (reference computes only flat aggregates — this is capability the
  * engine adds for catalog/curation work, e.g. "cheapest part at every size
  * tier"): the 2D skyline has a sort-based O(n log n) form — order by the
  * minimized column, and a row survives iff no predecessor carries an equal-
  * or-better maximized value. That is two range-frame window maxes, never
  * the quadratic dominance join the textbook NOT-EXISTS formulation implies
  * (the DuckDB oracle runs exactly that quadratic form, which is what makes
  * it an independent check of this rewrite).
  *
  * Scale shape: the global pass is one range-partitioned sort. Before it, a
  * partition-local prune runs the same two windows inside each input
  * partition and drops locally-dominated rows — local dominance implies
  * global dominance, so the prune is lossless, and the frontier of a
  * partition is tiny relative to the partition (for random order,
  * O(log n) expected points in 2D). The global sort therefore sees roughly
  * |frontier| x partitions rows, not n — the classic divide-and-prune
  * skyline plan, expressed entirely in window functions.
  */
object Skyline {

  /** Rows of `df` not dominated under (minimize `minCol`, maximize
    * `maxCol`): B is dominated iff some A has `A.min <= B.min` and
    * `A.max >= B.max` with at least one strict. Ties that are equal on
    * BOTH columns dominate neither way — all such duplicates survive.
    * Both columns must be non-null numerics.
    */
  def frontier2d(df: DataFrame, minCol: String, maxCol: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    // partition-local prune: same dominance test, restricted to each input
    // partition — only removes rows the global pass would remove anyway
    val localW = Window.partitionBy(col("__sky_p")).orderBy(col(minCol))
    val local = survivors(
      df.withColumn("__sky_p", spark_partition_id()), localW, minCol, maxCol)
      .drop("__sky_p")
    // global pass over the pruned remainder: one range-partitioned sort
    survivors(local, Window.orderBy(col(minCol)), minCol, maxCol)
  }

  /** The two-window dominance filter over an `orderBy(minCol)` window base:
    * survive iff no strictly-cheaper row reaches my `maxCol` and no
    * equal-cost row exceeds it. */
  private def survivors(df: DataFrame,
      base: org.apache.spark.sql.expressions.WindowSpec,
      minCol: String, maxCol: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val strictlyBelow = base.rangeBetween(Window.unboundedPreceding, -1)
    val equalCost = base.rangeBetween(Window.currentRow, Window.currentRow)
    df.withColumn("__sky_lt", max(col(maxCol)).over(strictlyBelow))
      .withColumn("__sky_eq", max(col(maxCol)).over(equalCost))
      .filter((col("__sky_lt").isNull || col("__sky_lt") < col(maxCol)) &&
        col("__sky_eq") === col(maxCol))
      .drop("__sky_lt", "__sky_eq")
  }
}
