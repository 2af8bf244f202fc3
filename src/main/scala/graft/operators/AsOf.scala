package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** As-of (time-series) join: each left row is matched to the single right
  * row with the greatest right timestamp <= the left timestamp (backward
  * direction; `forward` matches the smallest right timestamp >= left),
  * equal timestamps match, per join key.
  *
  * Spark has no native as-of join, so this is the composed-operator form
  * (preference (a) of the custom-operator ladder): tag both sides, UNION,
  * and carry the latest right payload forward with a single
  * `last(ignoreNulls)` running window — ONE shuffle on the join keys and a
  * per-key sort, instead of the range join's candidate explosion
  * (`left x right` pairs within each key) that a naive
  * `l.ts >= r.ts` theta-join would plan. At 100 TB both sides shuffle once
  * on the key columns and stream through the window in sort order; skew in
  * a single hot key serializes only that key's partition (same contract as
  * any windowed aggregation — pre-split hot keys upstream if one key
  * dominates).
  *
  * Matching is deterministic when (keys, ts) pairs are unique on the right
  * side; on exact right-side ties the greatest payload struct wins (a total
  * order, so still deterministic — DuckDB's ASOF picks an arbitrary tie
  * member instead).
  */
object AsOf {

  /** As-of join `left` to `right`.
    *
    * @param keys       equality join columns (same names on both sides)
    * @param leftTs     left timestamp column name (TimestampType)
    * @param rightTs    right timestamp column name (TimestampType)
    * @param rightCols  right columns to carry (default: all non-key,
    *                   non-timestamp columns), emitted with `rightPrefix`;
    *                   the matched right timestamp is always emitted as
    *                   `rightPrefix + rightTs`
    * @param direction  "backward" (default): latest right <= left;
    *                   "forward": earliest right >= left
    * @param tolerance  optional max |left ts - right ts| in MICROSECONDS;
    *                   matches farther than this are nulled out (the left
    *                   row is kept, as in pandas merge_asof)
    * @param inner      drop unmatched left rows (default keeps them with
    *                   null right columns, i.e. LEFT as-of join)
    */
  def joinAsOf(
      left: DataFrame,
      right: DataFrame,
      keys: Seq[String],
      leftTs: String,
      rightTs: String,
      rightCols: Seq[String] = Seq.empty,
      rightPrefix: String = "right_",
      direction: String = "backward",
      tolerance: Option[Column] = None,
      inner: Boolean = false): DataFrame = {
    require(direction == "backward" || direction == "forward",
      s"direction must be backward|forward, got $direction")
    val carry =
      if (rightCols.nonEmpty) rightCols
      else right.columns.toSeq.filterNot(c => keys.contains(c) || c == rightTs)

    // one unioned relation: __side 0 = right, 1 = left. Payloads travel as
    // structs (no column-name collisions); the right ts rides first in the
    // right payload for the tolerance check and deterministic tie order.
    val keyCols = keys.map(col)
    val rPayload = struct((col(rightTs).as("__rts") +: carry.map(col)): _*)
    val lPayload = struct(left.columns.map(col).toIndexedSeq: _*)
    val rPayloadType = right.select(rPayload.as("p")).schema("p").dataType
    val lPayloadType = left.select(lPayload.as("p")).schema("p").dataType
    val r = right.select(keyCols ++ Seq(col(rightTs).as("__t"), lit(0).as("__side"),
      rPayload.as("__r"), lit(null).cast(lPayloadType).as("__l")): _*)
    val l = left.select(keyCols ++ Seq(col(leftTs).as("__t"), lit(1).as("__side"),
      lit(null).cast(rPayloadType).as("__r"), lPayload.as("__l")): _*)

    // backward: ascending ts, right rows sort before left at equal ts so an
    // exact-ts right row is visible to the left row. forward: descending ts
    // reduces to the same running-window shape.
    val tsOrder = if (direction == "backward") col("__t").asc else col("__t").desc
    val w = Window.partitionBy(keyCols: _*)
      .orderBy(tsOrder, col("__side").asc, col("__r").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val matched = r.unionByName(l)
      .withColumn("__m", last(col("__r"), ignoreNulls = true).over(w))
      .filter(col("__side") === 1)

    val withinTol = tolerance match {
      case Some(tol) => when(col("__m").isNotNull &&
        abs(unix_micros(col("__l").getField(leftTs)) -
          unix_micros(col("__m").getField("__rts"))).leq(tol), col("__m"))
      case None => col("__m")
    }
    val out = matched.withColumn("__m", withinTol)
    val filtered = if (inner) out.filter(col("__m").isNotNull) else out
    filtered.select(
      left.columns.toIndexedSeq.map(c => col("__l").getField(c).as(c)) ++
        (col("__m").getField("__rts").as(rightPrefix + rightTs) +:
          carry.map(c => col("__m").getField(c).as(rightPrefix + c))): _*)
  }

  /** The NATIVE form of [[joinAsOf]] (backward, LEFT): plans through
    * [[graft.plans.AsOfJoinPlan]] into the custom
    * [[graft.plans.AsOfJoinExec]] sort-merge operator instead of the
    * union + running-window composition — same single shuffle, but each
    * side sorts its own narrow rows and the merge is a streamed
    * O(left + right) pass with one-row state (no union inflation, no
    * window frames). Value-identical to `joinAsOf` on right-unique
    * `(keys, ts)` inputs (AsOfNativeSpec pins the parity); requires the
    * session to carry [[graft.GraftExtensions]] (the planner strategy).
    *
    * Output: all left columns, then the matched right timestamp as
    * `rightPrefix + rightTs` and each carried right column prefixed.
    */
  def joinAsOfNative(
      left: DataFrame,
      right: DataFrame,
      keys: Seq[String],
      leftTs: String,
      rightTs: String,
      rightCols: Seq[String] = Seq.empty,
      rightPrefix: String = "right_"): DataFrame = {
    import org.apache.spark.sql.graft.ColumnBridge
    import org.apache.spark.sql.catalyst.expressions.Alias
    import org.apache.spark.sql.catalyst.plans.logical.Project
    val carry =
      if (rightCols.nonEmpty) rightCols
      else right.columns.toSeq.filterNot(c => keys.contains(c) || c == rightTs)
    // pre-rename the right side so the joined output has no name
    // collisions; the helper key columns drop at the end
    val r2 = right.select(
      keys.zipWithIndex.map { case (k, i) => col(k).as(s"__rk$i") } ++
        (col(rightTs).as(rightPrefix + rightTs) +:
          carry.map(c => col(c).as(rightPrefix + c))): _*)
    val lPlan = left.queryExecution.analyzed
    // re-alias every right attribute: fresh exprIds make the node safe
    // even when both sides derive from the same scan (self-as-of), the
    // dedup the analyzer would normally do at a Join node
    val rAnalyzed = r2.queryExecution.analyzed
    val rPlan = Project(
      rAnalyzed.output.map(a => Alias(a, a.name)()), rAnalyzed)
    val rOut = rPlan.output
    val lKeys = keys.map(k => lPlan.output.find(_.name == k).getOrElse(
      sys.error(s"left key '$k' not found")))
    val rKeys = keys.indices.map(i => rOut.find(_.name == s"__rk$i").get)
    val lTs = lPlan.output.find(_.name == leftTs).getOrElse(
      sys.error(s"left ts '$leftTs' not found"))
    val rTs = rOut.find(_.name == rightPrefix + rightTs).get
    // the merge operator compares timestamps as raw longs — accept only
    // long-backed types at PLAN time so a DateType/IntegerType ts fails
    // here with a named column instead of a ClassCastException at execute
    // (ADVICE r9); the composed joinAsOf stays the any-orderable-type form
    locally {
      import org.apache.spark.sql.types.{LongType, TimestampNTZType, TimestampType}
      Seq(("left", leftTs, lTs.dataType), ("right", rightTs, rTs.dataType))
        .foreach { case (side, name, dt) => dt match {
          case TimestampType | TimestampNTZType | LongType => ()
          case other => sys.error(
            s"joinAsOfNative requires a timestamp/long $side ts column; " +
              s"'$name' is $other — cast it or use joinAsOf")
        }}
    }
    val node = graft.plans.AsOfJoinPlan(lPlan, rPlan, lKeys, rKeys, lTs, rTs)
    ColumnBridge.ofRows(left.sparkSession, node)
      .drop(keys.indices.map(i => s"__rk$i"): _*)
  }

  /** Slowly-changing-dimension type-2 interval builder: collapse each
    * key's event stream into validity intervals of its tracked attribute —
    * one row per CHANGE, stamped `(valid_from, valid_to, version)`, with
    * the current value's `valid_to` null (open interval). Consecutive
    * events carrying the same attribute value merge into one interval
    * (the run-length collapse that makes a dimension history readable);
    * `version` counts changes per key from 1.
    *
    * Timestamps are carried as epoch values of whatever numeric the
    * caller's `tsCol` projection yields — project `col("ts").cast("long")`
    * for engine-portable seconds (see the events-table oracle note).
    *
    * Scale shape: two ranked windows over ONE shuffle on the key (change
    * detection via lag, interval close via lead on the filtered set —
    * both windows share partitioning and sort order, so Catalyst plans a
    * single Exchange + Sort). Ties on `ts` break by `idCol`: the interval
    * sequence is deterministic for any input. The reference carries
    * merchant/customer attributes but never builds history
    * (CustomerSpendingAnalysis.scala:82-88 projects the current values);
    * extension tier. */
  def scd2Intervals(
      df: DataFrame,
      keyCol: String,
      attrCol: String,
      ts: Column,
      id: Column): DataFrame = {
    val changed = df
      .withColumn("__ts", ts)
      .withColumn("__prev", lag(col(attrCol), 1).over(
        Window.partitionBy(col(keyCol)).orderBy(ts.asc, id.asc)))
      .filter(col("__prev").isNull || col("__prev") =!= col(attrCol))
    val wChanged = Window.partitionBy(col(keyCol)).orderBy(col("__ts").asc, id.asc)
    changed
      .withColumn("valid_from", col("__ts"))
      .withColumn("valid_to", lead(col("__ts"), 1).over(wChanged))
      .withColumn("version", row_number().over(wChanged).cast("long"))
      .select(col(keyCol), col(attrCol), col("valid_from"),
        col("valid_to"), col("version"))
  }
}
