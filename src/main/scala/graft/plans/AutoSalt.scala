package graft.plans

import org.apache.spark.sql.catalyst.expressions.{Alias, Attribute,
  AttributeReference, Expression, Literal, Murmur3Hash, NamedExpression, Pmod}
import org.apache.spark.sql.catalyst.expressions.aggregate.{AggregateExpression,
  Count, Max, Min, Sum}
import org.apache.spark.sql.catalyst.plans.logical.{Aggregate, LogicalPlan}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.{DecimalType, LongType}

/** Optimizer rule: stats-driven automatic salting of `count(DISTINCT v)`.
  *
  * **Default OFF — measurement, round 10.** The rule was built on the
  * classic claim that a distinct aggregate over few groups funnels every
  * value through one reducer per group. Spark 4's
  * `planAggregateWithOneDistinct` already defuses that shape structurally:
  * the first exchange partitions on `(keys, value)` (the dedupe
  * parallelizes over the value space) and the final exchange carries
  * partial COUNTS, never values. Measured at 20M rows / 8 groups / ~5M
  * distinct values, idle, local[32]: plain 3.1 s / 165 MB shuffled vs
  * salted 3.9 s / 237 MB (the `autosalt_*_20m` soak pair keeps the
  * comparison executed every round); the high-cardinality hot-key shape
  * (`skew_distinct_*_20m`) reads the same way (plain 4.5 s vs manually
  * salted 6.5 s). The salted inner aggregate is itself planned through
  * the same one-distinct machinery, so the rewrite can only ADD an
  * exchange in this engine. It stays in the tree as the stats-driven
  * plan-choice machinery (and as protection for engines/forks whose
  * distinct planning lacks the `(keys, value)` exchange), enabled
  * explicitly with `spark.graft.autoSalt.enabled=true`; the manual verb
  * remains [[graft.operators.Skew.saltedDistinct]]. The rewrite, when
  * enabled and proven by statistics:
  *
  * {{{
  *   Aggregate(keys, count(DISTINCT v), child)
  * =>
  *   Aggregate(keys, sum(pd),
  *     Aggregate(keys :+ pmod(hash(v), B), count(DISTINCT v) AS pd, child))
  * }}}
  *
  * Exact by construction: the salt is a pure function of `v`, so the
  * per-(key, salt) distinct sets partition the per-key distinct set —
  * their counts SUM to the per-key count, and every accompanying
  * decomposable aggregate (count/sum/min/max) re-aggregates losslessly.
  * The inner aggregate now groups by `ndv(keys) * B` keys: the value
  * stream fans out across the cluster and the outer pass reduces B
  * bounded longs per group.
  *
  * When enabled, the rule fires only when the statistics PROVE the shape
  * (stats come from ANALYZE TABLE; Filter/Project propagate them when
  * `spark.sql.cbo.enabled` is on):
  *  - `child` row count is known and >= `spark.graft.autoSalt.minRows`
  *    (default 10M — below that the single-reducer stage is cheap);
  *  - every grouping expression is a bare attribute whose distinct count
  *    is known, and their ndv PRODUCT <= `spark.graft.autoSalt.maxGroups`
  *    (default 1024) — many groups already parallelize, salting them
  *    would only add a shuffle;
  *  - exactly ONE distinct aggregate, a single-argument COUNT (the salt
  *    is a function of that argument; two distinct columns would need
  *    conflicting salts), no FILTER clauses anywhere;
  *  - every other aggregate is count/sum/min/max (sum not decimal — the
  *    outer re-sum would widen the result type) so the two-phase
  *    re-aggregation is type- and value-exact;
  *  - every output is a grouping attribute or an alias of exactly one
  *    aggregate call (composite projections keep their original plan).
  *
  * The outer aggregate reuses the original output ExprIds, so parents
  * resolve unchanged; the inner grouping contains a non-attribute salt
  * expression, which makes the rewritten node ineligible — the natural
  * fixed-point guard.
  */
object AutoSalt extends Rule[LogicalPlan] {

  private val SALT_NAME = "__graft_salt_pd"

  def apply(plan: LogicalPlan): LogicalPlan = {
    if (!conf.getConfString("spark.graft.autoSalt.enabled", "false").toBoolean)
      return plan
    val minRows =
      conf.getConfString("spark.graft.autoSalt.minRows", "10000000").toLong
    val maxGroups =
      conf.getConfString("spark.graft.autoSalt.maxGroups", "1024").toLong
    val buckets =
      conf.getConfString("spark.graft.autoSalt.buckets", "32").toInt
    plan.transformUp {
      case a: Aggregate if eligible(a, minRows, maxGroups) =>
        rewrite(a, buckets)
    }
  }

  /** The aggregate calls of one output alias, or None for pass-through
    * grouping attributes. */
  private def aggCallsOf(ne: NamedExpression): Seq[AggregateExpression] =
    ne.collect { case ae: AggregateExpression => ae }

  private def eligible(a: Aggregate, minRows: Long, maxGroups: Long): Boolean = {
    // shape first (cheap), stats last (computes a plan visitor pass)
    val groupAttrs = a.groupingExpressions.map {
      case attr: AttributeReference => attr
      case _ => return false // salt expr of a prior rewrite, or computed key
    }
    val aggAliases = a.aggregateExpressions.filterNot {
      case attr: Attribute => groupAttrs.exists(_.exprId == attr.exprId)
      case _ => false
    }
    // every non-key output: an Alias over exactly one aggregate call that
    // IS the alias child (no `count(distinct v) + 1` composites)
    val calls = aggAliases.map {
      case al @ Alias(ae: AggregateExpression, _) if al.collect {
        case x: AggregateExpression => x }.size == 1 => ae
      case _ => return false
    }
    if (calls.exists(_.filter.isDefined)) return false
    val (distincts, plains) = calls.partition(_.isDistinct)
    val distinctOk = distincts match {
      case Seq(AggregateExpression(Count(Seq(v)), _, true, _, _)) =>
        v.deterministic
      case _ => false
    }
    val plainsOk = plains.forall(_.aggregateFunction match {
      case _: Count | _: Min | _: Max => true
      case Sum(c, _) => !c.dataType.isInstanceOf[DecimalType]
      case _ => false
    })
    if (!distinctOk || !plainsOk) return false
    val st = a.child.stats
    val rowsOk = st.rowCount.exists(_ >= minRows)
    lazy val ndv = groupAttrs.foldLeft(Option(BigInt(1))) { (acc, attr) =>
      for {
        p <- acc
        cs <- st.attributeStats.get(attr)
        dc <- cs.distinctCount
      } yield p * dc
    }
    rowsOk && ndv.exists(_ <= maxGroups)
  }

  private def rewrite(a: Aggregate, buckets: Int): LogicalPlan = {
    val groupAttrs = a.groupingExpressions.map(_.asInstanceOf[AttributeReference])
    def isKey(ne: NamedExpression): Boolean = ne match {
      case attr: Attribute => groupAttrs.exists(_.exprId == attr.exprId)
      case _ => false
    }
    val distinctArg = a.aggregateExpressions.collectFirst {
      case Alias(AggregateExpression(Count(Seq(v)), _, true, _, _), _) => v
    }.get
    val salt = Pmod(new Murmur3Hash(Seq(distinctArg)), Literal(buckets))
    // inner: one partial per original aggregate alias, SAME functions
    // (count-distinct stays a count-distinct — now over ndv*B groups)
    val partials = a.aggregateExpressions.zipWithIndex.collect {
      case (Alias(ae: AggregateExpression, name), i) =>
        Alias(ae, s"${SALT_NAME}_${i}_$name")()
    }
    val inner = Aggregate(
      (groupAttrs: Seq[Expression]) :+ salt,
      (groupAttrs: Seq[NamedExpression]) ++ partials,
      a.child)
    // outer: re-aggregate each partial under the ORIGINAL alias/ExprId
    var pi = -1
    val outerExprs: Seq[NamedExpression] = a.aggregateExpressions.map {
      case ne if isKey(ne) => ne
      case al @ Alias(ae: AggregateExpression, name) =>
        pi += 1
        val p = partials(pi).toAttribute
        val re = ae.aggregateFunction match {
          case _: Count => Sum(p) // counts re-add (Sum(long) stays long)
          case _: Sum => Sum(p)
          case _: Min => Min(p)
          case _: Max => Max(p)
          case other => sys.error(s"unreachable: $other passed eligibility")
        }
        Alias(re.toAggregateExpression(), name)(exprId = al.exprId)
      case other => sys.error(s"unreachable: $other passed eligibility")
    }
    Aggregate(groupAttrs, outerExprs, inner)
  }
}
