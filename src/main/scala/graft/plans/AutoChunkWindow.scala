package graft.plans

import org.apache.spark.sql.catalyst.expressions.{Add, Alias, And, Ascending,
  AttributeReference, Cast, Coalesce, CurrentRow, Divide, EqualTo, Expression,
  Floor, Greatest, If, IsNull, Least, Literal, NamedExpression, RowFrame,
  SortOrder, SpecifiedWindowFrame, Subtract, UnboundedPreceding,
  WindowExpression, WindowSpecDefinition}
import org.apache.spark.sql.catalyst.expressions.aggregate.{AggregateExpression, Sum}
import org.apache.spark.sql.catalyst.plans.Inner
import org.apache.spark.sql.catalyst.plans.logical.{Aggregate, Join, JoinHint,
  LogicalPlan, Project, Window}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.{ByteType, DecimalType, DoubleType,
  FloatType, IntegerType, LongType, ShortType}

/** Optimizer rule: HOT-KEY running windows re-planned as the chunk
  * decomposition — the automatic form of
  * [[graft.operators.Skew.runningAggChunked]].
  *
  * The target pathology is real and measured (unlike the distinct-agg one
  * [[AutoSalt]] was built for and honestly retired from): a running frame
  *
  *   sum(v) OVER (PARTITION BY k ORDER BY o ROWS UNBOUNDED PRECEDING)
  *
  * plans as ONE task per key — Spark sorts each partition-key group and
  * scans it serially, so the hottest key IS the stage wall clock, and
  * neither AQE (joins only) nor partial aggregation (combinable
  * aggregates only) can split it. The `window_skew_{plain,chunked}_20m` soak measures a
  * 60%-hot key at 20M rows: plain max task 6.8-7.6 s (~= the stage),
  * chunked 2.0-2.1 s.
  *
  * The rewrite is the exact associative decomposition (same algebra as
  * the manual verb, same null discipline):
  *
  *   chunk    = clamp(floor((o - lo) / span), 0, C-1)    — monotone in o
  *   totals   = sum(v) GROUP BY (k, chunk)
  *   offset   = sum(totals) OVER (PARTITION k ORDER chunk ROWS ..-1)
  *   local    = sum(v) OVER (PARTITION (k, chunk) ORDER o ROWS ..CURRENT)
  *   result   = both-null ? null : coalesce(local,0) + coalesce(offset,0)
  *
  * `lo`/`span` come from the ORDER column's ANALYZE statistics — stale
  * stats only unbalance the chunks (the clamp keeps monotonicity), never
  * the answer. The rule fires only when statistics PROVE a hot key:
  *
  *  - `spark.graft.autoChunk.enabled` (default true — it can only fire
  *    on ANALYZE'd, cbo-on inputs with a proven hot key);
  *  - child rowCount >= `minRows` (default 10M);
  *  - ORDER BY: single ascending bare attribute of a plain numeric type
  *    (timestamps: project an epoch column first — stats for internal
  *    timestamp micros don't match a double cast), with min/max stats;
  *  - hotness: rowCount / ndv(keys) >= `perKeyRows` (default 1M — the
  *    average key alone overwhelms one task; covers the no-keys global
  *    window with ndv = 1), OR a single-key equi-height histogram shows
  *    one value holding >= `hotShare` (default 0.2) of the rows;
  *  - exactly one window expression: non-distinct unfiltered SUM over a
  *    non-decimal deterministic argument, ROWS UNBOUNDED..CURRENT frame.
  *
  * The emitted alias reuses the original ExprId, so parents resolve
  * unchanged; the local window's partition spec contains the chunk
  * column, which no longer matches the pattern — the fixed-point guard.
  */
object AutoChunkWindow extends Rule[LogicalPlan] {

  private val C_NAME = "__graft_chunk"

  def apply(plan: LogicalPlan): LogicalPlan = {
    if (!conf.getConfString("spark.graft.autoChunk.enabled", "true").toBoolean)
      return plan
    val minRows =
      conf.getConfString("spark.graft.autoChunk.minRows", "10000000").toLong
    val perKeyRows =
      conf.getConfString("spark.graft.autoChunk.perKeyRows", "1000000").toLong
    val hotShare =
      conf.getConfString("spark.graft.autoChunk.hotShare", "0.2").toDouble
    val chunks =
      conf.getConfString("spark.graft.autoChunk.chunks", "32").toInt
    plan.transformUp {
      case w @ Window(Seq(alias @ Alias(WindowExpression(
            ae: AggregateExpression,
            WindowSpecDefinition(partSpec, Seq(so @ SortOrder(
              ord: AttributeReference, Ascending, _, _)),
              frame @ SpecifiedWindowFrame(_, UnboundedPreceding, CurrentRow))),
            _)), _, _, child, _)
          if aggArg(ae).exists { case (kind, v) => typeOk(kind, v) && eligible(
            w, v, ord, partSpec, child, minRows, perKeyRows, hotShare) } =>
        rewrite(child, alias, ae, aggArg(ae).get._1, aggArg(ae).get._2,
          so, frame, ord,
          partSpec.map(_.asInstanceOf[AttributeReference]), chunks)
    }
  }

  /** The decomposable running aggregates: (kind, argument), or None.
    * A RANGE frame decomposes just as exactly as ROWS here — the chunk is
    * monotone in the ORDER column, so tied rows (peers) can never straddle
    * a chunk boundary, and the chunk-local window replays the original
    * frame verbatim. */
  private def aggArg(ae: AggregateExpression): Option[(String, Expression)] =
    if (ae.isDistinct || ae.filter.isDefined) None
    else ae.aggregateFunction match {
      case Sum(v, _) => Some(("sum", v))
      case org.apache.spark.sql.catalyst.expressions.aggregate.Min(v) =>
        Some(("min", v))
      case org.apache.spark.sql.catalyst.expressions.aggregate.Max(v) =>
        Some(("max", v))
      case _ => None
    }

  private def numeric(dt: org.apache.spark.sql.types.DataType): Boolean =
    dt match {
      case ByteType | ShortType | IntegerType | LongType |
           FloatType | DoubleType => true
      case _ => false
    }

  private def statDouble(v: Any): Option[Double] = v match {
    case i: Int => Some(i.toDouble)
    case l: Long => Some(l.toDouble)
    case s: Short => Some(s.toDouble)
    case b: Byte => Some(b.toDouble)
    case f: Float => Some(f.toDouble)
    case d: Double => Some(d)
    case _ => None
  }

  /** Sum re-adds across chunks — plain numerics only (a decimal re-sum
    * would widen the result type, an interval needs its own zero); min and
    * max never re-combine values into new ones, so any analyzed (hence
    * orderable) type is safe. */
  private def typeOk(kind: String, v: Expression): Boolean =
    kind != "sum" || numeric(v.dataType)

  private def eligible(
      w: Window, v: Expression, ord: AttributeReference,
      partSpec: Seq[Expression], child: LogicalPlan,
      minRows: Long, perKeyRows: Long, hotShare: Double): Boolean = {
    if (!v.deterministic) return false
    if (!numeric(ord.dataType)) return false
    val pk = partSpec.map {
      case a: AttributeReference => a
      case _ => return false
    }
    val st = child.stats
    val rows = st.rowCount.getOrElse(return false)
    if (rows < minRows) return false
    // the chunk function needs the ORDER column's real range
    val ordOk = st.attributeStats.get(ord).exists(cs =>
      cs.min.flatMap(statDouble).isDefined &&
        cs.max.flatMap(statDouble).isDefined)
    if (!ordOk) return false
    // hotness, signal 1: the AVERAGE key already overwhelms one task
    val ndv = pk.foldLeft(Option(BigInt(1))) { (acc, a) =>
      for (p <- acc; cs <- st.attributeStats.get(a); dc <- cs.distinctCount)
        yield p * dc
    }
    val avgHot = ndv.exists(d => d > 0 && BigInt(rows.toLong) / d >= perKeyRows)
    // hotness, signal 2: a single-key equi-height histogram names a value
    // holding >= hotShare of the rows (a heavy hitter shows up as repeated
    // single-point bins: lo == hi == the value)
    lazy val histHot = pk match {
      case Seq(k) => st.attributeStats.get(k).flatMap(_.histogram).exists { h =>
        val pointBins = h.bins.filter(b => b.lo == b.hi)
          .groupBy(_.lo).view.mapValues(_.length).values
        pointBins.nonEmpty &&
          pointBins.max * h.height / rows.toDouble >= hotShare
      }
      case _ => false
    }
    avgHot || histHot
  }

  private def rewrite(
      child: LogicalPlan, alias: Alias, ae: AggregateExpression,
      kind: String, v: Expression, so: SortOrder,
      frame: SpecifiedWindowFrame, ord: AttributeReference,
      pk: Seq[AttributeReference], chunks: Int): LogicalPlan = {
    import org.apache.spark.sql.catalyst.expressions.aggregate.{Max, Min}
    def aggFn(e: Expression) = (kind match {
      case "sum" => Sum(e)
      case "min" => Min(e)
      case _ => Max(e)
    }).toAggregateExpression()
    val st = child.stats
    val cs = st.attributeStats(ord)
    val lo = statDouble(cs.min.get).get
    val hi = statDouble(cs.max.get).get
    // stale stats only unbalance: values beyond [lo, hi] clamp to the
    // edge chunks and monotonicity holds
    val span = if (hi > lo) (hi - lo) / chunks else 1.0
    val chunkExpr = Least(Seq(
      Greatest(Seq(
        Cast(Floor(Divide(
          Subtract(Cast(ord, DoubleType), Literal(lo, DoubleType)),
          Literal(span, DoubleType))), IntegerType),
        Literal(0))),
      Literal(chunks - 1)))
    val chunkAlias = Alias(chunkExpr, C_NAME)()
    val proj1 = Project(child.output :+ chunkAlias, child)
    val chunkAttr = chunkAlias.toAttribute
    // per-(key, chunk) totals under the SAME aggregate
    val ctAlias = Alias(aggFn(v), s"${C_NAME}_ct")()
    val totals = Aggregate(
      (pk: Seq[Expression]) :+ chunkAttr,
      (pk: Seq[NamedExpression]) :+ chunkAttr.asInstanceOf[NamedExpression]
        :+ ctAlias, proj1)
    // exclusive running offset over the <= chunks rows per key
    val offWe = WindowExpression(
      aggFn(ctAlias.toAttribute),
      WindowSpecDefinition(pk, Seq(SortOrder(chunkAttr, Ascending)),
        SpecifiedWindowFrame(RowFrame, UnboundedPreceding, Literal(-1))))
    val offAlias = Alias(offWe, s"${C_NAME}_off")()
    val offWin = Window(Seq(offAlias), pk, Seq(SortOrder(chunkAttr, Ascending)),
      totals, None)
    // fresh-id projection of the offsets side: it derives from the same
    // child, so the join condition must not reuse the left side's attrs
    val rKeys = pk.map(a => Alias(a, a.name + "_r")())
    val rChunk = Alias(chunkAttr, C_NAME + "_r")()
    val rOff = Alias(offAlias.toAttribute, C_NAME + "_off_r")()
    val offSide = Project(rKeys ++ Seq(rChunk, rOff), offWin)
    // chunk-local running aggregate over the full-width rows — the
    // ORIGINAL frame (ROWS or RANGE) and sort order replay within the
    // (key, chunk) partition; RANGE peers can't straddle chunks because
    // the chunk is a function of the ORDER value
    val locWe = WindowExpression(ae,
      WindowSpecDefinition((pk: Seq[Expression]) :+ chunkAttr,
        Seq(so), frame))
    val locAlias = Alias(locWe, s"${C_NAME}_loc")()
    val locWin = Window(Seq(locAlias), (pk: Seq[Expression]) :+ chunkAttr,
      Seq(so), proj1, None)
    val cond = (pk.zip(rKeys).map { case (l, r) =>
      EqualTo(l, r.toAttribute): Expression } :+
      (EqualTo(chunkAttr, rChunk.toAttribute): Expression))
      .reduce(And(_, _))
    val joined = Join(locWin, offSide, Inner, Some(cond), JoinHint.NONE)
    // the window aggregate's null discipline: sum is null only when BOTH
    // sides are null (explicit guard); least/greatest skip nulls natively
    val loc = locAlias.toAttribute
    val off = rOff.toAttribute
    val combined = kind match {
      case "sum" =>
        val zero = Literal.default(loc.dataType)
        If(And(IsNull(loc), IsNull(off)),
          Literal.create(null, loc.dataType),
          Add(Coalesce(Seq(loc, zero)), Coalesce(Seq(off, zero))))
      case "min" => Least(Seq(loc, off))
      case _ => Greatest(Seq(loc, off))
    }
    Project(child.output :+
      Alias(combined, alias.name)(exprId = alias.exprId), joined)
  }
}
