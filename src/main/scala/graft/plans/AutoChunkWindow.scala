package graft.plans

import org.apache.spark.sql.catalyst.expressions.{Add, Alias, And, Ascending,
  AttributeReference, Cast, Coalesce, CurrentRow, Divide, EqualNullSafe,
  EqualTo, Expression, Floor, Greatest, If, IsNull, Least, Literal,
  NamedExpression, NullsFirst, RowFrame, SortOrder, SpecifiedWindowFrame,
  Subtract, UnboundedPreceding, WindowExpression, WindowSpecDefinition}
import org.apache.spark.sql.catalyst.expressions.aggregate.{AggregateExpression,
  AggregateFunction, Average, Count, Sum}
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
  *  - ORDER BY: single ascending NULLS FIRST bare attribute of a plain
  *    numeric type (timestamps: project an epoch column first — stats for
  *    internal timestamp micros don't match a double cast), with min/max
  *    stats. NULLS LAST is excluded by pattern: the chunk function sends a
  *    NULL ord to chunk 0 (nulls-FIRST placement), so a NULLS LAST window
  *    would mis-order null-ord rows AND leak their values into every later
  *    chunk's offset;
  *  - hotness: rowCount / ndv(keys) >= `perKeyRows` (default 1M — the
  *    average key alone overwhelms one task; covers the no-keys global
  *    window with ndv = 1), OR a single-key equi-height histogram shows
  *    one value holding >= `hotShare` (default 0.2) of the rows;
  *  - EVERY window expression in the node decomposes: non-distinct
  *    unfiltered SUM / MIN / MAX / COUNT / AVG over a deterministic
  *    argument (ROWS or RANGE UNBOUNDED..CURRENT frame), ROW_NUMBER
  *    (= the running count of a constant, cast back to int — the "latest
  *    record per key" dedup idiom, whose hot key is THE classic straggler
  *    at ingest scale), or LAG/LEAD in SQL-default form (null default,
  *    respect-nulls, positive literal offset: the sequence number comes
  *    from the chunked running count and the navigation is ONE skew-free
  *    LEFT self-join on (key, sequence ± n) — join keys unique per row,
  *    so no task ever holds a hot key's history), all over the same
  *    partition keys and ORDER column (one non-decomposable expression
  *    leaves the whole node plain — a half-rewritten node would window
  *    twice for nothing).
  *    SUM arguments must be INTEGRAL (byte/short/int/long): the chunk
  *    decomposition re-associates addition, so a Float/Double sum could
  *    differ from the serial window in the last ulps — the manual verb's
  *    exactness contract is integer-typed values, and a default-ON rule
  *    must never alter an answer. FP sums opt in via
  *    `spark.graft.autoChunk.allowFloat` (default false) with that
  *    documented last-ulps tolerance. Min/max never re-combine values
  *    into new ones, so any analyzed numeric type is safe there; count
  *    re-combines exact longs. AVG decomposes into an exact running
  *    SUM + COUNT and replays Average's own `sum/count` division — fired
  *    only when column stats PROVE `rowCount * max|v| < 2^53` (see
  *    [[avgExact]]), the range where the serial window's double
  *    accumulation is itself exact, so the rewrite stays bit-identical.
  *
  * Key equality in the assembled join is NULL-SAFE (<=>): a NULL
  * partition key is a normal window partition and must survive the
  * rewrite — EqualTo would silently drop every NULL-key row.
  *
  * The emitted aliases reuse the original ExprIds, so parents resolve
  * unchanged; the local window's partition spec contains the chunk
  * column, which no longer matches the pattern — the fixed-point guard.
  */
object AutoChunkWindow extends Rule[LogicalPlan] {

  private val C_NAME = "__graft_chunk"

  /** One decomposable window expression, destructured. `ae` is the
    * original AggregateExpression where one exists (replayed verbatim in
    * the local window); row_number and lag/lead have none — their legs
    * are fresh counts, like avg's legs. `shift` is lag/lead's donor
    * displacement: a donor row at sequence p serves the row at sequence
    * p + shift (lag(n): +n; lead(n): -n; 0 for every other kind). */
  private case class Decomposed(
      alias: Alias, ae: Option[AggregateExpression], kind: String, v: Expression,
      so: SortOrder, frame: SpecifiedWindowFrame, ord: AttributeReference,
      partSpec: Seq[Expression], shift: Long = 0L)

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
    val allowFloat =
      conf.getConfString("spark.graft.autoChunk.allowFloat", "false").toBoolean
    plan.transformUp {
      case w @ Window(exprs, _, _, child, _) if exprs.nonEmpty &&
          decomposeAll(exprs, allowFloat).exists { ds =>
            val d = ds.head
            eligible(d.v, d.ord, d.partSpec, child, minRows, perKeyRows,
              hotShare) &&
              ds.tail.forall(_.v.deterministic) &&
              ds.forall(avgExact(_, child, allowFloat))
          } =>
        val ds = decomposeAll(exprs, allowFloat).get
        rewrite(child, ds, ds.head.ord,
          ds.head.partSpec.map(_.asInstanceOf[AttributeReference]), chunks)
    }
  }

  /** Destructure EVERY window expression of the node, or None if any one
    * fails to match the decomposable shape or the specs disagree (they
    * must share the partition keys and the ORDER attribute — Spark groups
    * expressions into one Window node by (partitionSpec, orderSpec), so
    * this holds for planner-built nodes; hand-built ones get checked). */
  private def decomposeAll(
      exprs: Seq[NamedExpression], allowFloat: Boolean): Option[Seq[Decomposed]] = {
    val ds = exprs.map {
      case alias @ Alias(WindowExpression(
            ae: AggregateExpression,
            WindowSpecDefinition(partSpec, Seq(so @ SortOrder(
              ord: AttributeReference, Ascending, NullsFirst, _)),
              frame @ SpecifiedWindowFrame(_, UnboundedPreceding, CurrentRow))),
            _)
          if aggArg(ae).exists { case (kind, v) =>
            typeOk(kind, v, allowFloat) } &&
            partSpec.forall(_.isInstanceOf[AttributeReference]) =>
        val (kind, v) = aggArg(ae).get
        Some(Decomposed(alias, Some(ae), kind, v, so, frame, ord, partSpec))
      // row_number() = the running count of a constant, cast back to int
      // at the end. Under tied ords it is nondeterministic-within-peers
      // exactly as the serial window is (ties share a chunk — the chunk is
      // a monotone function of the ORDER value — so the arbitrariness
      // class is unchanged).
      case alias @ Alias(WindowExpression(
            org.apache.spark.sql.catalyst.expressions.RowNumber(),
            WindowSpecDefinition(partSpec, Seq(so @ SortOrder(
              ord: AttributeReference, Ascending, NullsFirst, _)),
              frame @ SpecifiedWindowFrame(RowFrame, UnboundedPreceding,
                CurrentRow))), _)
          if partSpec.forall(_.isInstanceOf[AttributeReference]) =>
        Some(Decomposed(alias, None, "rownum", Literal(1), so, frame, ord,
          partSpec))
      // lag/lead: SQL-default form only (null default, respect-nulls,
      // positive literal offset). The matched offset frame is NOT stored —
      // the count leg runs the RUNNING frame to build sequence numbers,
      // and the donor join does the navigation.
      case alias @ Alias(WindowExpression(
            f: org.apache.spark.sql.catalyst.expressions.FrameLessOffsetWindowFunction,
            WindowSpecDefinition(partSpec, Seq(so @ SortOrder(
              ord: AttributeReference, Ascending, NullsFirst, _)), _)), _)
          if partSpec.forall(_.isInstanceOf[AttributeReference]) &&
            navShift(f).isDefined =>
        val (in, shift) = navShift(f).get
        Some(Decomposed(alias, None, "lag", in, so,
          SpecifiedWindowFrame(RowFrame, UnboundedPreceding, CurrentRow),
          ord, partSpec, shift))
      case _ => None
    }
    if (ds.exists(_.isEmpty)) return None
    val all = ds.map(_.get)
    val h = all.head
    val consistent = all.tail.forall { d =>
      d.ord.semanticEquals(h.ord) &&
        d.partSpec.length == h.partSpec.length &&
        d.partSpec.zip(h.partSpec).forall { case (a, b) => a.semanticEquals(b) }
    }
    if (consistent) Some(all) else None
  }

  /** lag/lead in their SQL-default form: (input, donor shift), or None.
    * A donor row at sequence p serves the row at sequence p + shift —
    * lag(v, n) reads n rows back (+n), lead(v, n) reads n ahead (-n).
    * Non-literal/non-positive offsets, explicit defaults and IGNORE NULLS
    * keep the serial window (each changes the algebra). */
  private def navShift(f: Expression): Option[(Expression, Long)] = f match {
    case org.apache.spark.sql.catalyst.expressions.Lag(
          in, Literal(n: Int, IntegerType), Literal(null, _), false)
        if n > 0 && in.deterministic =>
      Some((in, n.toLong))
    case org.apache.spark.sql.catalyst.expressions.Lead(
          in, Literal(n: Int, IntegerType), Literal(null, _), false)
        if n > 0 && in.deterministic =>
      Some((in, -n.toLong))
    case _ => None
  }

  /** The decomposable running aggregates: (kind, argument), or None.
    * A RANGE frame decomposes just as exactly as ROWS here — the chunk is
    * monotone in the ORDER column, so tied rows (peers) can never straddle
    * a chunk boundary, and the chunk-local window replays the original
    * frame verbatim. Count decomposes with a SUM on the offset side (chunk
    * totals are counts; re-combining counts is addition of exact longs),
    * covering both count(v) and the count(*)/count(1) literal form. */
  private def aggArg(ae: AggregateExpression): Option[(String, Expression)] =
    if (ae.isDistinct || ae.filter.isDefined) None
    else ae.aggregateFunction match {
      case Sum(v, _) => Some(("sum", v))
      case Count(Seq(v)) => Some(("count", v))
      case Average(v, _) => Some(("avg", v))
      case org.apache.spark.sql.catalyst.expressions.aggregate.Min(v) =>
        Some(("min", v))
      case org.apache.spark.sql.catalyst.expressions.aggregate.Max(v) =>
        Some(("max", v))
      case _ => None
    }

  private def integral(dt: org.apache.spark.sql.types.DataType): Boolean =
    dt match {
      case ByteType | ShortType | IntegerType | LongType => true
      case _ => false
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

  /** Sum (and avg, which re-adds internally) re-add across chunks —
    * INTEGRAL types only by default (FP addition is non-associative, so a
    * rewritten double sum could change ulps; decimals would widen the
    * result type; intervals need their own zero). `allowFloat` opts
    * Float/Double sums in with a documented last-ulps tolerance. Min and
    * max never re-combine values into new ones, so any analyzed (hence
    * orderable) type is safe. */
  private def typeOk(kind: String, v: Expression, allowFloat: Boolean): Boolean =
    (kind != "sum" && kind != "avg") || integral(v.dataType) ||
      (allowFloat && numeric(v.dataType))

  /** Integral AVG needs one proof sum/count don't: the serial window's
    * Average accumulates its sum in a DOUBLE buffer (`sum + cast(v as
    * double)` per row), so the serial sum is exact ONLY while every
    * partial sum stays under 2^53 — inside that range integer-valued
    * double addition is exact, and the decomposed exact-long sum cast to
    * double is bit-identical to it (the final `sum/count` division then
    * matches bit for bit). Every partial sum is bounded by
    * `rowCount * max(|min|, |max|)`, so column stats can PROVE the bound;
    * no proof (missing stats, non-attribute argument, or a bound >= 2^53)
    * means no rewrite — unless `allowFloat` already accepted a
    * last-ulps tolerance. */
  private def avgExact(
      d: Decomposed, child: LogicalPlan, allowFloat: Boolean): Boolean =
    d.kind != "avg" || allowFloat || (d.v match {
      case a: AttributeReference =>
        val st = child.stats
        (for {
          rc <- st.rowCount
          cs <- st.attributeStats.get(a)
          mn <- cs.min.flatMap(statDouble)
          mx <- cs.max.flatMap(statDouble)
        } yield BigDecimal(rc) * BigDecimal(math.max(math.abs(mn), math.abs(mx))) <
          BigDecimal(2).pow(53)).getOrElse(false)
      case _ => false
    })

  private def eligible(
      v: Expression, ord: AttributeReference,
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

  /** One physical aggregate column of the decomposition. An expression
    * contributes one leg (sum/min/max/count run themselves through the
    * chunk machinery) or two (avg decomposes into an exact running SUM
    * and COUNT whose final division replays Average's own
    * `sum/count` evaluation). */
  private case class Leg(kind: String, v: Expression)

  private def legsOf(d: Decomposed): Seq[Leg] = d.kind match {
    case "avg" => Seq(Leg("sum", d.v), Leg("count", d.v))
    // both need the per-key SEQUENCE NUMBER = running count of a constant
    // (lag's d.v is the navigated value — the donor join reads it; the
    // leg only builds sequence numbers)
    case "rownum" | "lag" => Seq(Leg("count", Literal(1)))
    case k => Seq(Leg(k, d.v))
  }

  private def rewrite(
      child: LogicalPlan, ds: Seq[Decomposed], ord: AttributeReference,
      pk: Seq[AttributeReference], chunks: Int): LogicalPlan = {
    import org.apache.spark.sql.catalyst.expressions.aggregate.{Max, Min}
    def aggFn(kind: String, e: Expression) = (kind match {
      case "sum" => Sum(e)
      case "count" => Count(Seq(e))
      case "min" => Min(e)
      case _ => Max(e)
    }).toAggregateExpression()
    // the offset side re-combines CHUNK TOTALS — for count that is a SUM
    // of the per-chunk counts, not a count of them
    def offKind(kind: String) = if (kind == "count") "sum" else kind
    // every leg of every expression, flat with its parent; expression j's
    // legs sit at flat positions [legOffsets(j), legOffsets(j+1)) in the
    // ct/off/loc alias sequences. Non-avg legs replay the ORIGINAL
    // AggregateExpression in the local window (exact evalMode and all);
    // avg legs get fresh Sum/Count — the division happens once at the end.
    val flat: Seq[(Decomposed, Leg)] =
      ds.flatMap(d => legsOf(d).map(l => (d, l)))
    val legOffsets = ds.map(legsOf(_).length).scanLeft(0)(_ + _)
    def localAgg(d: Decomposed, l: Leg): AggregateExpression =
      d.ae.filter(_ => d.kind != "avg").getOrElse(aggFn(l.kind, l.v))
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
    // per-(key, chunk) totals under the SAME aggregates, one per leg
    val ctAliases = flat.zipWithIndex.map { case ((_, l), i) =>
      Alias(aggFn(l.kind, l.v), s"${C_NAME}_ct_$i")()
    }
    val totals = Aggregate(
      (pk: Seq[Expression]) :+ chunkAttr,
      (pk: Seq[NamedExpression]) :+ chunkAttr.asInstanceOf[NamedExpression]
        :++ ctAliases, proj1)
    // exclusive running offsets over the <= chunks rows per key — all the
    // legs share one Window node (same spec, same sort)
    val offAliases = flat.zip(ctAliases).zipWithIndex.map { case (((_, l), ct), i) =>
      Alias(WindowExpression(
        aggFn(offKind(l.kind), ct.toAttribute),
        WindowSpecDefinition(pk, Seq(SortOrder(chunkAttr, Ascending)),
          SpecifiedWindowFrame(RowFrame, UnboundedPreceding, Literal(-1)))),
        s"${C_NAME}_off_$i")()
    }
    val offWin = Window(offAliases, pk, Seq(SortOrder(chunkAttr, Ascending)),
      totals, None)
    // fresh-id projection of the offsets side: it derives from the same
    // child, so the join condition must not reuse the left side's attrs
    val rKeys = pk.map(a => Alias(a, a.name + "_r")())
    val rChunk = Alias(chunkAttr, C_NAME + "_r")()
    val rOffs = offAliases.zipWithIndex.map { case (o, i) =>
      Alias(o.toAttribute, s"${C_NAME}_off_r_$i")()
    }
    val offSide = Project(rKeys ++ Seq(rChunk) ++ rOffs, offWin)
    // chunk-local running aggregates over the full-width rows — each leg
    // replays its expression's ORIGINAL frame (ROWS or RANGE) and sort
    // order within the (key, chunk) partition; RANGE peers can't straddle
    // chunks because the chunk is a function of the ORDER value
    val locAliases = flat.zipWithIndex.map { case ((d, l), i) =>
      Alias(WindowExpression(localAgg(d, l),
        WindowSpecDefinition((pk: Seq[Expression]) :+ chunkAttr,
          Seq(d.so), d.frame)), s"${C_NAME}_loc_$i")()
    }
    val locWin = Window(locAliases, (pk: Seq[Expression]) :+ chunkAttr,
      Seq(ds.head.so), proj1, None)
    // NULL-SAFE key equality: a NULL partition key is a normal window
    // partition — EqualTo would drop its rows. The chunk attribute is
    // non-null by construction (Greatest skips the NULL a null ord feeds
    // it and clamps to 0), so plain EqualTo is exact there.
    val cond = (pk.zip(rKeys).map { case (l, r) =>
      EqualNullSafe(l, r.toAttribute): Expression } :+
      (EqualTo(chunkAttr, rChunk.toAttribute): Expression))
      .reduce(And(_, _))
    val joined = Join(locWin, offSide, Inner, Some(cond), JoinHint.NONE)
    // the window aggregate's null discipline: sum is null only when BOTH
    // sides are null (explicit guard); least/greatest skip nulls natively
    def combineLeg(kind: String, loc: Expression, off: Expression): Expression =
      kind match {
        case "sum" =>
          val zero = Literal.default(loc.dataType)
          If(And(IsNull(loc), IsNull(off)),
            Literal.create(null, loc.dataType),
            Add(Coalesce(Seq(loc, zero)), Coalesce(Seq(off, zero))))
        // a running count is never null; only the absent first-chunk
        // offset needs a zero — counts ADD across chunks (greatest would
        // take the larger side and undercount every chunk past the first)
        case "count" => Add(loc, Coalesce(Seq(off, Literal(0L))))
        case "min" => Least(Seq(loc, off))
        case _ => Greatest(Seq(loc, off))
      }
    // Per expression: lag gets an INTERNAL sequence-number alias (the
    // donor join below resolves its value); everything else combines to
    // its final alias (original ExprId) right here.
    val combined: Seq[(Decomposed, Alias, Boolean)] = ds.zipWithIndex.map {
      case (d, j) =>
        val base = legOffsets(j)
        def loc(i: Int) = locAliases(base + i).toAttribute
        def off(i: Int) = rOffs(base + i).toAttribute
        val c = d.kind match {
          case "avg" =>
            // replay Average's own evaluation on the exact running sum and
            // count: Divide(sum cast double, count cast double) — null on a
            // zero count (all-null prefix), bit-identical under the 2^53
            // proof because the serial double accumulation is exact there.
            // LEGACY eval mode exactly as Average.evaluateExpression uses:
            // a zero count must yield null, not an ANSI divide-by-zero
            val s = combineLeg("sum", loc(0), off(0))
            val n = combineLeg("count", loc(1), off(1))
            Divide(Cast(Coalesce(Seq(s, Literal.default(s.dataType))), DoubleType),
              Cast(n, DoubleType),
              org.apache.spark.sql.catalyst.expressions.NumericEvalContext(
                org.apache.spark.sql.catalyst.expressions.EvalMode.LEGACY))
          // row_number: the combined running count, back to RowNumber's int
          case "rownum" =>
            Cast(combineLeg("count", loc(0), off(0)), IntegerType)
          // lag: the combined running count IS the sequence number the
          // donor join navigates on (its leg is a count — combine as one)
          case "lag" =>
            combineLeg("count", loc(0), off(0))
          case k => combineLeg(k, loc(0), off(0))
        }
        if (d.kind == "lag")
          (d, Alias(c, s"${C_NAME}_ridx_$j")(), true)
        else
          (d, Alias(c, d.alias.name)(exprId = d.alias.exprId), false)
    }
    val lags = combined.filter(_._3)
    if (lags.isEmpty)
      return Project(child.output ++ combined.map(_._2), joined)

    // Navigation via skew-free self-join: `mid` carries every row with its
    // per-key sequence number; a donor row at sequence p serves the row at
    // sequence p + shift, so lag(v, n) at sequence r reads the donor with
    // p + n = r. Join keys (key, sequence) are UNIQUE PER ROW — no task
    // ever holds a hot key's history, no matter how hot. LEFT join: the
    // first n rows per key have no donor = the SQL null default. One join
    // per distinct shift serves every lag/lead expression with that shift.
    // The donor side is a fresh-alias projection over the SAME `mid`
    // subtree — the offSide pattern again.
    val mid = Project(child.output ++ combined.map(_._2), joined)
    val ridxOf: Map[Alias, AttributeReference] = lags.map { case (d, a, _) =>
      a -> a.toAttribute.asInstanceOf[AttributeReference] }.toMap
    var cur: LogicalPlan = mid
    val lagValue = scala.collection.mutable.Map.empty[Long, Alias]
    lags.groupBy(_._1.shift).foreach { case (shift, group) =>
      val rK2 = pk.map(a => Alias(a, s"${a.name}_d$shift")())
      val target = Alias(Add(ridxOf(group.head._2), Literal(shift)),
        s"${C_NAME}_dtarget_$shift")()
      val vals = group.map { case (d, _, _) =>
        d -> Alias(d.v, s"${C_NAME}_lv_${d.alias.exprId.id}")() }
      val donor = Project(rK2 ++ Seq(target) ++ vals.map(_._2), mid)
      val cond2 = (pk.zip(rK2).map { case (l, r) =>
        EqualNullSafe(l, r.toAttribute): Expression } :+
        (EqualTo(ridxOf(group.head._2), target.toAttribute): Expression))
        .reduce(And(_, _))
      cur = Join(cur, donor,
        org.apache.spark.sql.catalyst.plans.LeftOuter, Some(cond2),
        JoinHint.NONE)
      vals.foreach { case (d, va) =>
        lagValue(d.alias.exprId.id) =
          Alias(va.toAttribute, d.alias.name)(exprId = d.alias.exprId) }
    }
    val finalCols = combined.map { case (d, a, isLag) =>
      if (isLag) lagValue(d.alias.exprId.id) else (a.toAttribute: NamedExpression)
    }
    Project(child.output ++ finalCols, cur)
  }
}
