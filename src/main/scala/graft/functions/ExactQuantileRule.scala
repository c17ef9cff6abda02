package graft.functions

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.aggregate._
import org.apache.spark.sql.catalyst.plans.LeftOuter
import org.apache.spark.sql.catalyst.plans.logical._
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.internal.SQLConf
import org.apache.spark.sql.types.{DoubleType, NumericType}

/** Rewrites grouped exact-percentile aggregates into the histogram +
  * spillable-window shape, removing the data-sized aggregation buffer.
  *
  * Spark's exact `percentile` (= the engine's `quantile_cont` / `median`
  * mapping) is an ObjectHashAggregate whose per-group state is a
  * value→count MAP held in executor memory with no spill path: a
  * high-cardinality measure makes the buffer data-sized, which at 100 TB is
  * an OOM class, not a slowdown class. The same interpolated quantile is
  * computable with O(1) aggregation state from the distinct-value
  * histogram (the [[graft.scale.Scale.groupedExactQuantile]] shape, pinned
  * to 1e-9 against `percentile` by ScaleSpec):
  *
  *   1. pre-aggregate counts by (group, value) — map-side combined, sized
  *      by |distinct (group, value)| pairs, spilling hash aggregation;
  *   2. running + total counts over a per-group window ORDERED BY value —
  *      the sort is Spark's external (disk-spilling) sort, so worst-case
  *      cardinality degrades to spill instead of OOM;
  *   3. the two straddling order statistics per quantile fall out of
  *      constant-state conditional `min`s, then interpolate with Spark's
  *      own 0-based rank arithmetic (pos = q·(n−1)).
  *
  * Non-percentile aggregates in the same SELECT keep their original
  * single-pass Aggregate and are stitched back with a null-safe join on
  * the group keys (null groups compare equal in GROUP BY, so the join must
  * too); groups whose measure is entirely NULL are absent from the
  * quantile side and surface as NULL through the outer join — exactly
  * `percentile`'s answer. The trade is one extra scan of the child per
  * distinct measure column: linear work instead of a memory cliff.
  *
  * Scope (bails out otherwise): grouped aggregates (global quantiles go
  * through `Scale.exactQuantile`), literal scalar percentage, unit
  * frequency, no DISTINCT / FILTER / reverse, no grouping-sets Expand.
  * Disable with `spark.graft.exactQuantileRewrite=false`. */
object ExactQuantileRule extends Rule[LogicalPlan] {

  private def enabled: Boolean =
    SQLConf.get.getConfString("spark.graft.exactQuantileRewrite", "true") != "false"

  private case class Pct(ae: AggregateExpression, value: Expression, q: Double)

  /** The Percentile calls this rule handles; None = not rewritable. */
  private def asPct(ae: AggregateExpression): Option[Pct] = ae.aggregateFunction match {
    case Percentile(value, Literal(q: Double, DoubleType), Literal(1L, _), _, _, false)
        if !ae.isDistinct && ae.filter.isEmpty && q >= 0.0 && q <= 1.0 &&
          value.dataType.isInstanceOf[NumericType] =>
      Some(Pct(ae, value, q))
    case _ => None
  }

  override def apply(plan: LogicalPlan): LogicalPlan = {
    if (!enabled) return plan
    plan.transformUp {
      case agg @ Aggregate(groupingExprs, aggExprs, child, None)
          if groupingExprs.nonEmpty && !child.isInstanceOf[Expand] && {
            val aes = aggExprs.flatMap(_.collect { case ae: AggregateExpression => ae })
            aes.exists(ae => asPct(ae).isDefined) &&
            // every percentile must be rewritable or we leave the whole
            // aggregate alone (half-rewritten percentiles would still
            // carry the map buffer AND pay the extra scan)
            aes.forall(ae =>
              asPct(ae).isDefined || !ae.aggregateFunction.isInstanceOf[PercentileBase])
          } =>
        rewrite(agg, groupingExprs, aggExprs, child)
    }
  }

  private def rewrite(agg: Aggregate, groupingExprs: Seq[Expression],
      aggExprs: Seq[NamedExpression], child: LogicalPlan): LogicalPlan = {
    val allAes = aggExprs.flatMap(_.collect { case ae: AggregateExpression => ae })
    val pcts = allAes.flatMap(asPct(_)).foldLeft(Seq.empty[Pct]) { (acc, p) =>
      if (acc.exists(_.ae.canonicalized == p.ae.canonicalized)) acc else acc :+ p
    }
    val residual = allAes.filter(asPct(_).isEmpty)
      .foldLeft(Seq.empty[AggregateExpression]) { (acc, ae) =>
        if (acc.exists(_.canonicalized == ae.canonicalized)) acc else acc :+ ae
      }

    // -------- residual side: the original aggregate minus the percentiles,
    // plus the group keys under fresh names (the join + final projection
    // read ONLY fresh attributes, so the two child branches can't collide)
    val gkAliases = groupingExprs.zipWithIndex.map { case (g, i) =>
      Alias(g, s"__gk$i")()
    }
    val residAliases = residual.zipWithIndex.map { case (ae, k) =>
      Alias(ae, s"__agg$k")()
    }
    val left: LogicalPlan =
      Aggregate(groupingExprs, gkAliases ++ residAliases, child, None)
    val gkAttrs = gkAliases.map(_.toAttribute)
    val residAttrs = residAliases.map(_.toAttribute)

    // -------- quantile side(s): one histogram plan per distinct measure
    val byValue = pcts.groupBy(_.value.canonicalized).values.toSeq
      .sortBy(_.head.value.sql)
    var joined: LogicalPlan = left
    val pctAttr = scala.collection.mutable.Map.empty[Expression, Attribute]
    byValue.zipWithIndex.foreach { case (group, j) =>
      val value = group.head.value
      val qkAliases = groupingExprs.zipWithIndex.map { case (g, i) =>
        Alias(g, s"__qk${j}_$i")()
      }
      val vAlias = Alias(Cast(value, DoubleType), s"__v$j")()
      val keyed = Project(qkAliases :+ vAlias, child)
      val qkAttrs = qkAliases.map(_.toAttribute)
      val vAttr = vAlias.toAttribute

      // 1. distinct-value histogram (spilling hash agg, map-side combined)
      val cAlias = Alias(
        AggregateExpression(Count(Seq(Literal(1))), Complete, isDistinct = false),
        "__c")()
      val hist = Aggregate(qkAttrs :+ vAttr,
        (qkAttrs :+ vAttr :+ cAlias).map(_.asInstanceOf[NamedExpression]),
        Filter(IsNotNull(vAttr), keyed), None)
      val cAttr = cAlias.toAttribute

      // 2. running and total counts over the per-group window (external,
      // spillable sort — the memory story of the whole rewrite)
      val order = Seq(SortOrder(vAttr, Ascending))
      val cumAlias = Alias(WindowExpression(
        AggregateExpression(Sum(cAttr), Complete, isDistinct = false),
        WindowSpecDefinition(qkAttrs, order,
          SpecifiedWindowFrame(RangeFrame, UnboundedPreceding, CurrentRow))),
        "__cum")()
      val nAlias = Alias(WindowExpression(
        AggregateExpression(Sum(cAttr), Complete, isDistinct = false),
        WindowSpecDefinition(qkAttrs, order,
          SpecifiedWindowFrame(RowFrame, UnboundedPreceding, UnboundedFollowing))),
        "__n")()
      val win = Window(Seq(cumAlias, nAlias), qkAttrs, order, hist)
      val cumAttr = cumAlias.toAttribute
      val nAttr = nAlias.toAttribute

      // 3. per-quantile 0-based fractional rank pos = q·(n−1) (Spark's own
      // Percentile arithmetic), materialized before the final aggregate
      val posAliases = group.zipWithIndex.map { case (p, m) =>
        Alias(Multiply(Literal(p.q),
          Subtract(Cast(nAttr, DoubleType), Literal(1.0))), s"__pos${j}_$m")()
      }
      val posed = Project(
        (qkAttrs :+ vAttr :+ cumAttr) ++ posAliases, win)
      val posAttrs = posAliases.map(_.toAttribute)

      def condMin(rank: Expression, name: String): Alias =
        Alias(AggregateExpression(
          Min(If(GreaterThanOrEqual(cumAttr, rank), vAttr,
            Literal(null, DoubleType))), Complete, isDistinct = false), name)()

      val quantAggs: Seq[Alias] = group.zipWithIndex.flatMap { case (_, m) =>
        val pos = posAttrs(m)
        Seq(
          // cum is a 1-based running count; the straddling order statistics
          // sit at ranks floor(pos)+1 and ceil(pos)+1
          condMin(Add(Floor(pos), Literal(1L)), s"__lo${j}_$m"),
          condMin(Add(Ceil(pos), Literal(1L)), s"__hi${j}_$m"),
          Alias(AggregateExpression(Min(pos), Complete, isDistinct = false),
            s"__posmin${j}_$m")()) // pos is group-constant; min carries it
      }
      val qAgg = Aggregate(qkAttrs,
        (qkAttrs ++ quantAggs).map(_.asInstanceOf[NamedExpression]), posed, None)
      val quantAttrs = quantAggs.map(_.toAttribute)

      val outAliases = group.zipWithIndex.map { case (p, m) =>
        val lo = quantAttrs(3 * m); val hi = quantAttrs(3 * m + 1)
        val pos = quantAttrs(3 * m + 2)
        val frac = Subtract(pos, Cast(Floor(pos), DoubleType))
        Alias(Add(lo, Multiply(frac, Subtract(hi, lo))), s"__pct${j}_$m")()
      }
      val right = Project(qkAttrs ++ outAliases, qAgg)
      group.zipWithIndex.foreach { case (p, m) =>
        pctAttr(p.ae.canonicalized) = outAliases(m).toAttribute
      }

      // GROUP BY treats NULL keys as equal; the join must too
      val cond = gkAttrs.zip(qkAttrs)
        .map { case (l, r) => EqualNullSafe(l, r): Expression }
        .reduce(And)
      joined = Join(joined, right, LeftOuter, Some(cond), JoinHint.NONE)
    }

    // -------- final projection: the original output expressions with every
    // aggregate call and grouping expression replaced by the stitched
    // attributes, keeping the original names AND exprIds so parent
    // operators resolve unchanged
    val residAttrOf = residual.zip(residAttrs).map {
      case (ae, a) => ae.canonicalized -> a
    }.toMap
    val finalProjs = aggExprs.map { ne =>
      val noAggs = ne match {
        case a: Alias => a.child
        case other => other
      }
      val replacedAggs = noAggs.transformUp {
        case ae: AggregateExpression if pctAttr.contains(ae.canonicalized) =>
          pctAttr(ae.canonicalized)
        case ae: AggregateExpression => residAttrOf(ae.canonicalized)
      }
      val replaced = replacedAggs.transformDown {
        case e if groupingExprs.exists(_.semanticEquals(e)) &&
            !e.isInstanceOf[Literal] =>
          gkAttrs(groupingExprs.indexWhere(_.semanticEquals(e)))
      }
      Alias(replaced, ne.name)(exprId = ne.exprId, qualifier = ne.qualifier)
    }
    Project(finalProjs, joined)
  }
}
