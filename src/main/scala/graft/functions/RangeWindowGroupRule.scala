package graft.functions

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.aggregate._
import org.apache.spark.sql.catalyst.plans.Inner
import org.apache.spark.sql.catalyst.plans.logical._
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.internal.SQLConf
import org.apache.spark.sql.types.DecimalType

/** Breaks the low-cardinality-partition-key ceiling on RANGE-mode window
  * aggregates by evaluating them over the (partition keys, order values)
  * GROUP table instead of the row stream.
  *
  * A RANGE-mode frame is PEER-GRANULAR by definition — its boundaries
  * move in whole peer groups — so any algebraic aggregate over it is a
  * function of per-(pk, ord) group aggregates alone:
  *
  *   1. pre-aggregate sum/min/max/count per (pk, ord) — a map-side-
  *      combining hash aggregate with pk×|ord| keys, fully parallel;
  *   2. run the ORIGINAL window (same frame, same order) over that group
  *      table — |groups| rows through the sort instead of |rows|;
  *   3. join the finished values back 1:1 on the null-safe group key.
  *
  * Why it matters at scale: Spark's WindowExec clusters by the partition
  * key, so a 5-value user key caps the sorted pass at 5-way parallelism
  * no matter the cluster (the q109 shape: 15 M rows through 5 tasks,
  * SCALE.md). The group table's sort is histogram-sized and the two
  * corpus-sized operations — the pre-aggregate and the join — parallelize
  * on the full (pk, ord) key space. Measured at sf10: the q109 EXCLUDE
  * windows drop 20.2 s → 2.5 s (hand prototype, identical rows).
  *
  * Equivalence is EXACT (not approximate): frame membership in RANGE
  * mode depends only on order VALUES, which the group table preserves;
  * sum-of-group-sums / min-of-group-mins / sum-of-group-counts are the
  * row aggregates. (Double sums reassociate — the same ulp class as
  * Spark's own partial aggregation.)
  *
  * Scope (bails otherwise; the original Window stays):
  *  - every window expression is an unfiltered, non-DISTINCT Sum / Min /
  *    Max / Count over a RANGE frame with foldable bounds;
  *  - the node has a non-empty ORDER BY (a RANGE frame guarantees one)
  *    and deterministic keys/inputs;
  *  - the child is not already an Aggregate (the ExactQuantileRule
  *    histogram shape: grouping again by the same keys cannot shrink);
  *  - the subtree carries no engineered physical layout
  *    (spark_partition_id / RepartitionByExpression — the prefix-offset
  *    patterns own their partitioning).
  *
  * Disable with `spark.graft.rangeWindowRewrite=false`. */
object RangeWindowGroupRule extends Rule[LogicalPlan] {

  private def enabled: Boolean =
    SQLConf.get.getConfString("spark.graft.rangeWindowRewrite", "true") != "false"

  /** The group-join trades the sorted pass for an aggregate + a window +
    * a join — fixed stage overhead that only pays for itself on large
    * inputs (measured at sf0.1: q108's 0.27 s became 2.7 s through three
    * extra shuffles; at sf10 the same trade took q109 from 20.2 s to
    * 10.4 s). Fire only when the child's estimated size clears this
    * floor (logical sizeInBytes — parquet file bytes propagated through
    * projections). */
  private def minBytes: Long =
    SQLConf.get.getConfString(
      "spark.graft.rangeWindowRewrite.minBytes", (64L << 20).toString).toLong

  /** Eligible aggregate → (pre-aggregate builder, outer builder). */
  private def eligibleAgg(af: AggregateFunction): Boolean = af match {
    case _: Sum | _: Min | _: Max => af.deterministic
    case c: Count => c.children.size <= 1 && af.deterministic
    case _ => false
  }

  private def foldableBound(e: Expression): Boolean = e match {
    case _: SpecialFrameBoundary => true
    case other => other.foldable
  }

  private sealed trait Kind
  private case class AggKind(ae: AggregateExpression, input: Expression)
      extends Kind
  private case object DenseRankKind extends Kind

  private case class Win(alias: Alias, we: WindowExpression, kind: Kind,
      wholePartition: Boolean)

  /** RANGE frames are peer-granular; a ROWS UNB..UNB frame is the whole
    * partition, granular at any level — both evaluate exactly over the
    * group table. dense_rank is peer-granular too (all peers share the
    * value, and with one group-table row per peer group it is ITS OWN
    * group-table evaluation) — it is the helper the EXCLUDE decomposition
    * emits, so covering it removes the last corpus-sized sorted pass of
    * that family. rank/percent_rank/cume_dist need row multiplicities
    * and row_number is row-granular — all stay on the row stream. */
  private def asWin(ne: NamedExpression): Option[Win] = ne match {
    case a @ Alias(we @ WindowExpression(
        ae @ AggregateExpression(af, Complete, false, None, _),
        WindowSpecDefinition(_, _, frame)), _)
        if eligibleAgg(af) && af.children.forall(_.deterministic) =>
      val whole = frame match {
        case SpecifiedWindowFrame(_, UnboundedPreceding, UnboundedFollowing) =>
          true
        case _ => false
      }
      val rangeOk = frame match {
        case SpecifiedWindowFrame(RangeFrame, lo, hi) =>
          foldableBound(lo) && foldableBound(hi)
        case _ => false
      }
      if (!whole && !rangeOk) None
      else {
        // count(*) pre-aggregates as count(1); other shapes have one input
        val input = af.children.headOption.getOrElse(Literal(1))
        Some(Win(a, we, AggKind(ae, input), whole))
      }
    case a @ Alias(we @ WindowExpression(dr: DenseRank, _), _)
        if dr.children.forall(_.deterministic) =>
      Some(Win(a, we, DenseRankKind, wholePartition = false))
    case _ => None
  }

  private def engineered(plan: LogicalPlan): Boolean = plan.exists {
    case _: RepartitionByExpression => true
    case p => p.expressions.exists(_.exists(_.isInstanceOf[SparkPartitionID]))
  }

  /** A `__`-prefixed PARTITION key is one of the engine's own banding
    * helpers (Scale.bandedRangeFrame's `__g`, bandedRunningPositional's
    * `__b`, …) — those shapes already engineered their parallelism, and
    * their band×ord group table is corpus-sized by construction (measured:
    * q47 at sf10 regressed 4.7 → 8.5 s before this bail). The EXCLUDE
    * decomposition's `__graft_dr1` helper appears in ORDER position, not
    * PARTITION — the rewrite stays live for that family. */
  private def bandedHelper(partSpec: Seq[Expression]): Boolean =
    partSpec.exists(_.exists {
      case a: Attribute => a.name.startsWith("__")
      case _ => false
    })

  override def apply(plan: LogicalPlan): LogicalPlan = {
    if (!enabled) return plan
    plan.transformUp {
      case w @ Window(winExprs, partSpec, orderSpec, child, _)
          if winExprs.nonEmpty &&
            winExprs.forall(ne => asWin(ne).isDefined) &&
            winExprs.flatMap(asWin).forall(win =>
              win.wholePartition || orderSpec.nonEmpty) &&
            partSpec.forall(_.deterministic) &&
            orderSpec.forall(_.child.deterministic) &&
            !child.isInstanceOf[Aggregate] &&
            child.stats.sizeInBytes >= minBytes &&
            !bandedHelper(partSpec) &&
            !engineered(child) && {
              // a fully-global whole-partition window has an EMPTY group
              // key (sum(x) OVER ()) — the join-back has no condition;
              // leave the one-partition window alone
              val wins = winExprs.flatMap(asWin)
              !(wins.forall(_.wholePartition) && partSpec.isEmpty)
            } =>
        rewrite(w, winExprs.flatMap(asWin), partSpec, orderSpec, child)
    }
  }

  private def rewrite(w: Window, wins: Seq[Win], partSpec: Seq[Expression],
      orderSpec: Seq[SortOrder], child: LogicalPlan): LogicalPlan = {
    // the group key: partition keys + order expressions, semantically
    // deduplicated (PARTITION BY a ORDER BY a is legal). When EVERY
    // frame covers the whole partition, order values are irrelevant and
    // the key drops to the partition keys alone — maximal shrink (the
    // peer-group aggregates of the EXCLUDE decomposition land here).
    val allWhole = wins.forall(_.wholePartition)
    val effOrder = if (allWhole) Nil else orderSpec
    val rawKeys = partSpec ++ effOrder.map(_.child)
    val keys = rawKeys.foldLeft(Seq.empty[Expression]) { (acc, e) =>
      if (acc.exists(_.semanticEquals(e))) acc else acc :+ e
    }
    def keyAttrFor(keyAttrs: Seq[Attribute])(e: Expression): Attribute =
      keyAttrs(keys.indexWhere(_.semanticEquals(e)))

    // ---- agg side: keys + window inputs under fresh names (the subtree
    // is shared with the join's left side — fresh aliases keep the two
    // branches' OUTPUTS disjoint, the ExactQuantileRule pattern)
    val keyAliases = keys.zipWithIndex.map { case (e, i) =>
      Alias(e, s"__rwk$i")()
    }
    val inAliases = wins.zipWithIndex.map { case (win, j) =>
      win.kind match {
        case AggKind(_, input) => Some(Alias(input, s"__rwi$j")())
        case DenseRankKind => None // no input — ranks the group key itself
      }
    }
    val keyed = Project(keyAliases ++ inAliases.flatten, child)
    val keyAttrs = keyAliases.map(_.toAttribute)
    val inAttrs = inAliases.map(_.map(_.toAttribute))

    def cAgg(af: AggregateFunction): AggregateExpression =
      AggregateExpression(af, Complete, isDistinct = false)

    // ---- per-group pre-aggregates (algebraic decomposition)
    val preAliases = wins.zipWithIndex.map { case (win, j) =>
      win.kind match {
        case AggKind(ae, _) =>
          val pre = ae.aggregateFunction match {
            case _: Sum => cAgg(Sum(inAttrs(j).get))
            case _: Min => cAgg(Min(inAttrs(j).get))
            case _: Max => cAgg(Max(inAttrs(j).get))
            case _: Count => cAgg(Count(Seq(inAttrs(j).get)))
          }
          Some(Alias(pre, s"__rwg$j")())
        case DenseRankKind => None
      }
    }
    val agg = Aggregate(keyAttrs,
      (keyAttrs ++ preAliases.flatten).map(_.asInstanceOf[NamedExpression]),
      keyed, None)
    val preAttrs = preAliases.map(_.map(_.toAttribute))

    // ---- the original window, frame and order intact, over the group
    // table (sum-of-sums / min-of-mins / sum-of-counts)
    val outerPart = partSpec.map(keyAttrFor(keyAttrs))
    val outerOrder = effOrder.map(so =>
      so.copy(child = keyAttrFor(keyAttrs)(so.child)))
    val outAliases = wins.zipWithIndex.map { case (win, j) =>
      win.kind match {
        case AggKind(ae, _) =>
          val outer = ae.aggregateFunction match {
            case _: Sum => cAgg(Sum(preAttrs(j).get))
            case _: Min => cAgg(Min(preAttrs(j).get))
            case _: Max => cAgg(Max(preAttrs(j).get))
            case _: Count => cAgg(Sum(preAttrs(j).get)) // = sum of group counts
          }
          val spec = WindowSpecDefinition(outerPart, outerOrder,
            win.we.windowSpec.frameSpecification)
          Alias(WindowExpression(outer, spec), s"__rww$j")()
        case DenseRankKind =>
          // one group-table row per peer group → dense_rank is exact; its
          // frame is the RankLike-internal ROWS UNB..CUR, kept as-is
          val spec = WindowSpecDefinition(outerPart, outerOrder,
            win.we.windowSpec.frameSpecification)
          Alias(WindowExpression(DenseRank(outerOrder.map(_.child)), spec),
            s"__rww$j")()
      }
    }
    val win2 = Window(outAliases, outerPart, outerOrder, agg, None)
    val right = Project(keyAttrs ++ outAliases.map(_.toAttribute), win2)

    // ---- 1:1 join back on the null-safe group key, then restore the
    // original output attributes (names AND exprIds) with a type-
    // preserving cast where the decomposition widened (decimal sums)
    val cond = keys.zip(keyAttrs)
      .map { case (e, a) => EqualNullSafe(e, a): Expression }.reduce(And)
    val joined = Join(child, right, Inner, Some(cond), JoinHint.NONE)
    val restored = wins.zip(outAliases).map { case (orig, out) =>
      val raw: Expression = out.toAttribute
      val zeroed = orig.kind match {
        // count over an EMPTY frame is 0; the sum-of-group-counts
        // decomposition yields NULL there — restore count's contract
        case AggKind(ae, _) if ae.aggregateFunction.isInstanceOf[Count] =>
          Coalesce(Seq(raw, Literal(0L)))
        case _ => raw
      }
      val typed =
        if (zeroed.dataType == orig.alias.dataType) zeroed
        else Cast(zeroed, orig.alias.dataType)
      Alias(typed, orig.alias.name)(
        exprId = orig.alias.exprId, qualifier = orig.alias.qualifier)
    }
    Project((child.output ++ restored).map(_.asInstanceOf[NamedExpression]),
      joined)
  }
}
