package org.apache.spark.sql.graft

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.aggregate.{AggregateExpression, Sum}
import org.apache.spark.sql.catalyst.plans.Inner
import org.apache.spark.sql.catalyst.plans.logical._
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.{IntegralType, LongType}

/** Optimizer rule rewriting the single-partition running-total
  * anti-pattern — `SUM(x) OVER (ORDER BY k ROWS UNBOUNDED PRECEDING)` with
  * no PARTITION BY — into the distributed two-level scan
  * (`graft.operators.DistributedScan`'s shape, as one logical plan):
  *
  *   range-repartition by k
  *     ├─ per-partition local running sums (partitioned by partition id)
  *     └─ per-partition totals → exclusive prefix offsets (|partitions|
  *        rows) ─ broadcast ─┐
  *   local + offset ─────────┴─ original output
  *
  * Both branches read the SAME range exchange (one canonical subtree —
  * ReuseExchange/AQE stage reuse materializes it once, so both observe
  * identical partition placement), and the explicit partition count makes
  * the shuffle REPARTITION_BY_NUM, which AQE never coalesces — the two
  * readers cannot disagree about partition ids.
  *
  * Why reuse is RELIABLE here when the equivalent DataFrame-level diamond
  * was not (see DistributedScan, which pins placement with a lazy
  * localCheckpoint instead): a DataFrame diamond goes through the full
  * optimizer per consumer, and per-branch COLUMN PRUNING narrows one
  * branch's exchange projection below the other's — canonically unequal
  * subtrees, no reuse, independently-resampled range boundaries (a real
  * observed hash miss). This rule runs in the post-optimization batch:
  * its two branches are built as literally identical subtrees AFTER
  * pruning has already run, no later batch re-prunes them, and AQE's
  * mid-query re-optimization applies neither column pruning nor user
  * rules — so the exchanges stay canonical-equal through every replan.
  *
  * OPT-IN via `spark.graft.rewrite.globalScan=true`: the rewrite is only
  * sequence-equivalent when the ORDER BY keys are unique (rows tying on
  * the key may land on either side of a range boundary, making "running
  * sum at this row" ambiguous — the same caveat DistributedScan documents).
  * The engine cannot prove key uniqueness, so the user asserts it.
  *
  * Scope is deliberately tight: every window function in the node must be
  * a non-DISTINCT SUM over an integral input (LONG result), with the
  * ROWS UNBOUNDED PRECEDING..CURRENT ROW frame. The generated sub-windows
  * never re-match the pattern (the local pass is partitioned; the offsets
  * pass uses an UNBOUNDED..-1 frame), so the rule is fixed-point safe.
  */
object GlobalScanRewrite extends Rule[LogicalPlan] {

  private def enabled: Boolean =
    conf.getConfString("spark.graft.rewrite.globalScan", "false").toBoolean

  private val runningFrame =
    SpecifiedWindowFrame(RowFrame, UnboundedPreceding, CurrentRow)

  /** Alias(WindowExpression(SUM(integral), running row frame)) — the only
    * shape this rule touches. */
  private def qualifyingSum(ne: NamedExpression): Option[(Alias, Expression)] = ne match {
    case a @ Alias(WindowExpression(
        AggregateExpression(Sum(input, _), _, false, None, _),
        WindowSpecDefinition(Nil, _, frame)), _)
      if frame == runningFrame && input.dataType.isInstanceOf[IntegralType] &&
        a.dataType == LongType =>
      Some((a, input))
    case _ => None
  }

  override def apply(plan: LogicalPlan): LogicalPlan = {
    if (!enabled) return plan
    plan.transformUp {
      case w @ Window(windowExprs, Nil, orderSpec, child, _)
          if orderSpec.nonEmpty && windowExprs.nonEmpty &&
            windowExprs.forall(qualifyingSum(_).isDefined) =>
        rewrite(w, windowExprs.map(qualifyingSum(_).get), orderSpec, child)
    }
  }

  private def rewrite(w: Window, sums: Seq[(Alias, Expression)],
                      orderSpec: Seq[SortOrder], child: LogicalPlan): LogicalPlan = {
    // 1. one range exchange, partition count pinned (REPARTITION_BY_NUM →
    //    AQE keeps it; canonical subtree → both consumers reuse it)
    val shuffled = RepartitionByExpression(
      orderSpec, child, Some(conf.numShufflePartitions), None)
    val pidAlias = Alias(SparkPartitionID(), "__scan_pid")()
    val withPid = Project(shuffled.output :+ pidAlias, shuffled)
    val pid = pidAlias.toAttribute

    // 2. local running sums, partitioned by pid
    val localAliases = sums.map { case (orig, input) =>
      Alias(WindowExpression(
        Sum(input).toAggregateExpression(),
        WindowSpecDefinition(Seq(pid), orderSpec, runningFrame)),
        s"__scan_loc_${orig.name}")()
    }
    val localWin = Window(localAliases, Seq(pid), orderSpec, withPid)

    // 3. offsets branch: re-alias every column first (fresh exprIds — the
    //    join below would otherwise be a self-join on ambiguous ids), then
    //    per-pid totals and the exclusive prefix over the tiny frame
    val offBase = Project(
      withPid.output.map(a => Alias(a, a.name)()), withPid)
    val offPid = offBase.output.last.asInstanceOf[Attribute]
    val rebased = AttributeMap(withPid.output.zip(offBase.output))
    val totAliases = sums.map { case (orig, input) =>
      val rebasedInput = input.transform {
        case a: Attribute => rebased.getOrElse(a, a)
      }
      Alias(Sum(rebasedInput).toAggregateExpression(), s"__scan_tot_${orig.name}")()
    }
    val totals = Aggregate(Seq(offPid), offPid +: totAliases, offBase)
    val exclusiveFrame =
      SpecifiedWindowFrame(RowFrame, UnboundedPreceding, Literal(-1))
    val offAliases = totAliases.map { t =>
      Alias(WindowExpression(
        Sum(t.toAttribute).toAggregateExpression(),
        WindowSpecDefinition(Nil, Seq(SortOrder(offPid, Ascending)), exclusiveFrame)),
        s"__scan_off_${t.name}")()
    }
    val offWin = Window(offAliases, Nil, Seq(SortOrder(offPid, Ascending)), totals)
    val offsets = Project(offPid +: offAliases.map(_.toAttribute), offWin)

    // 4. broadcast the |partitions|-row offsets back and assemble the
    //    original output under the ORIGINAL exprIds
    val join = Join(localWin, offsets, Inner,
      Some(EqualTo(pid, offPid)),
      JoinHint(None, Some(HintInfo(Some(BROADCAST)))))
    val finalSums = sums.zip(localAliases).zip(offAliases).map {
      case (((orig, _), loc), off) =>
        Alias(Add(loc.toAttribute,
          Coalesce(Seq(off.toAttribute, Literal(0L)))), orig.name)(
          exprId = orig.exprId, qualifier = orig.qualifier,
          explicitMetadata = Some(orig.metadata))
    }
    Project(child.output ++ finalSums, join)
  }
}
