package org.apache.spark.sql.graft

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.SparkStrategy
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.Inner
import org.apache.spark.sql.catalyst.plans.logical.{Join, LogicalPlan}
import org.apache.spark.sql.catalyst.plans.physical.{BroadcastDistribution, Distribution, IdentityBroadcastMode, Partitioning, UnspecifiedDistribution}
import org.apache.spark.sql.execution.{BinaryExecNode, SparkPlan}
import org.apache.spark.sql.types.DoubleType

/** Broadcast interval join: inner join on `point BETWEEN lo AND hi` where
  * the interval side is small.
  *
  * Spark has no specialized plan for a pure range join — it falls back to
  * BroadcastNestedLoopJoin, evaluating the full predicate against every
  * (row, interval) pair: O(n·m) interpreted condition evals. This operator
  * sorts the broadcast intervals by `lo` once and, per probe row, binary
  * searches the candidate window: O(n·(log m + k)) primitive comparisons.
  *
  * This is the engine's one custom Strategy+SparkPlan pair — everything
  * else in SURVEY §2 plans well on built-ins (SURVEY §4's conclusion), but
  * here the built-in plan's asymptotics are genuinely wrong at scale.
  * Registered by [[GraftExtensions]]; fires only when the pattern and the
  * size threshold match, so existing plans are never hijacked unexpectedly.
  */
case class BroadcastIntervalJoinExec(
    point: Expression,
    lo: Expression,
    hi: Expression,
    left: SparkPlan,
    right: SparkPlan)
  extends BinaryExecNode {

  override def output: Seq[Attribute] = left.output ++ right.output
  override def outputPartitioning: Partitioning = left.outputPartitioning
  override protected def withNewChildrenInternal(
      newLeft: SparkPlan, newRight: SparkPlan): SparkPlan =
    copy(left = newLeft, right = newRight)

  // The right side arrives through a regular BroadcastExchange (inserted by
  // EnsureRequirements): collection happens once in the exchange's cached
  // relation future and survives copy()/re-planning/columnar transitions —
  // unlike a per-instance lazy val, which every withNewChildrenInternal
  // would discard, re-running the right side. ReuseExchange also dedups an
  // identical broadcast shared with another join for free.
  override def requiredChildDistribution: Seq[Distribution] =
    UnspecifiedDistribution :: BroadcastDistribution(IdentityBroadcastMode) :: Nil

  override protected def doExecute(): RDD[InternalRow] = {
    val bc = right.executeBroadcast[Array[InternalRow]]()
    val rightOutput = right.output
    val loBound = BindReferences.bindReference(lo, rightOutput)
    val hiBound = BindReferences.bindReference(hi, rightOutput)
    val pointBound = BindReferences.bindReference(point, left.output)
    val outAttrs = output
    // Memoization key, computed driver-side and captured by the closure:
    // broadcast ids are unique per SparkContext, so (id, bounds) uniquely
    // identifies the sorted structure an executor needs.
    val cacheKey = s"${bc.id}:${lo.canonicalized}:${hi.canonicalized}"

    left.execute().mapPartitionsInternal { iter =>
      // Sort intervals by lo; keep (lo, hi, row). A null lo or hi means the
      // BETWEEN predicate is NULL for every point — inner-join semantics say
      // that row can never match, so drop it here instead of letting the
      // unbox coerce null to 0.0 (which would fabricate the interval [0,0]).
      // The sorted structure is built ONCE PER EXECUTOR and shared by its
      // tasks (see sortedIntervals) — previously every task re-filtered,
      // re-sorted, and re-boxed the broadcast side, repeating the
      // O(m log m) work 32x per executor at local[32].
      val (loArr, hiPrefix, ivals) =
        BroadcastIntervalJoinExec.sortedIntervals(cacheKey) {
          val sorted = bc.value.iterator.flatMap { r =>
            val lv = loBound.eval(r)
            val hv = hiBound.eval(r)
            if (lv == null || hv == null) Iterator.empty
            else Iterator((lv.asInstanceOf[Double], hv.asInstanceOf[Double], r))
          }.toArray.sortBy(_._1)
          val hiMax = {
            // running max of hi up to index i: lets the scan-back stop early
            // for non-overlapping interval sets and bounds it for nested ones
            val a = new Array[Double](sorted.length)
            var m = Double.NegativeInfinity
            var i = 0
            while (i < sorted.length) { m = math.max(m, sorted(i)._2); a(i) = m; i += 1 }
            a
          }
          (sorted.map(_._1), hiMax, sorted)
        }
      val joiner = new JoinedRow
      val proj = UnsafeProjection.create(outAttrs, outAttrs)
      iter.flatMap { row =>
        val pv = pointBound.eval(row)
        if (pv == null) Iterator.empty
        else {
          val p = pv.asInstanceOf[Double]
          // last interval with lo <= p
          var idx = java.util.Arrays.binarySearch(loArr, p)
          if (idx < 0) idx = -idx - 2
          else {
            while (idx + 1 < loArr.length && loArr(idx + 1) == p) idx += 1
          }
          val hits = Seq.newBuilder[InternalRow]
          var i = idx
          while (i >= 0 && hiPrefix(i) >= p) {
            if (ivals(i)._2 >= p) hits += proj(joiner(row, ivals(i)._3)).copy()
            i -= 1
          }
          hits.result()
        }
      }
    }
  }
}

object BroadcastIntervalJoinExec {
  private type Sorted = (Array[Double], Array[Double], Array[(Double, Double, InternalRow)])

  /** Executor-local memo of the sorted interval structure: the first task
    * on an executor builds it, concurrent and later tasks reuse it. Soft
    * references let the JVM reclaim entries under memory pressure (they
    * are then rebuilt); a benign build race produces identical structures
    * and either may win. Entries are keyed by broadcast id, which a
    * SparkContext never reuses, so stale aliasing is impossible; the
    * stale-entry sweep keeps the map from growing with app lifetime. */
  private val cache =
    new java.util.concurrent.ConcurrentHashMap[String, java.lang.ref.SoftReference[Sorted]]()

  private[graft] def sortedIntervals(key: String)(build: => Sorted): Sorted = {
    val ref = cache.get(key)
    val hit = if (ref != null) ref.get else null
    if (hit != null) return hit
    val built = build
    if (cache.size > 64)
      cache.forEach((k, v) => if (v.get == null) cache.remove(k, v))
    cache.put(key, new java.lang.ref.SoftReference(built))
    built
  }
}

/** Plans inner joins shaped `lo <= point AND point <= hi` (no equi keys,
  * double-typed bounds, small right side) onto BroadcastIntervalJoinExec. */
case class IntervalJoinStrategy(spark: SparkSession) extends SparkStrategy {

  private def smallEnough(plan: LogicalPlan): Boolean =
    plan.stats.sizeInBytes <= spark.sessionState.conf.autoBroadcastJoinThreshold

  def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case j @ Join(l, r, Inner, Some(cond), _) if smallEnough(r) =>
      val lOut = l.outputSet
      val rOut = r.outputSet
      def fromLeft(e: Expression) = e.references.subsetOf(lOut) && e.references.nonEmpty
      def fromRight(e: Expression) = e.references.subsetOf(rOut) && e.references.nonEmpty
      def isDouble(e: Expression) = e.dataType == DoubleType

      // match (point >= lo) AND (point <= hi) in either literal order
      def extract(c: Expression): Option[(Expression, Expression, Expression)] = c match {
        case org.apache.spark.sql.catalyst.expressions.And(a, b) =>
          val cmps = Seq(a, b)
          val lower = cmps.collectFirst {
            case GreaterThanOrEqual(p, lo) if fromLeft(p) && fromRight(lo) => (p, lo)
            case LessThanOrEqual(lo, p) if fromLeft(p) && fromRight(lo) => (p, lo)
          }
          val upper = cmps.collectFirst {
            case LessThanOrEqual(p, hi) if fromLeft(p) && fromRight(hi) => (p, hi)
            case GreaterThanOrEqual(hi, p) if fromLeft(p) && fromRight(hi) => (p, hi)
          }
          (lower, upper) match {
            case (Some((p1, lo)), Some((p2, hi))) if p1.semanticEquals(p2) && isDouble(p1) =>
              Some((p1, lo, hi))
            case _ => None
          }
        case _ => None
      }

      extract(cond) match {
        case Some((point, lo, hi)) =>
          BroadcastIntervalJoinExec(point, lo, hi,
            planLater(l), planLater(r)) :: Nil
        case None => Nil
      }
    case _ => Nil
  }
}
