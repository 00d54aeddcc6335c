package org.apache.spark.sql.graft

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.{IntegerType, LongType, TimestampNTZType, TimestampType}

/** Optimizer rule restoring parquet pushdown for predicates on the
  * engine's epoch-nanosecond long view of timestamp source columns.
  *
  * The `events.ts` contract is epoch-ns LONG (every gate query does exact
  * integer arithmetic on it), but the source file has carried the instant
  * as parquet TIMESTAMP(MICROS)/NTZ since the upstream layout change, so
  * `graft.Tables` derives the long view as
  * `unix_micros(cast(ts as timestamp)) * 1000`. A comparison against that
  * DERIVED expression cannot reach the scan — `PushedFilters` drops to
  * `IsNotNull` only, and a time-split query loses row-group pruning (and,
  * on a date-partitioned 100 TB table, partition pruning): the scan reads
  * everything and filters afterwards.
  *
  * The conversion is strictly monotonic and exactly invertible on the
  * microsecond lattice, so any comparison against a long literal
  * transposes onto the RAW column:
  *
  *   micros*1000 <  C  ⇔  micros <  ceilDiv(C, 1000)
  *   micros*1000 <= C  ⇔  micros <= floorDiv(C, 1000)
  *   micros*1000 >  C  ⇔  micros >  floorDiv(C, 1000)
  *   micros*1000 >= C  ⇔  micros >= ceilDiv(C, 1000)
  *   micros*1000 =  C  ⇔  micros = C/1000           (only when 1000 | C)
  *
  * Each rewrite is a pure expression equivalence — value-exact for every
  * row and NULL-preserving (NULL input yields NULL on both sides) — so it
  * is safe in any expression position, not just filter conditions. The
  * rewritten comparison sits directly on the scan attribute, which the
  * datasource strategy translates into a parquet filter.
  *
  * Timezone safety: `cast(ntz as timestamp)` shifts by the session zone's
  * offset AT THAT WALL CLOCK — only a fixed-offset-zero zone makes
  * `unix_micros` equal the NTZ column's underlying micros for every value.
  * The rule therefore fires only when the cast's zone is UTC (the engine
  * pins `spark.sql.session.timeZone=UTC` everywhere); a plain TIMESTAMP
  * column needs no cast and no zone check.
  *
  * Domain assumption (both sides): the equivalences above hold only while
  * `micros*1000` does not wrap a LONG, i.e. for instants before
  * 2262-04-11 — past that, Spark's non-ANSI Multiply wraps silently and
  * the original and rewritten predicates disagree. The LITERAL side is
  * guarded (ceilDiv uses addExact; on overflow the rewrite is skipped),
  * but the COLUMN side has no runtime guard: the engine's epoch-ns
  * contract (`Tables.tsAsEpochNanos`) is itself only meaningful within
  * the same pre-2262 range, so a source file carrying later instants is
  * out of contract before this rule ever sees it. Do not register the
  * rule for data that can exceed that range, and note that under ANSI
  * eval mode the un-rewritten multiply would raise instead of wrap —
  * the rewrite would then mask the error by answering from the raw
  * column.
  */
object EpochNanosPredicatePushdown extends Rule[LogicalPlan] {

  private val utcZones = Set("UTC", "Z", "Etc/UTC", "GMT", "+00:00")

  /** The shim's derived expression, unwrapped to the raw source column. */
  private object NsView {
    def unapply(e: Expression): Option[Expression] = e match {
      case Multiply(inner, Lit1000(), _) => micros(inner)
      case Multiply(Lit1000(), inner, _) => micros(inner)
      case _ => None
    }
    private def micros(e: Expression): Option[Expression] = e match {
      case UnixMicros(c @ Cast(child, TimestampType, _, _))
          if child.dataType == TimestampNTZType &&
            c.timeZoneId.exists(utcZones.contains) => Some(child)
      case UnixMicros(child) if child.dataType == TimestampType => Some(child)
      case _ => None
    }
  }

  private object Lit1000 {
    def unapply(e: Expression): Boolean = e match {
      case Literal(1000L, LongType)   => true
      case Literal(1000, IntegerType) => true
      case _                          => false
    }
  }

  private object LongLit {
    def unapply(e: Expression): Option[Long] = e match {
      case Literal(v: Long, LongType)   => Some(v)
      case Literal(v: Int, IntegerType) => Some(v.toLong)
      case _                            => None
    }
  }

  private def tsLit(micros: Long, like: Expression): Literal =
    Literal(micros, like.dataType) // TimestampType/NTZ both store long micros

  private def floorDiv(c: Long): Long = Math.floorDiv(c, 1000L)
  // c is bounded by year-2262 epoch-ns in practice; addExact guards the
  // pathological literal anyway (on overflow the rewrite is just skipped)
  private def ceilDiv(c: Long): Option[Long] =
    try Some(Math.floorDiv(Math.addExact(c, 999L), 1000L))
    catch { case _: ArithmeticException => None }

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transformAllExpressions {
    case LessThan(NsView(c), LongLit(k)) if ceilDiv(k).isDefined =>
      LessThan(c, tsLit(ceilDiv(k).get, c))
    case GreaterThan(LongLit(k), NsView(c)) if ceilDiv(k).isDefined =>
      GreaterThan(tsLit(ceilDiv(k).get, c), c)
    case LessThanOrEqual(NsView(c), LongLit(k)) =>
      LessThanOrEqual(c, tsLit(floorDiv(k), c))
    case GreaterThanOrEqual(LongLit(k), NsView(c)) =>
      GreaterThanOrEqual(tsLit(floorDiv(k), c), c)
    case GreaterThan(NsView(c), LongLit(k)) =>
      GreaterThan(c, tsLit(floorDiv(k), c))
    case LessThan(LongLit(k), NsView(c)) =>
      LessThan(tsLit(floorDiv(k), c), c)
    case GreaterThanOrEqual(NsView(c), LongLit(k)) if ceilDiv(k).isDefined =>
      GreaterThanOrEqual(c, tsLit(ceilDiv(k).get, c))
    case LessThanOrEqual(LongLit(k), NsView(c)) if ceilDiv(k).isDefined =>
      LessThanOrEqual(tsLit(ceilDiv(k).get, c), c)
    case EqualTo(NsView(c), LongLit(k)) if k % 1000L == 0L =>
      EqualTo(c, tsLit(k / 1000L, c))
    case EqualTo(LongLit(k), NsView(c)) if k % 1000L == 0L =>
      EqualTo(tsLit(k / 1000L, c), c)
  }
}
