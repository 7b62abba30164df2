package graft.plans

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.logical.{Filter, LogicalPlan}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.{LongType, TimestampType}

/** Rewrites range predicates on a µs timestamp *derived from* an int64
  * nanosecond column (`timestamp_micros(ns div 1000)` — the shape
  * [[graft.sources.Tables.load]] produces, since Spark cannot read
  * parquet TIMESTAMP(NANOS) natively) by conjoining an equivalent
  * predicate on the raw ns column.
  *
  * The derived-column predicate is opaque to parquet scan pushdown — the
  * scan would read every row group. The added ns predicate is a plain
  * int64 comparison, which pushes down and prunes row groups/pages. Only
  * *necessary* conditions are added (implied by the original, which is
  * kept), so results are unchanged:
  *
  *   ts >= L  ⇒  ns >= minNs(L)          ts >  L  ⇒  ns >  maxNs(L)
  *   ts <= L  ⇒  ns <= maxNs(L)          ts <  L  ⇒  ns <  minNs(L)
  *
  * where minNs/maxNs ([[graft.model.NsTime]]) are the bounds of the µs
  * value's truncation preimage — sign-dependent, because IntegralDivide
  * truncates toward zero, so for pre-epoch (negative) values the preimage
  * is [L·1000−999, L·1000], not [L·1000, L·1000+999].
  * Idempotent: skips predicates already present, so the optimizer's
  * fixed-point batch terminates.
  */
object PushNanosTimestampPredicates extends Rule[LogicalPlan] {

  /** Matches `timestamp_micros(ns_col div 1000)` and returns the ns
    * expression. The analyzer may wrap operands in casts; `div` on longs
    * appears as IntegralDivide.
    */
  private object DerivedMicros {
    def unapply(e: Expression): Option[Expression] = e match {
      case MicrosToTimestamp(IntegralDivide(ns, Literal(1000L, LongType), _))
          if ns.dataType == LongType => Some(ns)
      case MicrosToTimestamp(Cast(IntegralDivide(ns, Literal(1000L, LongType), _), _, _, _))
          if ns.dataType == LongType => Some(ns)
      case _ => None
    }
  }

  private def micros(l: Literal): Option[Long] = l.dataType match {
    case TimestampType => Option(l.value).map(_.asInstanceOf[Long])
    case _ => None
  }

  /** ns-domain necessary condition for `ts <op> literal`. `lo`/`hi` are
    * the sign-correct ns bounds of the µs value's truncation preimage
    * ([[graft.model.NsTime.minNs]]/[[graft.model.NsTime.maxNs]]).
    */
  private def nsPredicate(cmp: BinaryComparison, ns: Expression,
                          us: Long): Option[Expression] = {
    val lo = Literal(graft.model.NsTime.minNs(us))
    val hi = Literal(graft.model.NsTime.maxNs(us))
    cmp match {
      case _: GreaterThanOrEqual => Some(GreaterThanOrEqual(ns, lo))
      case _: GreaterThan => Some(GreaterThan(ns, hi))
      case _: LessThanOrEqual => Some(LessThanOrEqual(ns, hi))
      case _: LessThan => Some(LessThan(ns, lo))
      case _: EqualTo =>
        Some(And(GreaterThanOrEqual(ns, lo), LessThanOrEqual(ns, hi)))
      case _ => None
    }
  }

  private def flip(cmp: BinaryComparison): BinaryComparison = cmp match {
    case GreaterThanOrEqual(l, r) => LessThanOrEqual(r, l)
    case GreaterThan(l, r) => LessThan(r, l)
    case LessThanOrEqual(l, r) => GreaterThanOrEqual(r, l)
    case LessThan(l, r) => GreaterThan(r, l)
    case other => other
  }

  private def derived(cmp: BinaryComparison): Option[Expression] =
    (cmp.left, cmp.right) match {
      case (DerivedMicros(ns), l: Literal) =>
        micros(l).flatMap(nsPredicate(cmp, ns, _))
      case (l: Literal, DerivedMicros(ns)) =>
        micros(l).flatMap(nsPredicate(flip(cmp), ns, _))
      case _ => None
    }

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transform {
    case f @ Filter(cond, child) =>
      val conjuncts = splitConjunctivePredicates(cond)
      val additions = conjuncts.flatMap {
        case cmp: BinaryComparison => derived(cmp)
        case _ => None
      }.filterNot(a => conjuncts.exists(_.semanticEquals(a)))
      if (additions.isEmpty) f
      else Filter(additions.foldLeft(cond)(And), child)
  }

  private def splitConjunctivePredicates(condition: Expression): Seq[Expression] =
    condition match {
      case And(l, r) => splitConjunctivePredicates(l) ++ splitConjunctivePredicates(r)
      case other => Seq(other)
    }
}
