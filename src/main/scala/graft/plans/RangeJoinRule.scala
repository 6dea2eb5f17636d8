package graft.plans

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.Inner
import org.apache.spark.sql.catalyst.plans.logical.{Generate, Join, LogicalPlan, Project}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.internal.SQLConf
import org.apache.spark.sql.types.{ByteType, IntegerType, LongType, ShortType}

/** Optimizer rule: bucketize point-in-interval range joins.
  *
  * Spark plans an inner join whose only usable predicates are
  * `point >= start AND point < end` as a nested-loop join (broadcast or
  * cartesian) — O(n·m) row comparisons, the classic scale cliff for
  * event-attribution queries. With a bucket width W configured via
  *
  *   SET spark.graft.rangeJoin.bucketWidth = <W>   // e.g. max interval length
  *
  * this rule rewrites the join to the same shape `JoinOps.rangeJoin`
  * builds by hand: the point side gains `point div W` as an equi-key, the
  * interval side explodes `sequence(start div W, end div W)` (an interval
  * overlaps few buckets when W ≥ its width), and the join becomes a hash
  * equi-join on the bucket with the ORIGINAL predicates retained as a
  * post-condition — semantics are unchanged (truncating division is
  * monotonic, so s ≤ p < e implies s div W ≤ p div W ≤ e div W and the
  * point's bucket is always generated), only the pairing strategy changes
  * from all-pairs to per-bucket.
  *
  * Scope: integral point/bound types only (timestamps must be converted
  * to epoch numbers by the query — a raw Cast to long would silently
  * change µs to seconds); inner joins; any extra conjuncts (equi keys
  * included) are preserved and further narrow the hash join.
  *
  * Registered via `GraftExtensions` (injectOptimizerRule) and usable in
  * tests through `spark.experimental.extraOptimizations`.
  */
object RangeJoinBucketing extends Rule[LogicalPlan] with PredicateHelper {

  val WidthConf = "spark.graft.rangeJoin.bucketWidth"

  private def width: Long =
    try SQLConf.get.getConfString(WidthConf, "0").toLong
    catch { case _: NumberFormatException => 0L }

  private def integral(e: Expression): Boolean = e.dataType match {
    case ByteType | ShortType | IntegerType | LongType => true
    case _ => false
  }

  /** (point, start, end, pointIsLeft) when the condition contains
    * `p >= s` and `p < e` with p from one side, s and e from the other.
    */
  private def findRange(
      cond: Expression,
      left: LogicalPlan,
      right: LogicalPlan): Option[(Expression, Expression, Expression, Boolean)] = {
    val conjs = splitConjunctivePredicates(cond)
    def in(e: Expression, p: LogicalPlan) = e.references.nonEmpty && e.references.subsetOf(p.outputSet)
    def find(point: LogicalPlan, interval: LogicalPlan): Option[(Expression, Expression, Expression)] = {
      val ge = conjs.collect {
        case GreaterThanOrEqual(p, s) if in(p, point) && in(s, interval) && integral(p) => (p, s)
        case LessThanOrEqual(s, p) if in(p, point) && in(s, interval) && integral(p) => (p, s)
      }
      val lt = conjs.collect {
        case LessThan(p, e) if in(p, point) && in(e, interval) && integral(p) => (p, e)
        case GreaterThan(e, p) if in(p, point) && in(e, interval) && integral(p) => (p, e)
      }
      (for {
        (p1, s) <- ge
        (p2, e) <- lt
        if p1.semanticEquals(p2)
      } yield (p1, s, e)).headOption
    }
    find(left, right).map { case (p, s, e) => (p, s, e, true) }
      .orElse(find(right, left).map { case (p, s, e) => (p, s, e, false) })
  }

  override def apply(plan: LogicalPlan): LogicalPlan = {
    val w = width
    if (w <= 0) return plan
    plan.transformUp {
      case j @ Join(left, right, Inner, Some(cond), hint)
          if !cond.references.exists(_.name.startsWith("__graft_")) =>
        findRange(cond, left, right) match {
          case Some((p, s, e, pointIsLeft)) =>
            val wLit = Literal(w, LongType)
            val pBucket = Alias(IntegralDivide(Cast(p, LongType), wLit), "__graft_pbucket")()
            val pointPlan = if (pointIsLeft) left else right
            val intervalPlan = if (pointIsLeft) right else left
            val newPoint = Project(pointPlan.output :+ pBucket, pointPlan)
            // Sequence is TimeZoneAware: without an explicit zone it stays
            // unresolved and the optimizer rejects the rewritten plan
            val seq = new Sequence(
              IntegralDivide(Cast(s, LongType), wLit),
              IntegralDivide(Cast(e, LongType), wLit))
              .withTimeZone(SQLConf.get.sessionLocalTimeZone)
            val iBucket = AttributeReference("__graft_ibucket", LongType, nullable = false)()
            val newInterval = Generate(Explode(seq), Nil, outer = false, None, Seq(iBucket), intervalPlan)
            val bucketEq = EqualTo(pBucket.toAttribute, iBucket)
            val (nl, nr) = if (pointIsLeft) (newPoint, newInterval) else (newInterval, newPoint)
            Project(j.output, Join(nl, nr, Inner, Some(And(cond, bucketEq)), hint))
          case None => j
        }
    }
  }
}
