package graft.plans

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.Inner
import org.apache.spark.sql.catalyst.plans.logical._
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.internal.SQLConf
import org.apache.spark.sql.types.{ArrayType, LongType}

/** Catalyst optimizer rule: rewrites a naive point-in-interval theta
  * join into the bucket-decomposed equi-join, so the USER can write
  * the obvious predicate and still get the scale-safe plan.
  *
  * `points JOIN intervals ON p >= lo AND p < hi` has no equi-key, so
  * Spark plans BroadcastNestedLoopJoin — |points|·|intervals|
  * comparisons (see graft.operators.RangeJoin for the operator-level
  * form and the 100 TB arithmetic). This rule detects an INNER join
  * whose condition contains a lower and an upper bound on the same
  * long attribute against two attributes of the other side, and no
  * cross-side equality (if one exists the join is already hash-able):
  *
  *  - interval side gains `explode(sequence(bucket(lo'), bucket(hi'-1)))`
  *    — one row per overlapped bucket;
  *  - point side gains `bucket(p)` — exactly one bucket, the big side
  *    never fans out;
  *  - the join becomes `pointBucket = intervalBucket AND <original
  *    condition>` — an equi-join the planner shuffles or broadcasts
  *    like any other, with the range predicate left intact as the
  *    residual filter (so correctness never depends on the bucketing).
  *
  * Strict/inclusive variants are normalized to the half-open
  * `[lo', hi')` form on longs (`p > lo` ⇒ `lo+1`; `p <= hi` ⇒ `hi+1`).
  * Buckets use sign-correct floor division `(x - pmod(x, w)) div w`.
  * Empty intervals (`bucket(lo') > bucket(hi'-1)`) explode to zero
  * buckets via an `If` guard — Sequence would otherwise run DOWNWARD
  * and manufacture candidates.
  *
  * Bucket width comes from `spark.graft.rangeJoin.bucketWidth`
  * (default 3600000000 = 1 h in µs): pick it near the typical
  * interval span so each interval lands in O(1) buckets.
  *
  * Registered by [[graft.functions.GraftExtensions]] via
  * `injectOptimizerRule`; also usable per-session through
  * `spark.experimental.extraOptimizations`.
  */
object RangeJoinRewrite extends Rule[LogicalPlan] with PredicateHelper {

  val WidthKey = "spark.graft.rangeJoin.bucketWidth"

  private def width: Long =
    SQLConf.get.getConfString(WidthKey, "3600000000").toLong

  /** Floor division that is exact for negatives: pmod is in [0, w),
    * so the numerator is an exact multiple of w and IntegralDivide's
    * truncation is the true floor. */
  private def fdiv(e: Expression, w: Long): Expression =
    IntegralDivide(Subtract(e, Pmod(e, Literal(w))), Literal(w))

  private def isLongAttr(e: Expression): Boolean =
    e.isInstanceOf[AttributeReference] && e.dataType == LongType

  /** (point, bound, boundFromOtherSide) for a lower-bound conjunct,
    * normalized to inclusive: p >= bound. */
  private def lowerOf(c: Expression): Option[(Attribute, Expression)] = c match {
    case GreaterThanOrEqual(p, lo) if isLongAttr(p) && isLongAttr(lo) =>
      Some((p.asInstanceOf[Attribute], lo))
    case GreaterThan(p, lo) if isLongAttr(p) && isLongAttr(lo) =>
      Some((p.asInstanceOf[Attribute], Add(lo, Literal(1L))))
    case LessThanOrEqual(lo, p) if isLongAttr(p) && isLongAttr(lo) =>
      Some((p.asInstanceOf[Attribute], lo))
    case LessThan(lo, p) if isLongAttr(p) && isLongAttr(lo) =>
      Some((p.asInstanceOf[Attribute], Add(lo, Literal(1L))))
    case _ => None
  }

  /** (point, bound) for an upper-bound conjunct, normalized to
    * exclusive: p < bound. */
  private def upperOf(c: Expression): Option[(Attribute, Expression)] = c match {
    case LessThan(p, hi) if isLongAttr(p) && isLongAttr(hi) =>
      Some((p.asInstanceOf[Attribute], hi))
    case LessThanOrEqual(p, hi) if isLongAttr(p) && isLongAttr(hi) =>
      Some((p.asInstanceOf[Attribute], Add(hi, Literal(1L))))
    case GreaterThan(hi, p) if isLongAttr(p) && isLongAttr(hi) =>
      Some((p.asInstanceOf[Attribute], hi))
    case GreaterThanOrEqual(hi, p) if isLongAttr(p) && isLongAttr(hi) =>
      Some((p.asInstanceOf[Attribute], Add(hi, Literal(1L))))
    case _ => None
  }

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transformUp {
    case j @ Join(_, _, Inner, Some(cond), _) =>
      rewrite(j, cond).getOrElse(j)
  }

  private def rewrite(j: Join, cond: Expression): Option[LogicalPlan] = {
    val conjuncts = splitConjunctivePredicates(cond)
    // a cross-side equality means the planner already has a hash key —
    // and it is also how this rule recognizes (and skips) its own output
    val hasEqui = conjuncts.exists {
      case EqualTo(a, b) =>
        (a.references.subsetOf(j.left.outputSet) && b.references.subsetOf(j.right.outputSet)) ||
          (a.references.subsetOf(j.right.outputSet) && b.references.subsetOf(j.left.outputSet))
      case _ => false
    }
    if (hasEqui) return None

    val w = width
    val lowers = conjuncts.flatMap(c => lowerOf(c))
    val uppers = conjuncts.flatMap(c => upperOf(c))
    // first (point, lo, hi) triple where the point attribute is on one
    // side and both bounds are attributes of the other side
    val triple = (for {
      (p1, lo) <- lowers
      (p2, hi) <- uppers if p1.semanticEquals(p2)
    } yield (p1, lo, hi)).collectFirst {
      case (p, lo, hi)
          if j.left.outputSet.contains(p) &&
            lo.references.subsetOf(j.right.outputSet) &&
            hi.references.subsetOf(j.right.outputSet) =>
        (p, lo, hi, true)
      case (p, lo, hi)
          if j.right.outputSet.contains(p) &&
            lo.references.subsetOf(j.left.outputSet) &&
            hi.references.subsetOf(j.left.outputSet) =>
        (p, lo, hi, false)
    }

    triple.map { case (p, lo, hi, pointIsLeft) =>
      val (pointPlan, intervalPlan) = if (pointIsLeft) (j.left, j.right) else (j.right, j.left)

      val pbkt = Alias(fdiv(p, w), "_graft_pbkt")()
      val pointProj = Project(pointPlan.output :+ pbkt, pointPlan)

      val bl = fdiv(lo, w)
      val bh = fdiv(Subtract(hi, Literal(1L)), w)
      // Sequence is TimeZoneAwareExpression: without an explicit zone it
      // stays unresolved and the optimizer rejects the rewritten plan
      val seq = If(LessThanOrEqual(bl, bh),
        Sequence(bl, bh, Some(Literal(1L)), Some(SQLConf.get.sessionLocalTimeZone)),
        Literal.create(Array.empty[Long], ArrayType(LongType, containsNull = false)))
      val ibktAttr = AttributeReference("_graft_ibkt", LongType, nullable = false)()
      val intervalGen = Generate(Explode(seq), unrequiredChildIndex = Nil,
        outer = false, qualifier = None, generatorOutput = Seq(ibktAttr),
        child = intervalPlan)

      val newCond = And(EqualTo(pbkt.toAttribute, ibktAttr), cond)
      val (newLeft, newRight) =
        if (pointIsLeft) (pointProj, intervalGen) else (intervalGen, pointProj)
      Project(j.output, Join(newLeft, newRight, Inner, Some(newCond), j.hint))
    }
  }
}
