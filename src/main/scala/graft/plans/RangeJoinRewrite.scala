package graft.plans

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.Inner
import org.apache.spark.sql.catalyst.plans.logical._
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.catalyst.trees.TreeNodeTag
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
  *  - interval side gains `explode(sequence(bucket(lo), bucket(hi)))`
  *    — one row per overlapped bucket;
  *  - point side gains `bucket(p)` — exactly one bucket, the big side
  *    never fans out;
  *  - the join becomes `pointBucket = intervalBucket AND <original
  *    condition>` — an equi-join the planner shuffles or broadcasts
  *    like any other, with the range predicate left intact as the
  *    residual filter (so correctness never depends on the bucketing).
  *
  * Buckets are computed on the RAW bound attributes — no ±1
  * normalization of strict/inclusive variants. Coverage only needs
  * monotonicity (`p > lo ⟹ bucket(p) ≥ bucket(lo)`, `p ≤/< hi ⟹
  * bucket(p) ≤ bucket(hi)`), costs at most one extra candidate bucket
  * per end, and cannot overflow at the `Long.MIN/MAX` sentinels the
  * way `hi + 1` arithmetic does. Buckets use sign-correct floor
  * division `(x - pmod(x, w)) div w`; for `x` within one width of
  * `Long.MinValue` that subtraction itself would wrap, so those rows
  * are pinned to the lowest bucket (lower bounds) or one above it
  * (upper bounds) — over-covering, never dropping. Empty intervals
  * (`bucket(lo) > bucket(hi)`) explode to zero buckets via an `If`
  * guard — Sequence would otherwise run DOWNWARD and manufacture
  * candidates.
  *
  * Wide intervals are NOT exploded: a row whose bucket span exceeds
  * `spark.graft.rangeJoin.maxBuckets` (default 65536) — e.g. an
  * open-interval sentinel `hi = Long.MaxValue` — would make Sequence
  * throw or OOM. Such rows are split into a fallback branch that keeps
  * the ORIGINAL theta join (slow but bounded by how many wide rows
  * exist) and union'd with the bucketed branch; each interval row goes
  * to exactly one branch, so results are exact. With AQE on, an empty
  * wide branch collapses at runtime (empty-relation propagation)
  * before the point side is scanned again.
  *
  * Bucket width comes from `spark.graft.rangeJoin.bucketWidth`
  * (default 3600000000 = 1 h in µs): pick it near the typical
  * interval span so each interval lands in O(1) buckets. Width must
  * be positive — 0 would make Pmod return null and silently empty the
  * join, so the rule throws instead.
  *
  * Registered by [[graft.functions.GraftExtensions]] via
  * `injectOptimizerRule`; also usable per-session through
  * `spark.experimental.extraOptimizations`.
  */
object RangeJoinRewrite extends Rule[LogicalPlan] with PredicateHelper {

  val WidthKey = "spark.graft.rangeJoin.bucketWidth"
  val MaxBucketsKey = "spark.graft.rangeJoin.maxBuckets"

  /** Marks the wide-interval fallback join so fixed-point optimizer
    * batches do not re-rewrite it (its condition is still the bare
    * theta predicate this rule matches). */
  private[plans] val skipTag = TreeNodeTag[Boolean]("graft.rangeJoin.skip")

  private def width: Long = {
    val w = SQLConf.get.getConfString(WidthKey, "3600000000").toLong
    require(w > 0,
      s"$WidthKey must be positive, got $w (0 would null the bucket key and silently drop every row)")
    w
  }

  private def maxBuckets: Long = {
    val m = SQLConf.get.getConfString(MaxBucketsKey, "65536").toLong
    require(m > 0, s"$MaxBucketsKey must be positive, got $m")
    m
  }

  /** Floor division that is exact for negatives: pmod is in [0, w),
    * so the numerator is an exact multiple of w and IntegralDivide's
    * truncation is the true floor. */
  private def fdiv(e: Expression, w: Long): Expression =
    IntegralDivide(Subtract(e, Pmod(e, Literal(w))), Literal(w))

  /** Bucket of a LOWER bound: for x < MIN + w the `x - pmod(x, w)`
    * numerator wraps positive, so pin those rows to the true lowest
    * bucket floor(MIN / w) — an under-estimate is safe on this end. */
  private def bucketLo(e: Expression, w: Long): Expression =
    If(LessThan(e, Literal(Long.MinValue + w)),
      Literal(Math.floorDiv(Long.MinValue, w)),
      fdiv(e, w))

  /** Bucket of an UPPER bound: same wrap guard, but pinned one bucket
    * ABOVE the lowest (the [MIN, MIN+w) range straddles two buckets
    * and an upper bound must over-cover, never under). */
  private def bucketHi(e: Expression, w: Long): Expression =
    If(LessThan(e, Literal(Long.MinValue + w)),
      Literal(Math.floorDiv(Long.MinValue, w) + 1L),
      fdiv(e, w))

  private def isLongAttr(e: Expression): Boolean =
    e.isInstanceOf[AttributeReference] && e.dataType == LongType

  /** (point, rawBound) for a lower-bound conjunct: p >(=) bound. */
  private def lowerOf(c: Expression): Option[(Attribute, Attribute)] = c match {
    case GreaterThanOrEqual(p, lo) if isLongAttr(p) && isLongAttr(lo) =>
      Some((p.asInstanceOf[Attribute], lo.asInstanceOf[Attribute]))
    case GreaterThan(p, lo) if isLongAttr(p) && isLongAttr(lo) =>
      Some((p.asInstanceOf[Attribute], lo.asInstanceOf[Attribute]))
    case LessThanOrEqual(lo, p) if isLongAttr(p) && isLongAttr(lo) =>
      Some((p.asInstanceOf[Attribute], lo.asInstanceOf[Attribute]))
    case LessThan(lo, p) if isLongAttr(p) && isLongAttr(lo) =>
      Some((p.asInstanceOf[Attribute], lo.asInstanceOf[Attribute]))
    case _ => None
  }

  /** (point, rawBound) for an upper-bound conjunct: p <(=) bound. */
  private def upperOf(c: Expression): Option[(Attribute, Attribute)] = c match {
    case LessThan(p, hi) if isLongAttr(p) && isLongAttr(hi) =>
      Some((p.asInstanceOf[Attribute], hi.asInstanceOf[Attribute]))
    case LessThanOrEqual(p, hi) if isLongAttr(p) && isLongAttr(hi) =>
      Some((p.asInstanceOf[Attribute], hi.asInstanceOf[Attribute]))
    case GreaterThan(hi, p) if isLongAttr(p) && isLongAttr(hi) =>
      Some((p.asInstanceOf[Attribute], hi.asInstanceOf[Attribute]))
    case GreaterThanOrEqual(hi, p) if isLongAttr(p) && isLongAttr(hi) =>
      Some((p.asInstanceOf[Attribute], hi.asInstanceOf[Attribute]))
    case _ => None
  }

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transformUp {
    case j @ Join(_, _, Inner, Some(cond), _) if j.getTagValue(skipTag).isEmpty =>
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
    val maxB = maxBuckets
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

      val bl = bucketLo(lo, w)
      val bh = bucketHi(hi, w)
      // bucket span guard: a sentinel bound (hi = Long.MaxValue) spans
      // ~2^63/w buckets — Sequence would throw or OOM. Rows over the
      // cap go to the fallback theta branch instead. The wrapped-span
      // clause (span < 0 is only reachable by 64-bit overflow, w = 1
      // with a near-full-range interval) also routes to the fallback.
      val span = Subtract(bh, bl)
      val wideCond = And(LessThanOrEqual(bl, bh),
        Or(LessThan(span, Literal(0L)), GreaterThan(span, Literal(maxB - 1L))))
      // NOT(wide) admits empty-range rows (bl > bh → zero buckets via
      // the If below) and, per SQL 3VL, drops null-bound rows in BOTH
      // branches — exactly inner-join semantics for a null bound.
      val narrowInterval = Filter(Not(wideCond), intervalPlan)

      // Sequence is TimeZoneAwareExpression: without an explicit zone it
      // stays unresolved and the optimizer rejects the rewritten plan
      val seq = If(LessThanOrEqual(bl, bh),
        Sequence(bl, bh, Some(Literal(1L)), Some(SQLConf.get.sessionLocalTimeZone)),
        Literal.create(Array.empty[Long], ArrayType(LongType, containsNull = false)))
      val ibktAttr = AttributeReference("_graft_ibkt", LongType, nullable = false)()
      val intervalGen = Generate(Explode(seq), unrequiredChildIndex = Nil,
        outer = false, qualifier = None, generatorOutput = Seq(ibktAttr),
        child = narrowInterval)

      val newCond = And(EqualTo(pbkt.toAttribute, ibktAttr), cond)
      val (newLeft, newRight) =
        if (pointIsLeft) (pointProj, intervalGen) else (intervalGen, pointProj)
      val narrowJoin =
        Project(j.output, Join(newLeft, newRight, Inner, Some(newCond), j.hint))

      val wideInterval = Filter(wideCond, intervalPlan)
      val (wl, wr) = if (pointIsLeft) (pointPlan, wideInterval) else (wideInterval, pointPlan)
      val wideJoin = Join(wl, wr, Inner, Some(cond), j.hint)
      wideJoin.setTagValue(skipTag, true)

      Union(Seq(narrowJoin, Project(j.output, wideJoin)))
    }
  }
}
