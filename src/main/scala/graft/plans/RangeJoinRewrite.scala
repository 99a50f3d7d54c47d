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
  * way `hi + 1` arithmetic does. Every bucket — point and bounds —
  * is the EXACT floor `x div w` via sign-correct `(x - pmod(x, w))
  * div w`, with the `Long.MinValue`-adjacent wrap region (where that
  * subtraction would overflow — an ANSI runtime error) short-circuited
  * to its true bucket, a rule-time literal. Empty intervals
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
    * theta predicate this rule matches). The tag is the FAST guard;
    * [[containsRewriteArtifacts]] is the robust one — sibling rules
    * (e.g. PushPredicateThroughJoin) rebuild Join nodes without
    * copying tags. */
  private[plans] val skipTag = TreeNodeTag[Boolean]("graft.rangeJoin.skip")

  /** True when a subtree already carries this rule's output: a
    * `_graft_`-prefixed bucket column, or a Filter whose condition
    * contains the EXACT bucket-floor shape [[fdiv]] emits —
    * `(x - pmod(x, w)) div w` over the same attribute and width (the
    * wide-branch route predicate — it survives Join rebuilds and
    * filter merges because it lives in the CHILD, not on the rebuilt
    * node). Matching the full shape, not any bare `Pmod`, keeps user
    * plans with ordinary modulo filters (`pmod(x, 2) = 0`) eligible
    * for the rewrite. Joins over artifact subtrees are never
    * rewritten again, which (a) makes the rule idempotent even if the
    * skip tag is lost, and (b) scopes the rewrite to the INNERMOST of
    * stacked range joins — each rewrite embeds both children twice
    * (bucketed + fallback branch), so rewriting K nested levels would
    * copy the base scans 2^K times. A pipeline with several genuine
    * range joins should pre-bucket via graft.operators.RangeJoin
    * instead. */
  private def isBucketFloor(e: Expression): Boolean = e match {
    case IntegralDivide(Subtract(x, Pmod(x2, Literal(w1, LongType), _), _), Literal(w2, LongType), _) =>
      w1 == w2 && x.semanticEquals(x2)
    case _ => false
  }

  private def containsRewriteArtifacts(p: LogicalPlan): Boolean =
    p.exists {
      case f: Filter => f.condition.exists(isBucketFloor)
      case node => node.expressions.exists(_.exists {
        case a: Alias => a.name.startsWith("_graft_")
        case ar: AttributeReference => ar.name.startsWith("_graft_")
        case _ => false
      })
    }

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

  /** EXACT bucket floor(x / w), overflow-free for every long. The
    * `x - pmod(x, w)` numerator wraps only for x below the lowest
    * full bucket boundary `(floor(MIN/w)+1)·w`; every such x is by
    * definition in bucket floor(MIN/w), a literal computable at rule
    * time. Exactness matters for three reasons: the POINT side must
    * get its true bucket (an approximate bucket mis-keys the
    * equi-join), ANSI mode (Spark 4 default) turns the wrap into a
    * runtime ARITHMETIC_OVERFLOW that kills the whole query the
    * moment one MIN-adjacent value appears, and with ANSI off the
    * wrapped subtraction silently drops matching rows. */
  private def bucketOf(e: Expression, w: Long): Expression = {
    val lowest = Math.floorDiv(Long.MinValue, w)
    // (lowest+1)·w ∈ (MIN, MIN+w] — in range, no overflow
    val boundary = (lowest + 1L) * w
    If(LessThan(e, Literal(boundary)), Literal(lowest), fdiv(e, w))
  }

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
    case j @ Join(_, _, Inner, Some(cond), _)
        if j.getTagValue(skipTag).isEmpty &&
          !containsRewriteArtifacts(j.left) && !containsRewriteArtifacts(j.right) =>
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

      val pbkt = Alias(bucketOf(p, w), "_graft_pbkt")()
      val pointProj = Project(pointPlan.output :+ pbkt, pointPlan)

      val bl = bucketOf(lo, w)
      val bh = bucketOf(hi, w)
      // bucket span guard: a sentinel bound (hi = Long.MaxValue) spans
      // ~2^63/w buckets — Sequence would throw or OOM. Rows over the
      // cap go to the fallback theta branch instead. The check is
      // ADDITION-based (`bh > bl + (maxB-1)`) behind a literal guard
      // that makes the add provably in-range: `bh - bl` could itself
      // overflow for w = 1 with a near-full-range interval, which
      // under ANSI is a runtime error, not a routable condition. When
      // bl > MAX - (maxB-1) the span cannot reach maxB, so the row is
      // narrow without any arithmetic.
      val wideCond = And(LessThanOrEqual(bl, bh),
        And(LessThanOrEqual(bl, Literal(Long.MaxValue - (maxB - 1L))),
          GreaterThan(bh, Add(bl, Literal(maxB - 1L)))))
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
