package graft.plans

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions.{lit, pmod}
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** The optimizer rule must (a) give the naive theta-join a hash-able
  * equi branch (the `_graft_pbkt` bucket key) so narrow intervals
  * never take the nested-loop path and (b) never change its rows —
  * across inclusive/strict bounds, negatives that stress floor
  * division, empty intervals, overlapping intervals, open-interval
  * sentinels at Long.MIN/MAX, and intervals wider than the bucket cap
  * (which must route to the bounded fallback branch, not a
  * too-long-sequence error). */
class RangeJoinRewriteSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  // points across bucket boundaries and negative territory
  lazy val points = ((-250L to 250L by 7L) ++ Seq(0L, 99L, 100L, 101L, -100L))
    .zipWithIndex.map { case (p, i) => (i.toLong, p) }.toDF("pid", "p")
  // intervals: overlapping, empty (lo == hi), negative, multi-bucket
  lazy val intervals = Seq(
    (1L, 0L, 100L), (2L, 50L, 150L), (3L, 10L, 10L), (4L, -120L, -20L),
    (5L, -5L, 5L), (6L, 0L, 400L), (7L, 240L, 241L)
  ).toDF("iid", "lo", "hi")

  private def withRule[T](conf: Map[String, String] = Map.empty)(f: => T): T = {
    spark.experimental.extraOptimizations = Seq(RangeJoinRewrite)
    spark.conf.set(RangeJoinRewrite.WidthKey, "100")
    conf.foreach { case (k, v) => spark.conf.set(k, v) }
    try f finally {
      spark.experimental.extraOptimizations = Nil
      spark.conf.unset(RangeJoinRewrite.WidthKey)
      conf.keys.foreach(spark.conf.unset)
    }
  }

  private def rows(df: DataFrame): Set[(Long, Long)] =
    df.select($"pid", $"iid").collect().map(r => (r.getLong(0), r.getLong(1))).toSet

  private def planOf(df: DataFrame): String =
    df.queryExecution.executedPlan.toString

  test("half-open predicate: same rows, bucketed equi branch present") {
    val naive = points.join(intervals, $"p" >= $"lo" && $"p" < $"hi")
    val expected = rows(naive) // rule not installed yet
    assert(planOf(naive).contains("BroadcastNestedLoopJoin"),
      "precondition: the naive plan is the nested-loop trap")
    withRule() {
      val rewritten = points.join(intervals, $"p" >= $"lo" && $"p" < $"hi")
      val plan = planOf(rewritten)
      assert(plan.contains("_graft_pbkt"),
        s"rewrite should add the bucket equi-key:\n$plan")
      assert(!plan.contains("CartesianProduct"))
      assert(rows(rewritten) === expected)
    }
  }

  test("strict/inclusive variants normalize correctly") {
    val conds = Seq(
      $"p" > $"lo" && $"p" < $"hi",
      $"p" >= $"lo" && $"p" <= $"hi",
      $"lo" <= $"p" && $"hi" > $"p")
    conds.foreach { c =>
      val expected = rows(points.join(intervals, c))
      withRule() {
        val rewritten = points.join(intervals, c)
        assert(planOf(rewritten).contains("_graft_pbkt"))
        assert(rows(rewritten) === expected, s"condition $c")
      }
    }
  }

  test("interval side on the left still rewrites") {
    val expected = rows(intervals.join(points, $"p" >= $"lo" && $"p" < $"hi"))
    withRule() {
      val rewritten = intervals.join(points, $"p" >= $"lo" && $"p" < $"hi")
      assert(planOf(rewritten).contains("_graft_pbkt"))
      assert(rows(rewritten) === expected)
    }
  }

  test("a join that already has an equi-key is left alone") {
    withRule() {
      val df = points.join(intervals, $"p" === $"lo" && $"p" < $"hi")
      // planner gets a hash join either way; the rule must not touch it
      assert(!planOf(df).contains("_graft_pbkt"))
    }
  }

  test("residual conjuncts survive the rewrite") {
    val c = $"p" >= $"lo" && $"p" < $"hi" && $"pid" =!= $"iid"
    val expected = rows(points.join(intervals, c))
    withRule() {
      val rewritten = points.join(intervals, c)
      assert(planOf(rewritten).contains("_graft_pbkt"))
      assert(rows(rewritten) === expected)
    }
  }

  // ---- sentinel bounds and the wide-interval fallback ----------------

  // open-ended sentinels next to normal intervals: the MAX-sentinel row
  // spans ~2^63/w buckets and MUST take the fallback branch (Sequence
  // would throw); the MIN lower bound exercises the pmod wrap guard.
  lazy val sentinels = Seq(
    (1L, 0L, 100L),                       // normal
    (2L, 150L, Long.MaxValue),            // open upper sentinel
    (3L, Long.MinValue, -200L),           // open lower sentinel
    (4L, Long.MinValue, Long.MaxValue)    // matches everything
  ).toDF("iid", "lo", "hi")

  test("open-interval sentinels: exact rows, no sequence explosion") {
    val c = $"p" >= $"lo" && $"p" < $"hi"
    val expected = rows(points.join(sentinels, c))
    withRule() {
      val rewritten = points.join(sentinels, c)
      assert(rows(rewritten) === expected)
    }
  }

  test("inclusive sentinel upper bound (p <= Long.MaxValue) keeps its matches") {
    val c = $"p" >= $"lo" && $"p" <= $"hi"
    val expected = rows(points.join(sentinels, c))
    assert(expected.nonEmpty)
    withRule() {
      assert(rows(points.join(sentinels, c)) === expected)
    }
  }

  test("maxBuckets cap routes multi-bucket intervals to the fallback, rows exact") {
    val c = $"p" >= $"lo" && $"p" < $"hi"
    val expected = rows(points.join(intervals, c))
    // cap of 1: every interval wider than one bucket uses the fallback
    withRule(Map(RangeJoinRewrite.MaxBucketsKey -> "1")) {
      assert(rows(points.join(intervals, c)) === expected)
    }
  }

  test("MIN-adjacent point values bucket exactly (no ANSI overflow, no lost rows)") {
    // p in [Long.MinValue, boundary) used to hit the unguarded
    // `p - pmod(p, w)` wrap: ANSI ARITHMETIC_OVERFLOW (killing the
    // query even when the point matches nothing), non-ANSI a wrong
    // bucket that silently dropped genuine matches
    val minPts = Seq(
      (0L, Long.MinValue), (1L, Long.MinValue + 3L),
      (2L, Long.MinValue + 150L), (3L, -50L), (4L, 50L))
      .toDF("pid", "p")
    val minIvs = Seq(
      (1L, Long.MinValue, Long.MinValue + 10L),   // narrow, in wrap region
      (2L, Long.MinValue + 100L, Long.MinValue + 200L),
      (3L, 0L, 100L)).toDF("iid", "lo", "hi")
    val c = $"p" >= $"lo" && $"p" < $"hi"
    val expected = rows(minPts.join(minIvs, c))
    assert(expected === Set((0L, 1L), (1L, 1L), (2L, 2L), (4L, 3L)))
    withRule() {
      val rewritten = minPts.join(minIvs, c)
      assert(planOf(rewritten).contains("_graft_pbkt"))
      assert(rows(rewritten) === expected)
    }
  }

  test("width 1 with a near-full-range interval routes to fallback, not span overflow") {
    // bh - bl here exceeds Long.MaxValue: a subtraction-based span
    // guard is itself an ANSI runtime error; the addition-based guard
    // must route the row to the theta fallback instead
    val wideIvs = Seq(
      (1L, -6000000000000000000L, 6000000000000000000L),
      (2L, 0L, 50L)).toDF("iid", "lo", "hi")
    val c = $"p" >= $"lo" && $"p" < $"hi"
    val expected = rows(points.join(wideIvs, c))
    withRule(Map(RangeJoinRewrite.WidthKey -> "1")) {
      assert(rows(points.join(wideIvs, c)) === expected)
    }
  }

  test("bucketWidth = 0 fails fast instead of silently matching nothing") {
    withRule(Map(RangeJoinRewrite.WidthKey -> "0")) {
      val ex = intercept[Exception] {
        points.join(intervals, $"p" >= $"lo" && $"p" < $"hi").collect()
      }
      assert(ex.getMessage.contains(RangeJoinRewrite.WidthKey))
    }
  }

  test("extensions path: injectOptimizerRule rewrites, sentinels included, fixed point stable") {
    // the PRODUCTION registration: a real session built with
    // GraftExtensions, where the rule runs inside the optimizer's
    // fixed-point batches interleaved with every other rule — this is
    // where a lost skip-tag on the wide fallback join would re-rewrite
    // forever (max-iterations warnings / plan bloat)
    import org.apache.spark.sql.SparkSession
    val base = spark // force TestSpark init before swapping sessions
    SparkSession.clearActiveSession()
    SparkSession.clearDefaultSession()
    val ext = SparkSession.builder()
      .master("local[4]")
      .withExtensions(new graft.functions.GraftExtensions)
      .getOrCreate()
    try {
      ext.conf.set(RangeJoinRewrite.WidthKey, "100")
      import ext.implicits._
      val ptRows = (-250L to 250L by 7L).zipWithIndex
        .map { case (p, i) => (i.toLong, p) }
      val ivRows = Seq(
        (1L, 0L, 100L), (2L, 150L, Long.MaxValue), (3L, 10L, 10L),
        (4L, Long.MinValue, -200L))
      val pts = ptRows.toDF("pid", "p")
      val ivs = ivRows.toDF("iid", "lo", "hi")
      val joined = pts.join(ivs, $"p" >= $"lo" && $"p" < $"hi")
      val plan = joined.queryExecution.executedPlan.toString
      assert(plan.contains("_graft_pbkt"),
        s"extensions-injected rule did not fire:\n$plan")
      // exactly-once structure: one Union (narrow + wide fallback),
      // one Generate, two Joins. A lost skipTag (e.g. a future
      // optimizer rule rebuilding the fallback Join via case-class
      // copy, which drops tags) would re-rewrite the fallback and
      // nest another Union/Generate — caught here. Probed empirically
      // against parquet relations with pushdown + IsNotNull inference
      // active: Spark 4.1.2's batches preserve the tag.
      val opt = joined.queryExecution.optimizedPlan
      import org.apache.spark.sql.catalyst.plans.logical.{Union => LUnion, Generate => LGenerate, Join => LJoin}
      assert(opt.collect { case u: LUnion => u }.size == 1)
      assert(opt.collect { case g: LGenerate => g }.size == 1)
      assert(opt.collect { case jn: LJoin => jn }.size == 2)
      val got = joined.select($"pid", $"iid").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
      val expected = (for {
        (pid, p) <- ptRows
        (iid, lo, hi) <- ivRows if p >= lo && p < hi
      } yield (pid, iid)).toSet
      assert(got === expected)
    } finally {
      ext.conf.unset(RangeJoinRewrite.WidthKey)
      SparkSession.setDefaultSession(base)
      SparkSession.setActiveSession(base)
    }
  }

  test("stacked range joins: only the innermost rewrites (no 2^K subtree copies)") {
    // each rewrite embeds BOTH join children twice (bucketed branch +
    // wide fallback), so rewriting K nested range joins would copy the
    // base scans 2^K times; containsRewriteArtifacts scopes the rule
    // to the innermost join and leaves the outer theta join alone
    withRule() {
      val iv2 = Seq((10L, -50L, 60L), (11L, 90L, 200L)).toDF("iid2", "lo2", "hi2")
      val stacked = points
        .join(intervals, $"p" >= $"lo" && $"p" < $"hi")
        .join(iv2, $"p" >= $"lo2" && $"p" < $"hi2")
      val opt = stacked.queryExecution.optimizedPlan
      import org.apache.spark.sql.catalyst.plans.logical.{Union => LUnion}
      assert(opt.collect { case u: LUnion => u }.size == 1,
        s"stacked joins must rewrite exactly one level:\n$opt")
      // rows still exact: the outer join keeps theta semantics
      val got = stacked.select($"pid", $"iid", $"iid2").collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
      val ptRows = points.collect().map(r => (r.getLong(0), r.getLong(1)))
      val ivRows = intervals.collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
      val expected = (for {
        (pid, p) <- ptRows
        (iid, lo, hi) <- ivRows if p >= lo && p < hi
        (iid2, lo2, hi2) <- Seq((10L, -50L, 60L), (11L, 90L, 200L)) if p >= lo2 && p < hi2
      } yield (pid, iid, iid2)).toSet
      assert(got === expected)
    }
  }

  test("user modulo filter (pmod(p,2)=0) does not suppress the rewrite") {
    // the artifact guard matches the exact bucket-floor shape
    // `(x - pmod(x, w)) div w`, NOT any bare Pmod — an ordinary user
    // plan with a modulo predicate must still escape the nested loop
    val c = $"p" >= $"lo" && $"p" < $"hi"
    val evens = points.filter(pmod($"p", lit(2L)) === 0L)
    val expected = rows(evens.join(intervals, c))
    assert(expected.nonEmpty)
    withRule() {
      val rewritten = points.filter(pmod($"p", lit(2L)) === 0L)
        .join(intervals, c)
      val plan = planOf(rewritten)
      assert(plan.contains("_graft_pbkt"),
        s"a user pmod filter must not be mistaken for a prior rewrite:\n$plan")
      // (the plan still carries the wide-interval FALLBACK theta branch
      // — a nested-loop join over the normally-empty wide set — so the
      // equi-branch marker, not BNLJ absence, is the proof it fired)
      assert(!plan.contains("CartesianProduct"))
      assert(rows(rewritten) === expected)
    }
  }

  test("modulo filter on the interval side does not suppress the rewrite either") {
    val c = $"p" >= $"lo" && $"p" < $"hi"
    val oddIvs = intervals.filter(pmod($"iid", lit(2L)) === 1L)
    val expected = rows(points.join(oddIvs, c))
    assert(expected.nonEmpty)
    withRule() {
      val rewritten = points.join(
        intervals.filter(pmod($"iid", lit(2L)) === 1L), c)
      assert(planOf(rewritten).contains("_graft_pbkt"))
      assert(rows(rewritten) === expected)
    }
  }

  test("rule is idempotent without the skip tag (artifact guard)") {
    // simulate a sibling rule rebuilding the fallback Join without its
    // tag: applying the rule to its OWN OUTPUT (tags absent after
    // logical-plan reconstruction) must be a fixed point
    withRule() {
      val joined = points.join(intervals, $"p" >= $"lo" && $"p" < $"hi")
      val once = RangeJoinRewrite(joined.queryExecution.analyzed)
      // strip every tag by round-tripping through case-class copy
      val untagged = once.transformUp { case n => n.makeCopy(n.productIterator
        .map(_.asInstanceOf[AnyRef]).toArray) }
      val twice = RangeJoinRewrite(untagged)
      import org.apache.spark.sql.catalyst.plans.logical.{Union => LUnion}
      assert(twice.collect { case u: LUnion => u }.size ===
        once.collect { case u: LUnion => u }.size,
        "re-applying the rule to an untagged rewrite must not nest another Union")
    }
  }
}
