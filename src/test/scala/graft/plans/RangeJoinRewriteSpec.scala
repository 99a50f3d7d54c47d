package graft.plans

import org.apache.spark.sql.DataFrame
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** The optimizer rule must (a) change the naive theta-join's physical
  * plan from a nested-loop join to a hash-able equi-join and (b) never
  * change its rows — across inclusive/strict bounds, negatives that
  * stress floor division, empty intervals, and overlapping intervals. */
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

  private def withRule[T](f: => T): T = {
    spark.experimental.extraOptimizations = Seq(RangeJoinRewrite)
    spark.conf.set(RangeJoinRewrite.WidthKey, "100")
    try f finally {
      spark.experimental.extraOptimizations = Nil
      spark.conf.unset(RangeJoinRewrite.WidthKey)
    }
  }

  private def rows(df: DataFrame): Set[(Long, Long)] =
    df.select($"pid", $"iid").collect().map(r => (r.getLong(0), r.getLong(1))).toSet

  private def planOf(df: DataFrame): String =
    df.queryExecution.executedPlan.toString

  test("half-open predicate: same rows, no nested-loop join") {
    val naive = points.join(intervals, $"p" >= $"lo" && $"p" < $"hi")
    val expected = rows(naive) // rule not installed yet
    assert(planOf(naive).contains("BroadcastNestedLoopJoin"),
      "precondition: the naive plan is the nested-loop trap")
    withRule {
      val rewritten = points.join(intervals, $"p" >= $"lo" && $"p" < $"hi")
      val plan = planOf(rewritten)
      assert(!plan.contains("BroadcastNestedLoopJoin") && !plan.contains("CartesianProduct"),
        s"rewrite should remove the nested-loop join:\n$plan")
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
      withRule {
        val rewritten = points.join(intervals, c)
        assert(!planOf(rewritten).contains("BroadcastNestedLoopJoin"))
        assert(rows(rewritten) === expected, s"condition $c")
      }
    }
  }

  test("interval side on the left still rewrites") {
    val expected = rows(intervals.join(points, $"p" >= $"lo" && $"p" < $"hi"))
    withRule {
      val rewritten = intervals.join(points, $"p" >= $"lo" && $"p" < $"hi")
      assert(!planOf(rewritten).contains("BroadcastNestedLoopJoin"))
      assert(rows(rewritten) === expected)
    }
  }

  test("a join that already has an equi-key is left alone") {
    withRule {
      val df = points.join(intervals, $"p" === $"lo" && $"p" < $"hi")
      // planner gets a hash join either way; the rule must not touch it
      assert(!planOf(df).contains("_graft_pbkt"))
    }
  }

  test("residual conjuncts survive the rewrite") {
    val c = $"p" >= $"lo" && $"p" < $"hi" && $"pid" =!= $"iid"
    val expected = rows(points.join(intervals, c))
    withRule {
      val rewritten = points.join(intervals, c)
      assert(!planOf(rewritten).contains("BroadcastNestedLoopJoin"))
      assert(rows(rewritten) === expected)
    }
  }
}
