package graft.tools

import org.scalatest.funsuite.AnyFunSuite

/** BenchDiff classification rules: deltas only between queries valid
  * in BOTH runs, added/removed listed not diffed, contaminated runs
  * warned about — the cross-round regression detector the r11 c4
  * drift showed was missing. */
class BenchDiffSpec extends AnyFunSuite {

  private def artifact(queries: Map[String, Double],
      valid: Map[String, Boolean] = Map.empty,
      spreadOk: Boolean = true, steal: Double = 0.1): String = {
    val qs = queries.map { case (k, v) => s""""$k":$v""" }.mkString(",")
    val vs = valid.map { case (k, v) => s""""$k":$v""" }.mkString(",")
    s"""{"metric":"total","value":${queries.values.sum},"unit":"sec",
       |"queries":{$qs},"valid":{$vs},"spread_ok":$spreadOk,
       |"steal_pct_run":$steal,"sf":"sf0.1"}""".stripMargin
  }

  test("flags regressions and improvements beyond the threshold, skips invalid rows") {
    val oldRun = BenchDiff.parseRun(artifact(
      Map("q_fast" -> 1.0, "q_slow" -> 5.0, "q_same" -> 2.0, "q_noisy" -> 1.0),
      valid = Map("q_noisy" -> false)))
    val newRun = BenchDiff.parseRun(artifact(
      Map("q_fast" -> 1.6, "q_slow" -> 3.0, "q_same" -> 2.1, "q_noisy" -> 9.0,
        "q_new" -> 0.5)))
    val lines = BenchDiff.diff(oldRun, newRun, thresholdPct = 20.0)
    assert(lines.exists(l => l.contains("REGRESSION") && l.contains("q_fast")))
    assert(lines.exists(l => l.contains("improvement") && l.contains("q_slow")))
    assert(!lines.exists(l => l.contains("REGRESSION") && l.contains("q_same")))
    // the 9x "regression" on a never-settled median is NOT reported as one
    assert(lines.exists(l => l.contains("skipped q_noisy") && l.contains("OLD")))
    assert(!lines.exists(l => l.contains("REGRESSION") && l.contains("q_noisy")))
    assert(lines.exists(l => l.contains("added") && l.contains("q_new")))
  }

  test("contaminated runs are warned about; pre-stamp artifacts parse with defaults") {
    val dirty = BenchDiff.parseRun(artifact(Map("q" -> 1.0), spreadOk = false,
      steal = 4.5))
    val clean = BenchDiff.parseRun(artifact(Map("q" -> 1.0)))
    val lines = BenchDiff.diff(dirty, clean, 20.0)
    assert(lines.exists(_.contains("spread_ok=false")))
    assert(lines.exists(_.contains("steal")))
    // pre-r11 artifact: no valid/spread_ok/steal fields at all
    val legacy = BenchDiff.parseRun("""{"value":3.0,"queries":{"q":3.0}}""")
    assert(legacy.spreadOk && legacy.valid.isEmpty)
    val l2 = BenchDiff.diff(legacy, clean, 20.0)
    assert(l2.exists(l => l.contains("improvement") && l.contains("q")))
  }

  test("the real r10 -> r11 builder artifacts surface the c4 drift the verdict found by hand") {
    def read(p: String) = {
      val src = scala.io.Source.fromFile(p)
      try BenchDiff.parseRun(src.mkString) finally src.close()
    }
    val r10 = new java.io.File("BENCH_r10_builder.json")
    val r11 = new java.io.File("BENCH_r11_builder.json")
    assume(r10.exists && r11.exists)
    val lines = BenchDiff.diff(read(r10.getPath), read(r11.getPath), 20.0)
    assert(lines.exists(l =>
      l.contains("REGRESSION") && l.contains("c4_curation_funnel")),
      s"expected the known c4 drift to be flagged:\n${lines.mkString("\n")}")
  }

  test("budget stamps: skipped-but-within-budget is trusted, violations are reported, baselines without them parse") {
    def withBudgets(queries: Map[String, Double], valid: Map[String, Boolean],
        budgetOk: Map[String, Boolean], calibRel: Map[String, Double]): String = {
      val qs = queries.map { case (k, v) => s""""$k":$v""" }.mkString(",")
      val vs = valid.map { case (k, v) => s""""$k":$v""" }.mkString(",")
      val bs = budgetOk.map { case (k, v) => s""""$k":$v""" }.mkString(",")
      val cs = calibRel.map { case (k, v) => s""""$k":$v""" }.mkString(",")
      s"""{"value":${queries.values.sum},"queries":{$qs},"valid":{$vs},
         |"budget_ok":{$bs},"calib_rel":{$cs},"spread_ok":true,
         |"steal_pct_run":0.1}""".stripMargin
    }
    val oldRun = BenchDiff.parseRun(withBudgets(
      Map("c4" -> 6.3, "t19" -> 3.0), Map.empty, Map.empty, Map.empty))
    // NEW run on a loaded host: c4's absolute median never settled but
    // its calibration-relative budget PASSED; t19 genuinely violated
    val newRun = BenchDiff.parseRun(withBudgets(
      Map("c4" -> 14.0, "t19" -> 9.0),
      valid = Map("c4" -> false),
      budgetOk = Map("c4" -> true, "t19" -> false),
      calibRel = Map("c4" -> 8.1, "t19" -> 6.2)))
    val lines = BenchDiff.diff(oldRun, newRun, 20.0)
    // the skipped line carries the trust signal a tail-reader needs
    assert(lines.exists(l => l.contains("skipped c4") &&
      l.contains("budget_ok=true")), lines.mkString("\n"))
    // the violation stands on its own calibration-relative evidence
    assert(lines.exists(l => l.contains("BUDGET VIOLATION t19") &&
      l.contains("6.2")), lines.mkString("\n"))
    // a pre-r13 baseline with no budget fields parses with empty maps
    assert(oldRun.budgetOk.isEmpty && oldRun.calibRel.isEmpty)
  }

  test("non-positive old medians are skipped LOUDLY and line order is deterministic") {
    val oldRun = BenchDiff.parseRun(
      """{"value":1.0,"queries":{"q_zero":0.0,"q_ok":1.0}}""")
    val newRun = BenchDiff.parseRun(
      """{"value":9.0,"queries":{"q_zero":5.0,"q_ok":1.0}}""")
    val lines = BenchDiff.diff(oldRun, newRun, 20.0)
    // a zero/garbage baseline must not silently hide the new median
    assert(lines.exists(l => l.contains("skipped q_zero") &&
      l.contains("non-positive")), lines.mkString("\n"))
    // deterministic output: two runs of the same diff are identical
    assert(lines === BenchDiff.diff(oldRun, newRun, 20.0))
  }
}
