package graft.tools

import org.json4s._
import org.json4s.jackson.JsonMethods

/** Cross-round bench regression detector — the r11 verdict's missing
  * piece: the bench artifact carries per-query `valid` stamps and a
  * run-level `spread_ok`, but nothing COMPARED two artifacts, so the
  * c4_curation_funnel +20% drift (r10 → r11) had to be found by a
  * human reading two JSONs. This tool takes two bench artifacts (old,
  * new), compares settled medians for queries marked `valid` in BOTH
  * runs, and reports every delta beyond a threshold — the round-close
  * step the README prescribes (run the closing builder bench, then
  * `runMain graft.tools.BenchDiff BENCH_r{N-1}_builder.json
  * target/bench.json`).
  *
  * Contamination rules, inherited from the instrument: a query flagged
  * `valid: false` in EITHER artifact is skipped (its median never
  * settled — a delta against it is noise), and a run with
  * `spread_ok: false` or steal ≥ 2% is reported as UNTRUSTWORTHY up
  * front (per-query deltas still print, but the header says not to act
  * on them). Queries present in only one artifact are listed as
  * added/removed, never diffed.
  */
object BenchDiff {

  final case class Run(
      queries: Map[String, Double],
      valid: Map[String, Boolean],
      spreadOk: Boolean,
      stealPct: Double,
      totalSec: Double,
      calibRel: Map[String, Double] = Map.empty,
      budgetOk: Map[String, Boolean] = Map.empty)

  private def num(v: JValue): Option[Double] = v match {
    case JDouble(d) => Some(d)
    case JInt(i) => Some(i.toDouble)
    case JLong(l) => Some(l.toDouble)
    case JDecimal(d) => Some(d.toDouble)
    case _ => None
  }

  def parseRun(json: String): Run = {
    val j = JsonMethods.parse(json)
    def objOf(field: String): Map[String, JValue] = j \ field match {
      case JObject(fs) => fs.toMap
      case _ => Map.empty
    }
    Run(
      queries = objOf("queries").flatMap { case (k, v) => num(v).map(k -> _) },
      valid = objOf("valid").collect { case (k, JBool(b)) => k -> b },
      spreadOk = j \ "spread_ok" match {
        case JBool(b) => b
        case _ => true // pre-r11 artifacts carry no stamp: trust, but say so
      },
      stealPct = num(j \ "steal_pct_run").getOrElse(0.0),
      totalSec = num(j \ "value").getOrElse(0.0),
      calibRel = objOf("calib_rel").flatMap { case (k, v) => num(v).map(k -> _) },
      budgetOk = objOf("budget_ok").collect { case (k, JBool(b)) => k -> b })
  }

  /** Report lines for (old, new) at `thresholdPct`. Pure — specs pin
    * the classification; main only reads files and prints. */
  def diff(oldRun: Run, newRun: Run, thresholdPct: Double): Seq[String] = {
    val out = Seq.newBuilder[String]
    def trust(tag: String, r: Run): Unit = {
      if (!r.spreadOk)
        out += s"[benchdiff] WARNING: $tag run has spread_ok=false - its flagged medians never settled"
      if (r.stealPct >= 2.0)
        out += f"[benchdiff] WARNING: $tag run measured ${r.stealPct}%.1f%% steal - deltas are not trustworthy"
    }
    trust("OLD", oldRun)
    trust("NEW", newRun)
    val shared = oldRun.queries.keySet intersect newRun.queries.keySet
    val added = (newRun.queries.keySet -- oldRun.queries.keySet).toSeq.sorted
    val removed = (oldRun.queries.keySet -- newRun.queries.keySet).toSeq.sorted
    if (added.nonEmpty) out += s"[benchdiff] added (no baseline): ${added.mkString(", ")}"
    if (removed.nonEmpty) out += s"[benchdiff] removed: ${removed.mkString(", ")}"
    // sorted: report line order must be deterministic (hash-set order
    // is not), and EVERY skip is reported — a zero/garbage baseline
    // hides a real regression in the new run, so it gets the same
    // contamination-reporting treatment as valid=false (review-caught
    // r12)
    val rows = shared.toSeq.sorted.flatMap { q =>
      val bothValid =
        oldRun.valid.getOrElse(q, true) && newRun.valid.getOrElse(q, true)
      val o = oldRun.queries(q)
      val n = newRun.queries(q)
      if (!bothValid) {
        // the r13 budget stamp is the trust signal that survives an
        // inflated host: an unsettled absolute median whose
        // calibration-relative budget still passed is NOT a regression
        val budgetNote = newRun.budgetOk.get(q) match {
          case Some(true) =>
            "; NEW budget_ok=true (calibration-relative, within its pinned budget)"
          case Some(false) =>
            "; NEW budget_ok=FALSE (over its pinned calibration-relative budget)"
          case None => ""
        }
        out += f"[benchdiff] skipped $q: valid=false in ${
          if (!oldRun.valid.getOrElse(q, true)) "OLD" else "NEW"} (median never settled)$budgetNote"
        None
      } else if (o <= 0.0) {
        out += s"[benchdiff] skipped $q: non-positive old median ($o)"
        None
      } else Some((q, o, n, (n - o) / o * 100.0))
    }
    val flagged = rows.filter { case (_, _, _, d) => math.abs(d) > thresholdPct }
      .sortBy { case (_, _, _, d) => -math.abs(d) }
    flagged.foreach { case (q, o, n, d) =>
      val kind = if (d > 0) "REGRESSION" else "improvement"
      out += f"[benchdiff] $kind%-11s $q%-28s $o%7.2f s -> $n%7.2f s  (${d}%+6.1f%%)"
    }
    // budget verdicts stand on their own (calibration-relative, so
    // meaningful even when every absolute median above is inflated)
    newRun.budgetOk.toSeq.sorted.foreach { case (q, ok) =>
      if (!ok) {
        val rel = newRun.calibRel.get(q).map(r => f" (calib_rel $r%.2f)").getOrElse("")
        out += s"[benchdiff] BUDGET VIOLATION $q: over its pinned calibration-relative budget in NEW run$rel"
      }
    }
    val okCount = rows.size - flagged.size
    out += f"[benchdiff] compared ${rows.size} settled queries, $okCount within ±$thresholdPct%.0f%%, " +
      s"${flagged.count(_._4 > 0)} regressions, ${flagged.count(_._4 < 0)} improvements; " +
      f"total ${oldRun.totalSec}%.1f s -> ${newRun.totalSec}%.1f s"
    out.result()
  }

  def main(args: Array[String]): Unit = {
    require(args.length >= 2,
      "usage: BenchDiff <old-bench.json> <new-bench.json> [thresholdPct=20]")
    val threshold = args.lift(2).map(_.toDouble).getOrElse(20.0)
    def read(p: String): Run = {
      val src = scala.io.Source.fromFile(p)
      try parseRun(src.mkString) finally src.close()
    }
    diff(read(args(0)), read(args(1)), threshold).foreach(println)
  }
}
