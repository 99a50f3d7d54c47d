package graft.queries

import java.sql.Timestamp

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** Boundary semantics the oracle queries must encode exactly. */
class EventQueriesSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("session_window merges events exactly gap apart (split is diff > gap)") {
    // r3 review caught the oracle encoding >= gap; this pins the
    // empirically-verified Spark behavior: touching windows coalesce
    def ts(min: Long) = new Timestamp(min * 60000L)
    val events = Seq(
      (1L, ts(0), 1.0),
      (1L, ts(30), 2.0),   // exactly 30-minute gap → SAME session
      (1L, ts(61), 3.0))   // 31-minute gap → new session
      .toDF("user_id", "ts", "value")
    val sessions = events
      .groupBy($"user_id", session_window($"ts", "30 minutes").as("w"))
      .agg(count(lit(1)).as("n"))
      .select($"user_id", unix_micros($"w.start").as("s"),
        unix_micros($"w.end").as("e"), $"n")
      .orderBy($"s").collect()
    assert(sessions.length === 2)
    assert(sessions(0).getLong(3) === 2L) // the exact-gap pair merged
    assert(sessions(0).getLong(2) === (30L + 30L) * 60000000L) // end = last + gap
    assert(sessions(1).getLong(3) === 1L)
  }

  test("an21: transition counts partition the non-terminal events; floor probs") {
    val sf = "/root/testdata/sf0.001"
    val out = EventQueries.an21TransitionMatrix(spark, sf).collect()
    val events = graft.Tables.load(spark, sf, "events")
    val nUsers = events.select("user_id").distinct().count()
    val nEvents = events.count()
    // every event except each user's last contributes exactly one transition
    assert(out.map(_.getLong(2)).sum === nEvents - nUsers)
    // floor-division probabilities: per from_type they sum to within
    // (group size) basis points below exactly 10000
    out.groupBy(_.getString(0)).foreach { case (_, rows) =>
      val s = rows.map(_.getLong(3)).sum
      assert(s <= 10000L && s > 10000L - rows.length)
    }
  }

  test("an23: robust outliers uses the LOWER discrete median on even groups") {
    val sf = "/root/testdata/sf0.001"
    val out = EventQueries.an23RobustOutliers(spark, sf).collect()
    val ev = graft.Tables.load(spark, sf, "events")
    out.foreach { r =>
      val (t, med, mad, nOut, n) =
        (r.getString(0), r.getDouble(1), r.getDouble(2), r.getLong(3), r.getLong(4))
      val vals = ev.filter($"event_type" === t)
        .select($"value", $"event_id").collect()
        .map(x => (x.getDouble(0), x.getLong(1))).sortBy(identity)
      assert(n === vals.length)
      // lower median: element at 1-based rank (n+1)/2 — an ACTUAL value
      assert(med === vals(((vals.length + 1) / 2) - 1)._1)
      val ads = vals.map(v => (math.abs(v._1 - med), v._2)).sortBy(identity)
      assert(mad === ads(((ads.length + 1) / 2) - 1)._1)
      assert(nOut === ads.count(_._1 > 3 * mad))
    }
  }

  test("an22: overlap diagonal is the per-type distinct count; matrix symmetric") {
    val sf = "/root/testdata/sf0.001"
    val out = EventQueries.an22TypeOverlap(spark, sf).collect()
      .map(r => ((r.getString(0), r.getString(1)), (r.getLong(2), r.getLong(3)))).toMap
    val ev = graft.Tables.load(spark, sf, "events")
    ev.select("user_id", "event_type").distinct()
      .groupBy("event_type").count().collect().foreach { r =>
        val t = r.getString(0)
        assert(out((t, t)) === ((r.getLong(1), 10000L))) // self-Jaccard = 1
      }
    out.keys.foreach { case (a, b) => assert(out((a, b)) === out((b, a))) }
  }

  test("sk2: salted replicate join equals the plain join aggregate") {
    val sf = "/root/testdata/sf0.001"
    val out = EventQueries.sk2SaltedJoin(spark, sf).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getDouble(2), r.getLong(3))).toSet
    val ev = graft.Tables.load(spark, sf, "events")
    val plain = ev
      .groupBy($"event_type")
      .agg(round(sum($"value".cast("decimal(18,4)") * length($"event_type")), 2)
        .cast("double").as("wv"), count(lit(1)).as("n"))
      .collect()
      .map(r => (r.getString(0), r.getString(0).length.toLong, r.getDouble(1), r.getLong(2)))
      .toSet
    assert(out === plain)
  }

  test("an34: retention matrix — offset-0 cells are full cohorts; counts bounded by cohort size") {
    val sf = "/root/testdata/sf0.001"
    val out = EventQueries.an34Retention(spark, sf).collect()
      .map(r => (r.getDate(0).toString, r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
    assert(out.nonEmpty)
    // every user is active on their own cohort day: offset 0 = the cohort
    out.filter(_._2 == 0L).foreach { case (c, _, active, n, bp) =>
      assert(active === n, s"cohort $c"); assert(bp === 10000L, s"cohort $c")
    }
    // no cell exceeds its cohort; offsets are non-negative
    out.foreach { case (c, off, active, n, bp) =>
      assert(off >= 0L, s"$c"); assert(active <= n, s"$c+$off")
      assert(bp === active * 10000L / n, s"$c+$off")
    }
    // ordering contract: (cohort_day, day_offset)
    assert(out.map(x => (x._1, x._2)).sortBy(identity).toSeq ===
      out.map(x => (x._1, x._2)).toSeq)
  }
}
