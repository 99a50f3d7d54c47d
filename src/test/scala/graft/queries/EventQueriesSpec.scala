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
}
