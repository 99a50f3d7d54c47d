package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** Corpus.segmentDedup — the C4/RefinedWeb "deduplicate by line" rule
  * over fixed-width word segments. Pins the first-occurrence total
  * order, surgical (segment-level, not document-level) removal, and
  * the ragged-tail / empty-document edges the oracle SQL must match.
  */
class SegmentDedupSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  // 3-word segments keep the fixtures readable
  private def run(rows: Seq[(Long, String)]) =
    Corpus.segmentDedup(rows.toDF("doc_id", "text"), "doc_id", "text", segWords = 3)
      .orderBy($"doc_id")
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getString(3)))

  test("duplicate segment keeps only the globally-first occurrence") {
    val out = run(Seq(
      (1L, "a b c x y z"),   // segments: "a b c", "x y z"
      (2L, "a b c q r s"))) // "a b c" is a dup of doc 1's first segment
    assert(out(0) === ((1L, 2L, 2L, "a b c x y z")))
    assert(out(1) === ((2L, 2L, 1L, "q r s")))
  }

  test("a full-copy document loses every segment") {
    val out = run(Seq(
      (1L, "a b c d e f"),
      (2L, "a b c d e f")))
    assert(out(0) === ((1L, 2L, 2L, "a b c d e f")))
    assert(out(1) === ((2L, 2L, 0L, "")))
  }

  test("within-document repetition is deduplicated too") {
    val out = run(Seq((1L, "a b c a b c x y z")))
    assert(out(0) === ((1L, 3L, 2L, "a b c x y z")))
  }

  test("first occurrence is by (doc_id, seg_no), not input order") {
    // the shared segment sits at position 1 in doc 5 and position 0 in
    // doc 9 — doc 5 wins because 5*100000+1 < 9*100000+0
    val out = run(Seq(
      (9L, "k l m t u v"),
      (5L, "p q r k l m")))
    assert(out.find(_._1 == 5L).get === ((5L, 2L, 2L, "p q r k l m")))
    assert(out.find(_._1 == 9L).get === ((9L, 2L, 1L, "t u v")))
  }

  test("ragged tail segment is its own (shorter) segment") {
    val out = run(Seq(
      (1L, "a b c d"),       // "a b c" + tail "d"
      (2L, "d")))            // whole doc = "d" → dup of doc 1's tail
    assert(out(0) === ((1L, 2L, 2L, "a b c d")))
    assert(out(1) === ((2L, 1L, 0L, "")))
  }

  test("reassembly preserves original segment order") {
    val out = run(Seq(
      (1L, "m n o a b c z z z"),
      (2L, "a b c m n o w w w")))
    // doc 2 keeps only its unique tail; order within doc 1 intact
    assert(out(0)._4 === "m n o a b c z z z")
    assert(out(1)._4 === "w w w")
  }

  test("no corpus-sized unpartitioned window in the plan") {
    val df = Corpus.segmentDedup(
      Seq((1L, "a b c")).toDF("doc_id", "text"), "doc_id", "text", 3)
    val plan = df.queryExecution.optimizedPlan.toString()
    // every Window node must carry a partition spec
    assert(!plan.contains("windowspecdefinition()"))
  }
}
