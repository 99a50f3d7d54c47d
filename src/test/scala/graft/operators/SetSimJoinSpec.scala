package graft.operators

import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** Pins [[SetSimJoin.jaccardJoin]] — exact prefix-filtered set
  * similarity — against a brute-force all-pairs computation: the
  * prefix filter is a LOSSLESS candidate pruner, so the two must be
  * identical for every τ, including boundary pairs sitting exactly on
  * the threshold. */
class SetSimJoinSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._
  import org.apache.spark.sql.functions._

  val docs = Seq(
    (1L, "a b c d e f g h"),
    (2L, "a b c d e f g z"),     // 7/9 with doc 1
    (3L, "a b c d"),             // 4/8 with doc 1 — exactly 1/2
    (4L, "p q r s t u v w"),     // disjoint from 1-3
    (5L, "p q r s t u v w"),     // identical to 4 — jaccard 1
    (6L, "m n"),                 // tiny set
    (7L, "m n")                  // identical tiny set
  ).toDF("doc_id", "text")

  private def brute(tauNum: Int, tauDen: Int): Set[(Long, Long, Long, Long)] = {
    val sets = docs.collect().map(r =>
      r.getLong(0) -> r.getString(1).split(" ").toSet).toMap
    (for {
      a <- sets.keys; b <- sets.keys if a < b
      i = (sets(a) & sets(b)).size.toLong
      u = (sets(a) | sets(b)).size.toLong
      if tauDen * i >= tauNum * u
    } yield (a, b, i, u)).toSet
  }

  private def run(tauNum: Int, tauDen: Int): Set[(Long, Long, Long, Long)] =
    SetSimJoin.jaccardJoin(SetSimJoin.wordSets(docs, "doc_id", "text"), tauNum, tauDen)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .toSet

  test("prefix-filtered join equals brute force at several thresholds") {
    for ((n, d) <- Seq((1, 2), (3, 5), (7, 10), (9, 10), (1, 1)))
      assert(run(n, d) === brute(n, d), s"tau=$n/$d")
  }

  test("threshold boundary: a pair at exactly tau is kept") {
    // docs 1 & 3: inter=4, union=8 — exactly 1/2
    assert(run(1, 2).contains((1L, 3L, 4L, 8L)))
    // and excluded just above the boundary
    assert(!run(51, 100).exists(p => p._1 == 1L && p._2 == 3L))
  }

  test("identical docs report jaccard 1.0 at tau = 1") {
    val full = SetSimJoin.jaccardJoin(
        SetSimJoin.wordSets(docs, "doc_id", "text"), 1, 1)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(4))).toSet
    assert(full === Set((4L, 5L, 1.0), (6L, 7L, 1.0)))
  }

  test("shingle-token variant finds the near-dup and not the disjoint pair") {
    val tok = Dedup.shingles(docs, "doc_id", "text", k = 3)
      .withColumnRenamed("shingle", "tok")
    val pairs = SetSimJoin.jaccardJoin(tok, 1, 2)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    // 3-shingles: docs 1/2 share 5 of 6+6 distinct shingles (5/7 >= 1/2);
    // identical docs 4/5 and the tiny pair (below the 3-word floor) drop out
    assert(pairs === Set((1L, 2L), (4L, 5L)))
  }

  test("candidate generation never inflates results: output pairs are distinct") {
    val out = SetSimJoin.jaccardJoin(
      SetSimJoin.wordSets(docs, "doc_id", "text"), 1, 2).collect()
    val keys = out.map(r => (r.getLong(0), r.getLong(1)))
    assert(keys.length === keys.distinct.length)
  }

  // ---- containmentJoin ----------------------------------------------

  val cdocs = Seq(
    (1L, "a b c d e f g h i j"),
    (2L, "a b c"),                // subset of 1: C(2->1)=1, C(1->2)=0.3
    (3L, "a b c z"),              // 3/4 of it inside 1
    (4L, "p q r s"),              // disjoint
    (5L, "p q r s"),              // identical to 4: both directions 1
    (6L, "a b c d e f g h i j")   // identical to 1
  ).toDF("doc_id", "text")

  private def bruteContain(tauNum: Int, tauDen: Int): Set[(Long, Long, Long, Long, Long)] = {
    val sets = cdocs.collect().map(r =>
      r.getLong(0) -> r.getString(1).split(" ").toSet).toMap
    (for {
      a <- sets.keys; b <- sets.keys if a != b
      i = (sets(a) & sets(b)).size.toLong
      la = sets(a).size.toLong; lb = sets(b).size.toLong
      if tauDen * i >= tauNum * la
    } yield (a, b, i, la, lb)).toSet
  }

  private def runContain(tauNum: Int, tauDen: Int): Set[(Long, Long, Long, Long, Long)] =
    SetSimJoin.containmentJoin(
        SetSimJoin.wordSets(cdocs, "doc_id", "text"), tauNum, tauDen)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
      .toSet

  test("containment join equals brute force at several thresholds") {
    for ((n, d) <- Seq((1, 2), (3, 4), (9, 10), (1, 1)))
      assert(runContain(n, d) === bruteContain(n, d), s"tau=$n/$d")
  }

  test("containment is directional: the subset direction fires, the reverse does not") {
    val out = runContain(9, 10)
    assert(out.exists(p => p._1 == 2L && p._2 == 1L))   // C(2->1) = 1
    assert(!out.exists(p => p._1 == 1L && p._2 == 2L))  // C(1->2) = 3/10
  }

  test("an excerpt pair invisible to Jaccard is found by containment") {
    // C(2->1) = 1 but Jaccard(1,2) = 3/10: jaccardJoin at tau=9/10
    // can never emit it, containmentJoin must
    val j = SetSimJoin.jaccardJoin(
        SetSimJoin.wordSets(cdocs, "doc_id", "text"), 9, 10)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(!j.contains((1L, 2L)) && !j.contains((2L, 1L)))
    assert(runContain(9, 10).exists(p => p._1 == 2L && p._2 == 1L))
  }

  test("identical docs contain each other in both directions at tau = 1") {
    val out = runContain(1, 1).filter(p => Set(p._1, p._2) == Set(4L, 5L) ||
      Set(p._1, p._2) == Set(1L, 6L))
    assert(out.map(p => (p._1, p._2)) ===
      Set((4L, 5L), (5L, 4L), (1L, 6L), (6L, 1L)))
  }

  test("threshold boundary: containment exactly at tau is kept, above is cut") {
    // doc 3 -> doc 1: inter=3, la=4 — exactly 3/4
    assert(runContain(3, 4).exists(p => p._1 == 3L && p._2 == 1L))
    assert(!runContain(76, 100).exists(p => p._1 == 3L && p._2 == 1L))
  }
}
