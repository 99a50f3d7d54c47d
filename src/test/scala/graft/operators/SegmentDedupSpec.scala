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
    // doc 9 — doc 5 wins because (5, 1) < (9, 0) under the struct order
    val out = run(Seq(
      (9L, "k l m t u v"),
      (5L, "p q r k l m")))
    assert(out.find(_._1 == 5L).get === ((5L, 2L, 2L, "p q r k l m")))
    assert(out.find(_._1 == 9L).get === ((9L, 2L, 1L, "t u v")))
  }

  test("string-keyed corpus: the keeper order follows the id's own type") {
    // the r8 hazard: a string id was silently cast to long → all-null
    // doc_ids → one garbage group. Now the struct keeper orders
    // lexicographically and doc_id round-trips as a string.
    val out = Corpus.segmentDedup(
        Seq(("beta", "a b c x y z"), ("alpha", "a b c q r s"))
          .toDF("doc_id", "text"), "doc_id", "text", segWords = 3)
      .orderBy($"doc_id").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getString(3)))
    assert(out(0) === (("alpha", 2L, 2L, "a b c q r s")))
    assert(out(1) === (("beta", 2L, 1L, "x y z")))
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

  // ---- t28: exact duplicated-substring spans ------------------------

  private def words(prefix: String, n: Int): String =
    (1 to n).map(i => s"$prefix$i").mkString(" ")

  private def runExact(rows: Seq[(Long, String)], k: Int = 10) =
    Corpus.exactSpans(rows.toDF("doc_id", "text"), "doc_id", "text", k)
      .orderBy($"doc_id", $"span_start", $"src_doc")
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5)))

  test("t28: a full copy returns one whole-document span at delta 0") {
    val a = words("a", 40)
    val out = runExact(Seq((1L, a), (2L, a)))
    // (doc, start, end, n_words, src_doc, src_start)
    assert(out.toSeq === Seq((2L, 1L, 40L, 40L, 1L, 1L)))
  }

  test("t28: chimera splits at the junction with correct per-half attribution") {
    // doc 3 = A[5..24] ++ 5 unique words ++ B[1..15]: two exact spans
    // with DIFFERENT sources; nothing may bridge the unique middle
    val a = words("a", 40)
    val b = words("b", 30)
    val chimera = ((5 to 24).map(i => s"a$i") ++ (1 to 5).map(i => s"u$i") ++
      (1 to 15).map(i => s"b$i")).mkString(" ")
    val out = runExact(Seq((1L, a), (2L, b), (3L, chimera)))
    assert(out.toSeq === Seq(
      (3L, 1L, 20L, 20L, 1L, 5L),
      (3L, 26L, 40L, 15L, 2L, 1L)))
  }

  test("t28: exactness where t20's windowed islands over-merge") {
    // X = P ++ Q, with P repeated in doc 1 and Q in doc 2 but "PQ"
    // occurring nowhere as one string. t20's island rule (gap <= k)
    // merges positions 1 and 11 into a single [1,20] span — a span
    // that is NOT a duplicate of anything; exactSpans must emit two
    // 10-word spans, each provably identical to its source.
    val p = words("p", 10)
    val q = words("q", 10)
    val docB = words("z", 5) + " " + p + " " + words("w", 5)  // P at pos 6
    val docC = words("y", 3) + " " + q + " " + words("v", 7)  // Q at pos 4
    val docX = p + " " + q
    val corpus = Seq((1L, docB), (2L, docC), (3L, docX))
    val exact = runExact(corpus)
    assert(exact.toSeq === Seq(
      (3L, 1L, 10L, 10L, 1L, 6L),
      (3L, 11L, 20L, 10L, 2L, 4L)))
    // and t20 on the same corpus DOES report the spliced [1,20] island
    // — the approximation t28 exists to correct
    val t20 = Corpus.repeatedSpans(corpus.toDF("doc_id", "text"),
        "doc_id", "text", k = 10)
      .filter($"doc_id" === 3L).collect()
      .map(r => (r.getLong(1), r.getLong(2)))
    assert(t20.toSeq === Seq((1L, 20L)))
  }

  test("t28: every reported span is word-identical to its source slice") {
    val rnd = new scala.util.Random(13)
    val vocab = (0 until 60).map(i => s"w$i")
    val docs = (1L to 12L).map(id =>
      id -> (0 until 35).map(_ => vocab(rnd.nextInt(60))).mkString(" ")).toMap
    // plant copies and a chimera over the random base
    val corpus = docs.toSeq ++ Seq(
      101L -> docs(3L),
      102L -> (docs(5L).split(" ").take(18) ++ docs(9L).split(" ").take(18))
        .mkString(" "))
    val out = runExact(corpus)
    assert(out.nonEmpty)
    val byId = corpus.toMap.map { case (id, t) => id -> t.split(" ") }
    out.foreach { case (doc, s, e, n, src, srcStart) =>
      assert(n === e - s + 1)
      val mine = byId(doc).slice(s.toInt - 1, e.toInt)
      val theirs = byId(src).slice(srcStart.toInt - 1, srcStart.toInt - 1 + n.toInt)
      assert(mine.toSeq === theirs.toSeq,
        s"span ($doc,$s,$e) != source ($src,$srcStart)")
    }
  }

  test("t28: hot boilerplate emits keeper pairs, not all-pairs") {
    // 30 copies of one doc: 29 spans (each vs the keeper), never 435
    val a = words("a", 25)
    val corpus = (1L to 30L).map(id => (id, a))
    val out = runExact(corpus)
    assert(out.length === 29)
    assert(out.forall { case (_, s, e, n, src, ss) =>
      s == 1L && e == 25L && n == 25L && src == 1L && ss == 1L })
  }

  test("t28: no corpus-sized unpartitioned window in the plan") {
    val df = Corpus.exactSpans(
      Seq((1L, words("a", 12))).toDF("doc_id", "text"), "doc_id", "text")
    val plan = df.queryExecution.optimizedPlan.toString()
    assert(!plan.contains("windowspecdefinition()"))
  }

  test("t28: string-keyed corpus — src_doc keeps the id's own type") {
    // mirrors t30's any-id contract; the keeper is the lexicographic
    // first (aa-1 < zz-9), and src_doc comes back as a string
    val a = words("a", 40)
    val out = Corpus.exactSpans(
        Seq(("zz-9", a), ("aa-1", a)).toDF("doc_id", "text"),
        "doc_id", "text")
      .collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getString(4), r.getLong(5)))
    assert(out.toSeq === Seq(("zz-9", 1L, 40L, 40L, "aa-1", 1L)))
  }

  test("t28: ids past the old 9.2e13 encoding bound and negative ids work") {
    // both silently corrupted under the retired doc_id*100000+pos
    // encoding (overflow / broken div-mod decode)
    val a = words("a", 25)
    val out = runExact(Seq((-5L, a), (200000000000000L, a)))
    assert(out.toSeq === Seq((200000000000000L, 1L, 25L, 25L, -5L, 1L)))
  }

  // ---- t31: excision of exact duplicated substrings -----------------

  private def runExcise(rows: Seq[(Long, String)], k: Int = 10) =
    Corpus.exciseExactDuplicates(rows.toDF("doc_id", "text"),
        "doc_id", "text", k)
      .orderBy($"doc_id")
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getString(3)))

  test("t31: a full copy is excised entirely; the keeper passes byte-identical") {
    val a = words("a", 40)
    val out = runExcise(Seq((1L, a), (2L, a)))
    assert(out(0) === ((1L, 40L, 0L, a)))
    assert(out(1) === ((2L, 40L, 40L, "")))
  }

  test("t31: chimera loses both copied halves; the unique middle survives") {
    val a = words("a", 40)
    val b = words("b", 30)
    val chimera = ((5 to 24).map(i => s"a$i") ++ (1 to 5).map(i => s"u$i") ++
      (1 to 15).map(i => s"b$i")).mkString(" ")
    val out = runExcise(Seq((1L, a), (2L, b), (3L, chimera)))
    assert(out(0) === ((1L, 40L, 0L, a)))
    assert(out(1) === ((2L, 30L, 0L, b)))
    assert(out(2) === ((3L, 40L, 35L, (1 to 5).map(i => s"u$i").mkString(" "))))
  }

  test("t31: within-document repetition keeps the first occurrence") {
    val p = words("p", 10)
    val doc = p + " x1 x2 " + p
    val out = runExcise(Seq((1L, doc)))
    assert(out(0) === ((1L, 22L, 10L, p + " x1 x2")))
  }

  test("t31: periodic text keeps the keeper window's words (self-overlap)") {
    // "w" x 12 spawns windows at pos 1,2,3 sharing one hash; only
    // (doc,1) is the keeper. Unprotected, the non-keepers at pos 2,3
    // would cover 2..12 and excise 9 of the keeper window's 10 words —
    // the duplicated text would survive ZERO times. Protected, excised
    // = (2..12) minus keeper span (1..10) = {11,12}.
    val out = runExcise(Seq((1L, Seq.fill(12)("w").mkString(" "))))
    assert(out(0) === ((1L, 12L, 2L, Seq.fill(10)("w").mkString(" "))))
  }

  test("t31: keeper spans are protected from overlapping non-keeper windows") {
    // Doc 1 = x1..x5 c1..c10. Its pos-1 window (x1..x5 c1..c5) first
    // appeared in doc 0; its pos-6 window (c1..c10) is the KEEPER for
    // doc 5's copy. The non-keeper cover 1..10 overlaps the keeper
    // span 6..15: only 1..5 is excised, so C survives exactly once —
    // at its first occurrence, inside doc 1.
    val y = ((1 to 5).map(i => s"x$i") ++ (1 to 5).map(i => s"c$i")).mkString(" ")
    val c = (1 to 10).map(i => s"c$i").mkString(" ")
    val b = ((1 to 5).map(i => s"x$i") ++ (1 to 10).map(i => s"c$i")).mkString(" ")
    val out = runExcise(Seq((0L, y), (1L, b), (5L, c)))
    assert(out(0) === ((0L, 10L, 0L, y)))
    assert(out(1) === ((1L, 15L, 5L, c)))
    assert(out(2) === ((5L, 10L, 10L, "")))
  }

  test("t31: string ids excise correctly (no silent cast)") {
    val a = words("a", 30)
    val out = Corpus.exciseExactDuplicates(
        Seq(("w-2", a), ("w-10", a)).toDF("doc_id", "text"),
        "doc_id", "text")
      .orderBy($"doc_id").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getString(3)))
    // "w-10" < "w-2" lexicographically: w-10 is the keeper
    assert(out.toSeq === Seq(("w-10", 30L, 0L, a), ("w-2", 30L, 30L, "")))
  }

  test("t31: clean and sub-k docs pass through untouched; one hash-keyed window") {
    val out = runExcise(Seq((1L, "only seven words here nothing repeats once"),
      (2L, "tiny")))
    assert(out(0) === ((1L, 7L, 0L, "only seven words here nothing repeats once")))
    assert(out(1) === ((2L, 1L, 0L, "tiny")))
    val df = Corpus.exciseExactDuplicates(
      Seq((1L, words("a", 12))).toDF("doc_id", "text"), "doc_id", "text")
    // r13 shape: keeper discovery is ONE min/count window over the
    // hash key (one shuffle of the window relation, in place of the
    // old groupBy + join-back pair); no doc-spanning or unpartitioned
    // window anywhere
    val plan = df.queryExecution.optimizedPlan.toString
    assert(plan.split("Window \\[").length - 1 === 1,
      s"expected exactly one Window node:\n$plan")
    assert(plan.contains("windowspecdefinition(h#") ||
      plan.contains("], [h#"), s"window must partition on the hash key:\n$plan")
  }

  // ---- content-defined chunking (t34) --------------------------------

  private val baseWords: Seq[String] =
    (0 until 60).map(i => s"tok${(i * 7) % 13}v$i")
  private def chunksOf(rows: Seq[(Long, String)]): Map[Long, Seq[String]] =
    Corpus.cdcChunks(rows.toDF("doc_id", "text"), "doc_id", "text")
      .orderBy($"doc_id", $"chunk_id").collect()
      .map(r => (r.getLong(0), r.getString(3)))
      .groupBy(_._1).view.mapValues(_.map(_._2).toSeq).toMap

  test("cdcChunks: words are conserved and chunks partition each doc") {
    val text = baseWords.mkString(" ")
    val out = Corpus.cdcChunks(
        Seq((1L, text), (2L, ""), (3L, null.asInstanceOf[String]))
          .toDF("doc_id", "text"), "doc_id", "text")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(out.forall(_._1 == 1L), "empty/null docs emit no chunks")
    assert(out.map(_._3).sum === 60L, "chunk word counts sum to the doc")
    assert(out.map(_._2).sorted.toSeq === (0L until out.length).toSeq,
      "chunk ids are dense from 0")
    assert(out.length > 1, "a 60-word doc must cut at least once (P=1/8)")
  }

  test("cdcChunks: an appended tail leaves every earlier chunk identical") {
    val a = baseWords.mkString(" ")
    val c = a + " tail0 tail1 tail2"
    val fps = chunksOf(Seq((1L, a), (2L, c)))
    // fixed-offset segmenting also survives appends; the pin here is
    // that CDC does too: all of A's chunks except possibly the last
    // recur in C byte-identically
    assert(fps(1L).dropRight(1).toSet.subsetOf(fps(2L).toSet))
  }

  test("cdcChunks: a prepended edit resynchronizes after the first boundary") {
    val a = baseWords.mkString(" ")
    val b = "zzz " + a
    val fps = chunksOf(Seq((1L, a), (2L, b)))
    // the shift-robustness claim (what segmentDedup loses on shifted
    // text): boundary windows see content, not offsets, so every A
    // chunk after A's first cut recurs in the prepended doc
    assert(fps(1L).drop(1).toSet.subsetOf(fps(2L).toSet))
    assert(fps(1L).drop(1).nonEmpty, "fixture must have >1 chunk")
    // and the fixed-width contrast: 3-word segments of A vs B share
    // NOTHING once shifted by one word (disjoint word windows)
    val segA = baseWords.grouped(3).map(_.mkString(" ")).toSet
    val segB = ("zzz" +: baseWords).grouped(3).map(_.mkString(" ")).toSet
    assert((segA & segB).isEmpty)
  }
}
