package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

class CorpusQuantizeSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  // ---- Corpus.redactPii ---------------------------------------------

  test("redactPii replaces emails and phone runs, counts from the original text") {
    val df = Seq(
      (1L, "write a.b-c%d@mail.example.org or call 555-1234 now"),
      (2L, "no pii here"),
      (3L, "two mails x@y.io and z@w.ai, digits 123-4567 890-1111")
    ).toDF("doc_id", "text")
    val out = Corpus.redactPii(df, "text")
      .select("doc_id", "n_emails", "n_phones", "redacted")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getString(3)))
      .sortBy(_._1)
    assert(out(0) === ((1L, 1L, 1L, "write <EMAIL> or call <PHONE> now")))
    assert(out(1) === ((2L, 0L, 0L, "no pii here")))
    assert(out(2) === ((3L, 2L, 2L, "two mails <EMAIL> and <EMAIL>, digits <PHONE> <PHONE>")))
  }

  // ---- Corpus.redactCards (Luhn) ------------------------------------

  test("redactCards validates the Luhn checksum and redacts only valid cards") {
    val df = Seq(
      // 4532-0151-1283-0366 is Luhn-valid; 1234-5678-9012-3456 is not
      (1L, "pay 4532-0151-1283-0366 or quote 1234-5678-9012-3456 thanks"),
      (2L, "all zeros 0000-0000-0000-0000 is trivially valid"),
      (3L, "no cards, just a date 2024-0101 and words"),
      (4L, "two valid 4532-0151-1283-0366 and 1111-1111-1111-1117 here")
    ).toDF("doc_id", "text")
    val out = Corpus.redactCards(df, "text")
      .select("doc_id", "n_card_candidates", "n_cards_valid", "redacted")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getString(3)))
      .sortBy(_._1)
    assert(out(0) === ((1L, 2L, 1L,
      "pay <CARD> or quote 1234-5678-9012-3456 thanks")))
    assert(out(1) === ((2L, 1L, 1L, "all zeros <CARD> is trivially valid")))
    assert(out(2) === ((3L, 0L, 0L, "no cards, just a date 2024-0101 and words")))
    assert(out(3) === ((4L, 2L, 2L, "two valid <CARD> and <CARD> here")))
  }

  test("luhnValid agrees with a driver-side Luhn implementation") {
    def luhnRef(digits: String): Boolean = {
      val s = digits.zipWithIndex.map { case (ch, i0) =>
        val d = ch - '0'
        if ((i0 + 1) % 2 == 1) { val x = d * 2; if (x > 9) x - 9 else x } else d
      }.sum
      s % 10 == 0
    }
    // every check digit 0..9 on one payload: exactly one must validate
    val payload = "453201511283036"
    val cands = (0 to 9).map(c => s"$payload$c")
      .map(d => s"${d.substring(0, 4)}-${d.substring(4, 8)}-${d.substring(8, 12)}-${d.substring(12, 16)}")
    val got = cands.toDF("card")
      .select($"card", Corpus.luhnValid($"card").as("ok"))
      .as[(String, Boolean)].collect().toMap
    cands.foreach { card =>
      assert(got(card) === luhnRef(card.replace("-", "")), s"luhnValid($card)")
    }
    assert(got.values.count(identity) === 1)
  }

  // ---- Corpus.gopherRules -------------------------------------------

  test("gopherRules: each rule fires on its planted violation class") {
    val pass = ("word " * 48 + "the of").trim             // 50 words, the+of stopwords
    val docs = Seq(
      (1L, pass),                                       // all rules pass
      (2L, "the of tiny"),                              // word count < 50
      (3L, ("xxxxxxxxxxxxxxx " * 49 + "the of").trim),  // mean len 15 > 10
      (4L, ("word " * 42 + "the of " + "# " * 6).trim),    // 10*6 >= 50 words w/ syms
      (5L, pass + "\n- a\n- b\n- c\n- d\n- e\n- f\n- g\n- h\n- i\n- j"), // 10/11 bullets
      (6L, pass + "\nmore...\nagain..."),               // 2/3 ellipsis lines
      (7L, ("9 " * 30 + "word " * 18 + "the of").trim),    // alpha 20/50 < 80%
      (8L, ("word " * 49 + "the").trim)                    // only 1 stopword
    ).toDF("doc_id", "text")
    val out = Corpus.gopherRules(docs, "text")
      .select("doc_id", "r_count", "r_mean_len", "r_symbol", "r_bullet",
        "r_ellipsis", "r_alpha", "r_stop", "keep")
      .collect()
      .map(r => r.getLong(0) -> (r.getBoolean(1), r.getBoolean(2), r.getBoolean(3),
        r.getBoolean(4), r.getBoolean(5), r.getBoolean(6), r.getBoolean(7),
        r.getBoolean(8)))
      .toMap
    assert(out(1L) === ((true, true, true, true, true, true, true, true)))
    assert(!out(2L)._1 && !out(2L)._8)                 // count rule
    assert(!out(3L)._2 && !out(3L)._8)                 // mean-length rule
    assert(!out(4L)._3 && !out(4L)._8)                 // symbol rule
    assert(!out(5L)._4 && !out(5L)._8)                 // bullet rule
    assert(!out(6L)._5 && !out(6L)._8)                 // ellipsis rule
    assert(!out(7L)._6 && !out(7L)._8)                 // alpha rule
    assert(!out(8L)._7 && !out(8L)._8)                 // stopword rule
  }

  test("gopherRules boundary arithmetic: exactly-at-threshold cases") {
    // 50 words exactly -> count passes; 10 syms in 100 words: 10*10 < 100
    // is FALSE (ratio exactly 0.1 fails, Rae's strict <)
    val hundred = ("word " * 88 + "the of " + "# " * 10).trim
    val out = Corpus.gopherRules(Seq((1L, hundred)).toDF("doc_id", "text"), "text")
      .select("n_words", "sym_hits", "r_symbol").collect().head
    assert(out.getLong(0) === 100L && out.getLong(1) === 10L)
    assert(!out.getBoolean(2))
  }

  // ---- Corpus.repetitionStats ---------------------------------------

  test("normalizeUrl: case, www, default port, trailing slash, utm filter, param sort, fragment") {
    val cases = Seq(
      // scheme+host lowercase; :80 stripped for http; www. stripped;
      // trailing slashes trimmed; PATH case preserved
      ("HTTP://WWW.Example.COM:80/A/B/", "http://example.com/A/B"),
      // :80 is NOT https's default port — it stays
      ("https://h.com:80/x", "https://h.com:80/x"),
      ("https://h.com:443/x", "https://h.com/x"),
      // utm_* dropped, survivors sorted, fragment dropped
      ("https://h.com/p?z=1&utm_x=9&a=2#f", "https://h.com/p?a=2&z=1"),
      // empty path canonicalizes to /; bare root unchanged
      ("https://h.com", "https://h.com/"),
      ("https://h.com/", "https://h.com/"),
      // a '?' inside the fragment is fragment text, not a query
      ("https://h.com/p#f?x=1", "https://h.com/p"),
      // all params dropped -> no dangling '?'
      ("https://h.com/p?utm_only=1", "https://h.com/p"),
      // non-URL strings pass through untouched
      ("not a url", "not a url"))
    val out = cases.map(_._1).toDF("url")
      .select($"url", Corpus.normalizeUrl($"url").as("canon"))
      .as[(String, String)].collect().toMap
    cases.foreach { case (raw, want) =>
      assert(out(raw) === want, s"normalizeUrl($raw)")
    }
  }

  test("repetitionStats on a hand-computed document") {
    // "a a b a": n=4, distinct=2, dup_bp = 2*10000 div 4 = 5000
    // bigrams: "a a"(1), "a b"(1), "b a"(1) -> top = "a a" (lex-first tie), top_bp = 10000 div 3 = 3333
    val df = Seq((1L, "a a b a"), (2L, "solo"), (3L, "x  y")).toDF("doc_id", "text")
    val out = Corpus.repetitionStats(df, "doc_id", "text").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getString(4), r.getLong(5), r.getLong(6))).sortBy(_._1)
    // doc 2 has < 2 words -> no row; doc 3's double space yields empty token (filtered)
    assert(out.map(_._1).toSeq === Seq(1L, 3L))
    assert(out(0) === ((1L, 4L, 2L, 5000L, "a a", 1L, 3333L)))
    assert(out(1) === ((3L, 2L, 2L, 0L, "x y", 1L, 10000L)))
  }

  test("repetitionStats bounds: dup_bp and top_bp stay in [0, 10000]") {
    val docs = (1 to 50).map(i => (i.toLong, Seq.fill(i % 7 + 2)(s"w${i % 3}").mkString(" ")))
      .toDF("doc_id", "text")
    val bad = Corpus.repetitionStats(docs, "doc_id", "text")
      .filter($"dup_bp" < 0 || $"dup_bp" > 10000 || $"top_bp" < 0 || $"top_bp" > 10000)
    assert(bad.count() === 0)
  }

  // ---- Corpus.decontaminate -----------------------------------------

  test("wordNgrams: sliding windows, short-doc guard, empty-token filter") {
    val df = Seq((1L, "a b c d"), (2L, "a  b"), (3L, "x y")).toDF("doc_id", "text")
    val out = df.select($"doc_id", Corpus.wordNgrams($"text", 3).as("ng"))
      .collect().map(r => (r.getLong(0), r.getSeq[String](1))).sortBy(_._1)
    assert(out(0)._2 === Seq("a b c", "b c d"))
    assert(out(1)._2 === Seq.empty) // 2 words < n (double space filtered)
    assert(out(2)._2 === Seq.empty)
  }

  test("decontaminate flags exactly the docs sharing a benchmark 8-gram") {
    val bench = Seq((100L, "q1 q2 q3 q4 q5 q6 q7 q8 extra words here")).toDF("doc_id", "text")
    val docs = Seq(
      (1L, "clean doc with its own words only nothing shared at all ok"),
      (2L, "prefix words q1 q2 q3 q4 q5 q6 q7 q8 suffix"), // planted
      (3L, "q2 q3 q4 q5 q6 q7 q8 but only seven of them")  // 7-gram only -> clean
    ).toDF("doc_id", "text")
    val out = Corpus.decontaminate(docs, bench, "doc_id", "text", n = 8)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2)))
    assert(out.toSeq === Seq((2L, 1L, "q1 q2 q3 q4 q5 q6 q7 q8")))
  }

  test("t30: span excision cuts exactly the contaminated words, keeps the rest") {
    val bench = Seq((100L, "q1 q2 q3 q4 q5 q6 q7 q8 extra words here")).toDF("doc_id", "text")
    val docs = Seq(
      (1L, "clean doc with its own words only nothing shared at all ok"),
      (2L, "prefix words q1 q2 q3 q4 q5 q6 q7 q8 suffix"),  // mid-doc plant
      (3L, "q2 q3 q4 q5 q6 q7 q8 but only seven of them"),  // 7-gram -> clean
      (4L, "q1 q2 q3 q4 q5 q6 q7 q8"),                       // fully contaminated
      (5L, "short doc")                                      // < n words -> untouched
    ).toDF("doc_id", "text")
    val out = Corpus.decontaminateSpans(docs, bench, "doc_id", "text", n = 8)
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getString(3)))).toMap
    assert(out(1L) === ((12L, 0L, "clean doc with its own words only nothing shared at all ok")))
    // surgical: the 8 planted words go, BOTH sides survive in order
    assert(out(2L) === ((11L, 8L, "prefix words suffix")))
    assert(out(3L)._2 === 0L)                  // a 7-gram overlap is not an 8-gram hit
    assert(out(4L) === ((8L, 8L, "")))         // whole doc was the benchmark span
    assert(out(5L) === ((2L, 0L, "short doc")))
    // overlapping bench 9-gram ("q1..q8 extra"): two overlapping marked
    // windows must remove the UNION (9 words), not double-count
    val doc6 = Seq((6L, "pre q1 q2 q3 q4 q5 q6 q7 q8 extra post")).toDF("doc_id", "text")
    val r6 = Corpus.decontaminateSpans(doc6, bench, "doc_id", "text", n = 8)
      .collect().head
    assert((r6.getLong(1), r6.getLong(2), r6.getString(3)) === ((11L, 9L, "pre post")))
  }

  test("t30: clean docs pass through BYTE-IDENTICAL; ids keep their type; null text is empty") {
    val bench = Seq((100L, "q1 q2 q3 q4 q5 q6 q7 q8")).toDF("doc_id", "text")
    // double space + leading space: a clean doc must NOT be re-tokenized
    val weird = " leading  and  doubled  spaces kept untouched here ok"
    val out = Corpus.decontaminateSpans(
        Seq(("alpha", weird), ("beta", null.asInstanceOf[String]),
          ("gamma", "pre q1 q2 q3 q4 q5 q6 q7 q8 post")).toDF("doc_id", "text"),
        bench, "doc_id", "text", n = 8)
      .collect().map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getString(3)))).toMap
    assert(out("alpha") === ((8L, 0L, weird)))      // verbatim, spaces intact
    assert(out("beta") === ((0L, 0L, "")))          // null text = empty, not -1
    assert(out("gamma") === ((10L, 8L, "pre post"))) // string ids never collapse
  }

  // ---- Corpus.domainMix ---------------------------------------------

  test("domainMix keeps a deterministic subset honoring per-source caps") {
    val docs = (1 to 2000).map(i => (i.toLong, s"src${i % 4}")).toDF("doc_id", "source")
    val out = Corpus.domainMix(docs, "doc_id", "source", expr("100"))
    val kept = out.select("doc_id").as[Long].collect().toSet
    assert(kept.nonEmpty && kept.subsetOf((1 to 2000).map(_.toLong).toSet))
    // equal weights, T = total div 2 => each source targets n_s/2; hash
    // buckets are uniform-ish, keep_bp = 2500 of 10000
    val bySrc = out.groupBy("source").count().as[(String, Long)].collect().toMap
    bySrc.values.foreach(n => assert(n > 50 && n < 450, s"kept $n of 500"))
    // run-stable: same result regardless of physical layout
    val again = Corpus.domainMix(docs.repartition(13), "doc_id", "source", expr("100"))
      .select("doc_id").as[Long].collect().toSet
    assert(again === kept)
  }

  test("domainMix caps keep rate at 10000 bp (oversampled source keeps everything it has)") {
    // src0 has weight 10000x src1: target exceeds its size -> keep all of src0
    val docs = ((1 to 100).map(i => (i.toLong, "src0")) ++
      (101 to 1100).map(i => (i.toLong, "src1"))).toDF("doc_id", "source")
    val w = expr("CASE WHEN src = 'src0' THEN 10000 ELSE 1 END")
    val kept = Corpus.domainMix(docs, "doc_id", "source", w)
      .groupBy("source").count().as[(String, Long)].collect().toMap
    assert(kept("src0") === 100L)
  }

  // ---- Quantize ------------------------------------------------------

  test("quantize: range, zero-vector guard, exact integer self-dot") {
    val emb = Seq(
      (1L, Array(0.5, -1.0, 0.25)),
      (2L, Array(0.0, 0.0, 0.0)),
      (3L, Array(2.0))
    ).toDF("vec_id", "embedding")
    val rows = Quantize.quantize(emb, "vec_id", "embedding")
      .collect().map(r => (r.getLong(0), r.getDouble(1), r.getSeq[Long](2), r.getLong(3), r.getDouble(4)))
      .sortBy(_._1)
    // vec 1: m=1.0 -> q = floor(x*127): [63, -127, 31]
    assert(rows(0)._3 === Seq(63L, -127L, 31L))
    assert(rows(0)._4 === 63L * 63 + 127L * 127 + 31L * 31)
    // vec 2: all-zero -> zeros, err 0
    assert(rows(1)._3 === Seq(0L, 0L, 0L) && rows(1)._4 === 0L && rows(1)._5 === 0.0)
    // vec 3: m=2 -> q=[127], exact reconstruction
    assert(rows(2)._3 === Seq(127L) && rows(2)._5 === 0.0)
    // all components in [-127, 127]
    rows.foreach(_._3.foreach(q => assert(q >= -127 && q <= 127)))
  }

  test("quantizedTopK: k rows per query, exact integer dots, dequantized rank order") {
    val emb = (1 to 40).map { i =>
      (i.toLong, Array.tabulate(8)(j => math.cos(i * 13 + j * 5) * (i % 3 + 1)))
    }.toDF("vec_id", "embedding")
    val out = Quantize.quantizedTopK(emb, emb.filter($"vec_id" <= 2), "vec_id", "embedding", k = 5)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    // exactly k rows per query, query never among its own candidates
    val byQ = out.groupBy(_._1)
    assert(byQ.keySet === Set(1L, 2L))
    byQ.foreach { case (qid, rows) =>
      assert(rows.length === 5)
      assert(!rows.exists(_._2 == qid))
    }
    // qd is the exact integer dot of the two quantized vectors
    val qvec = Quantize.quantize(emb, "vec_id", "embedding")
      .select("vec_id", "q").collect()
      .map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
    out.foreach { case (qid, cid, qd) =>
      val expected = qvec(qid).zip(qvec(cid)).map { case (a, b) => a * b }.sum
      assert(qd === expected, s"qd mismatch for ($qid, $cid)")
    }
  }

  test("product quantization: code shape, self-retrieval, ADC ranks like true L2 on separated clusters") {
    // 3 well-separated groups of 8-dim vectors (m=2 subspaces of 4):
    // group g lives near g*10 in every coordinate, with tiny per-id
    // jitter so vectors are distinct but clusters are unambiguous
    val emb = (0L until 30L).map { i =>
      val g = (i % 3).toDouble
      (i, Array.fill(8)(0.0).zipWithIndex.map { case (_, d) => g * 10.0 + (i.toDouble / 100.0) + d * 0.01 })
    }.toDF("vec_id", "v")
    val books = Quantize.pqCodebooks(emb, m = 2, dim = 8, k = 3, iters = 2)
    // codebooks: one per subspace, k entries of subDim length
    assert(books.count() === 6)
    assert(books.select(size($"cv")).distinct().as[Int].collect().toSeq === Seq(4))
    val codes = Quantize.pqEncode(emb, books, m = 2, dim = 8)
    // every vector gets exactly m codes, each in [0, k)
    assert(codes.count() === 60)
    assert(codes.filter($"code" < 0 || $"code" >= 3).count() === 0)
    assert(codes.groupBy($"vec_id").count().filter($"count" =!= 2).count() === 0)
    // same-group vectors share their code word (clusters are separated
    // by 10 vs jitter ~0.4, so Lloyd cannot split a group)
    val distinctWords = codes.groupBy($"vec_id")
      .agg(array_sort(collect_list(struct($"sub", $"code"))).as("w"))
      .join(emb.select($"vec_id", ($"vec_id" % 3).as("g")), "vec_id")
      .groupBy($"g").agg(countDistinct($"w").as("nw"))
    assert(distinctWords.filter($"nw" =!= 1).count() === 0)
    // ADC: querying with a member of group 0 must rank ALL of group 0
    // (10 vectors, code-identical, adist ties broken by vec_id) first
    val top = Quantize.pqTopK(codes, books, emb.filter($"vec_id" === 0L),
        m = 2, dim = 8, k = 10)
      .select($"vec_id").as[Long].collect().toSet
    assert(top === (0L until 30L by 3L).toSet)
  }

  test("mmrRerank diversifies: near-duplicate candidates cannot monopolize the picks") {
    // candidate page: 3 near-identical "clones" of the best match
    // (rel .99/.98/.97, pairwise sim ~1) + 3 distinct items (rel .9/.8/.7,
    // mutually dissimilar). Plain top-4 by rel = all three clones + one
    // distinct; MMR(λ=0.7) must pick ONE clone then the distinct items —
    // sim ~1 costs a clone 0.3 while a distinct item loses almost nothing.
    def v(x: Double, y: Double) = Array(x, y, 0.1, 0.1)
    val cands = Seq(
      (1L, v(10, 0.00), 0.99), (2L, v(10, 0.01), 0.98), (3L, v(10, 0.02), 0.97),
      (4L, v(0.0, 10.0), 0.90), (5L, v(-10, 0.0), 0.80), (6L, v(0.0, -10), 0.70)
    ).toDF("vec_id", "v", "rel")
    val picks = Similarity.mmrRerank(cands, k = 4)
      .orderBy($"pick").select($"vec_id").as[Long].collect().toSeq
    assert(picks.head === 1L, "first pick is pure relevance")
    assert(picks.toSet === Set(1L, 4L, 5L, 6L),
      s"MMR must spend picks 2-4 on the diverse items, got $picks")
    // determinism across layouts
    val again = Similarity.mmrRerank(cands.repartition(7), k = 4)
      .orderBy($"pick").select($"vec_id").as[Long].collect().toSeq
    assert(again === picks)
  }

  test("quantize reconstruction error is bounded by one quantization step") {
    val emb = (1 to 200).map { i =>
      (i.toLong, Array.tabulate(16)(j => math.sin(i * 31 + j * 7) * (i % 5 + 1)))
    }.toDF("vec_id", "embedding")
    val step = Quantize.quantize(emb, "vec_id", "embedding")
      .filter($"err" > $"max_abs" / 127.0 + 1e-6)
    assert(step.count() === 0)
  }

  // ---- Corpus.bigramLmScores ---------------------------------------

  test("bigram LM: hand-computed add-one probabilities on a 3-doc corpus") {
    val df = Seq(
      (1L, "a b a"),   // bigrams: (a b), (b a)
      (2L, "a b"),     // (a b)
      (3L, "b a b"),   // (b a), (a b)
      (4L, "x")        // < 2 words — no row
    ).toDF("doc_id", "text")
    val out = Corpus.bigramLmScores(df, "doc_id", "text")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
      .sortBy(_._1)
    // c2("a b")=3, c2("b a")=2; c1(a)=3, c1(b)=2; V=3 (a, b, x)
    // p(b|a)=(3+1)/(3+3)=2/3 -> log2 = -0.584963 (rounded)
    // p(a|b)=(2+1)/(2+3)=0.6 -> log2 = -0.736966
    val pBA = BigDecimal(-0.584963)
    val pAB = BigDecimal(-0.736966)
    def avg(xs: BigDecimal*): Double =
      (xs.sum / xs.length).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(out.map(t => (t._1, t._2)) === Seq((1L, 2L), (2L, 1L), (3L, 2L)))
    assert(out(0)._3 === avg(pBA, pAB))
    assert(out(1)._3 === avg(pBA))
    assert(out(2)._3 === avg(pAB, pBA))
  }

  // ---- Corpus.weightedSample ---------------------------------------

  test("weighted sample: equals a driver-side replay, stable under repartition") {
    val df = (1L to 200L).map(i => (i, 1.0 + (i % 7))).toDF("doc_id", "w")
    def key(id: Long, w: Double): Double = {
      val d = java.security.MessageDigest.getInstance("MD5")
        .digest(s"ws:$id".getBytes("UTF-8"))
      val hex = d.take(3).map("%02x".format(_)).mkString
      val u = ((java.lang.Long.parseLong(hex, 16) % (1L << 24)) + 1).toDouble / (1L << 24)
      BigDecimal(math.log(u) / w).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble + 0.0
    }
    val expected = (1L to 200L).map(i => (i, key(i, 1.0 + (i % 7))))
      .sortBy { case (id, k) => (-k, id) }.take(25)
    def run(d: org.apache.spark.sql.DataFrame) =
      Corpus.weightedSample(d, "doc_id", $"w", m = 25)
        .select("doc_id", "key").as[(Long, Double)].collect().toSeq
    assert(run(df.repartition(3)) === expected)
    assert(run(df.repartition(11)) === expected)
  }

  test("weighted sample plans a top-m, not a corpus sort") {
    val df = (1L to 100L).map(i => (i, 2.0)).toDF("doc_id", "w")
    val plan = Corpus.weightedSample(df, "doc_id", $"w", m = 10)
      .queryExecution.sparkPlan.toString
    assert(plan.contains("TakeOrderedAndProject"), s"no top-m in plan:\n$plan")
  }

  // ---- Corpus.repeatedSpans ----------------------------------------

  test("repeated spans: planted boilerplate is found with exact boundaries") {
    // 12-word boilerplate shared by docs 1 and 2 at different offsets;
    // doc 3 is clean. k=4 windows -> 9 repeated window starts per doc,
    // merging to ONE maximal span covering exactly the boilerplate.
    val boiler = "this page is licensed under the creative commons attribution share alike license"
    val df = Seq(
      (1L, s"alpha beta $boiler gamma delta"),
      (2L, s"$boiler epsilon zeta eta theta iota kappa"),
      (3L, "totally unrelated clean document with no repeated content at all ok")
    ).toDF("doc_id", "text")
    val out = Corpus.repeatedSpans(df, "doc_id", "text", k = 4)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .sortBy(t => (t._1, t._2))
    // doc 1: boilerplate occupies words 3..14 (1-based); doc 2: words 1..12
    assert(out === Seq((1L, 3L, 14L, 9L), (2L, 1L, 12L, 9L)))
  }

  test("repeated spans: two separated repeats in one doc stay two islands") {
    // filler words are DISTINCT — a run of identical fillers would
    // itself create repeated windows and bridge the two islands
    val rep = "one two three four"
    val df = Seq(
      (1L, s"$rep fa fb fc fd fe $rep"),
      (2L, s"$rep other words here")
    ).toDF("doc_id", "text")
    val out = Corpus.repeatedSpans(df, "doc_id", "text", k = 4)
      .filter($"doc_id" === 1).orderBy($"span_start")
      .collect().map(r => (r.getLong(1), r.getLong(2)))
      .toSeq
    assert(out === Seq((1L, 4L), (10L, 13L)))
  }

  test("bigram LM: scores are negative and repetition scores higher than noise") {
    val df = Seq(
      (1L, "spark spark spark spark spark spark spark spark"),
      (2L, "one two three four five six seven eight")
    ).toDF("doc_id", "text")
    val out = Corpus.bigramLmScores(df, "doc_id", "text")
      .collect().map(r => (r.getLong(0), r.getDouble(2))).toMap
    assert(out.values.forall(_ < 0.0))
    // "spark spark" repeats 7x -> high p; the all-distinct doc's
    // bigrams are each singletons -> low p
    assert(out(1L) > out(2L))
  }

  test("t24: BPE learns hand-computed merges with frequency weighting") {
    import spark.implicits._
    // "low" x3, "lower" x1: pairs lo x4, ow x4, we x1, er x1
    // -> tie lo/ow broken lexicographically: "lo" wins round 1.
    // round 2: (lo,w) x4 beats (we/er) x1 -> "low".
    // round 3: vocab is [low, low er]; (low,e) x1 vs (e,r) x1 ->
    // lexicographic: e < low, so ("e","r") wins.
    val docs = Seq((1L, "low low lower"), (2L, "low")).toDF("doc_id", "text")
    val out = Corpus.bpeMerges(docs, "text", rounds = 3)
      .collect().map(r => (r.getLong(0), r.getString(1), r.getString(2), r.getLong(3)))
    assert(out(0) === ((1L, "l", "o", 4L)))
    assert(out(1) === ((2L, "lo", "w", 4L)))
    assert(out(2) === ((3L, "e", "r", 1L)))
  }

  test("t24: overlapping runs merge greedily left-to-right, non-overlapping") {
    import spark.implicits._
    // "aaaa": pairs (a,a) x3 -> round 1 merges to [aa, aa] (two
    // merges, NOT [aa, a, a]); round 2's top pair is then (aa, aa) x1
    val docs = Seq((1L, "aaaa")).toDF("doc_id", "text")
    val out = Corpus.bpeMerges(docs, "text", rounds = 2)
      .collect().map(r => (r.getLong(0), r.getString(1), r.getString(2), r.getLong(3)))
    assert(out(0) === ((1L, "a", "a", 3L)))
    assert(out(1) === ((2L, "aa", "aa", 1L)))
  }

  test("t25: token counts reflect the learned merges per word instance") {
    import spark.implicits._
    // merges learned: (l,o) -> (lo,w) -> (e,r); so low = 1 token,
    // lower = [low, er] = 2 tokens
    val docs = Seq((1L, "low low lower"), (2L, "low")).toDF("doc_id", "text")
    val out = Corpus.bpeTokenCounts(docs, "doc_id", "text", rounds = 3)
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
    assert(out(1L) === ((3L, 11L, 4L))) // 2x low + lower([low, er])
    assert(out(2L) === ((1L, 3L, 1L)))
  }

  test("n17: blockwise quantization isolates an outlier to its own block") {
    import spark.implicits._
    // one huge dimension in block 0: a GLOBAL scale (n4) would cost
    // every dimension ~100/127 of resolution; blockwise keeps block 1
    // at its own 0.01 scale — the reason the production layouts
    // (bitsandbytes, GGUF Q8) are per-block
    val v = (Array.fill(32)(0.01).updated(0, 100.0)).toSeq
    val out = Quantize.quantizeBlockwise(
        Seq((1L, v)).toDF("vec_id", "embedding"), "vec_id", "embedding")
      .orderBy("block").collect()
    assert(out.length === 2)
    assert(out(0).getAs[Double]("scale") === 100.0)
    assert(out(1).getAs[Double]("scale") === 0.01)
    assert(out(1).getAs[Double]("err") <= 0.01 / 127 + 1e-12)
    // and the error bound holds per block: err < scale/127 (floor step)
    out.foreach { r =>
      assert(r.getAs[Double]("err") <= r.getAs[Double]("scale") / 127 + 1e-12)
    }
  }

  test("n17: an empty embedding contributes zero block rows (sequence(0,-1) guard)") {
    import spark.implicits._
    // unguarded, size([])=0 makes sequence(0, -1), which DESCENDS in
    // Spark and would emit bogus blocks 0 and -1 with null stats
    val out = Quantize.quantizeBlockwise(
      Seq((1L, Seq.empty[Double]), (2L, Seq(1.0, 2.0)))
        .toDF("vec_id", "embedding"), "vec_id", "embedding")
    assert(out.select("vec_id").collect().map(_.getLong(0)).toSeq === Seq(2L))
  }

  test("n17: all-zero blocks quantize to zeros; values clamp at -127") {
    import spark.implicits._
    val v = (Array.fill(16)(0.0) ++ Array.fill(16)(-1.0)).toSeq
    val out = Quantize.quantizeBlockwise(
        Seq((1L, v)).toDF("vec_id", "embedding"), "vec_id", "embedding")
      .orderBy("block").collect()
    assert(out(0).getAs[Double]("scale") === 0.0)
    assert(out(0).getAs[scala.collection.Seq[Long]]("q").forall(_ == 0L))
    assert(out(0).getAs[Double]("err") === 0.0)
    assert(out(1).getAs[scala.collection.Seq[Long]]("q").forall(_ == -127L))
  }

  test("t29: hashed classifier logits equal a driver-side md5 replay") {
    import spark.implicits._
    val rnd = new scala.util.Random(17)
    val vocab = (0 until 30).map(i => s"tok$i")
    val docs = (1L to 20L).map(id =>
      (id, (0 until (2 + rnd.nextInt(20))).map(_ => vocab(rnd.nextInt(30))).mkString(" ")))
    // the operator's exact arithmetic, replayed on the driver: first 8
    // hex chars of md5(bigram) -> BIGINT -> % 64 -> weight (j % 7) - 3
    def slot(bigram: String): Long = {
      val md = java.security.MessageDigest.getInstance("MD5")
      val hex = md.digest(bigram.getBytes("UTF-8"))
        .map("%02x".format(_)).mkString.take(8)
      java.lang.Long.parseLong(hex, 16) % 64L
    }
    val want = docs.map { case (id, text) =>
      val w = text.split(" ").filter(_.nonEmpty)
      val wts = w.zip(w.tail).map { case (a, b) => slot(s"$a $b") % 7 - 3 }
      id -> ((wts.length.toLong, wts.sum, if (wts.sum > 0) 1L else 0L))
    }.toMap
    val got = Corpus.hashedLinearScores(docs.toDF("doc_id", "text"), "doc_id", "text")
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
    assert(got === want)
  }

  test("t29: single-word and empty documents yield no score row") {
    import spark.implicits._
    val out = Corpus.hashedLinearScores(
      Seq((1L, "solo"), (2L, ""), (3L, "two words")).toDF("doc_id", "text"),
      "doc_id", "text")
    assert(out.select("doc_id").as[Long].collect().toSeq === Seq(3L))
  }

  test("t32: duplicate slot keys in the weight relation sum, never fan out") {
    import spark.implicits._
    val docs = Seq((1L, "a b c")).toDF("doc_id", "text") // bigrams: "a b", "b c"
    val dense = (0L until 64L).map(j => (j, 10L)) // every slot weighted 10
    val sharded = dense ++ dense.map { case (j, _) => (j, 5L) } // a second shard
    def run(w: Seq[(Long, Long)]) = Corpus.hashedLinearScoresWeighted(
        docs, "doc_id", "text", w.toDF("j", "wt"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    // unique keys: 2 bigrams, logit 2*10; duplicated keys ADD (15 each):
    // n_bigrams must stay 2 in both — a fanned-out join would report 4
    assert(run(dense) === Seq((1L, 2L, 20L)))
    assert(run(sharded) === Seq((1L, 2L, 30L)))
  }

  test("t33: BM25 scores equal a driver-side replay of the Okapi formula") {
    import spark.implicits._
    val docs = Seq(
      (1L, "spark window spark hash x y z"),     // dl 7
      (2L, "window merge merge merge a b c d"),  // dl 8
      (3L, "no query terms here at all"),        // dl 6, no match
      (4L, null.asInstanceOf[String]),           // null text: dl 0
      (5L, "stream"))                            // dl 1
    val terms = Seq("spark", "window", "hash", "merge", "stream")
    val got = Corpus.bm25(docs.toDF("doc_id", "text"), "doc_id", "text", terms)
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getDouble(2)))).toMap
    // driver replay: N=5, sum_dl=22, avgdl=4.4; same rounding ladder
    val corpus = Map(1L -> "spark window spark hash x y z",
      2L -> "window merge merge merge a b c d", 3L -> "no query terms here at all",
      5L -> "stream").map { case (k, v) => k -> v.split(" ").toSeq }
    val n = 5.0; val avgdl = 22.0 / 5.0
    def rnd(x: Double, p: Int) = BigDecimal(x)
      .setScale(p, BigDecimal.RoundingMode.HALF_UP).toDouble
    val want = corpus.flatMap { case (id, w) =>
      val dl = w.length
      val hits = terms.flatMap { t =>
        val tf = w.count(_ == t)
        if (tf == 0) None else {
          val dfT = corpus.values.count(_.contains(t))
          val idf = rnd(math.log(1.0 + (n - dfT + 0.5) / (dfT + 0.5)), 6)
          Some(rnd(idf * tf / (tf + 1.2 * (0.25 + 0.75 * dl / avgdl)), 6))
        }
      }
      if (hits.isEmpty) None
      else Some(id -> ((hits.size.toLong,
        rnd(BigDecimal(hits.map(BigDecimal(_)).sum.toDouble).toDouble, 4))))
    }
    assert(got === want)
    // unmatched and null-text docs produce no row; matched set is 1,2,5
    assert(got.keySet === Set(1L, 2L, 5L))
  }

  /** Driver-side reference BPE trainer: greedy (weight desc, pair asc)
    * winner over adjacent-pair weighted counts, non-overlapping
    * left-to-right merge — the naive replay bpeTrain must match. */
  private def refBpe(wordCounts: Map[String, Long],
      rounds: Int): Seq[(String, String, Long)] = {
    var vocab = wordCounts.toList.map { case (w, n) => (w.split("").toList, n) }
    val out = scala.collection.mutable.ArrayBuffer.empty[(String, String, Long)]
    var done = false
    (1 to rounds).foreach { _ =>
      if (!done) {
        val pairCounts = scala.collection.mutable.Map.empty[(String, String), Long]
        vocab.foreach { case (syms, n) =>
          syms.zip(syms.tail).foreach(p =>
            pairCounts(p) = pairCounts.getOrElse(p, 0L) + n)
        }
        if (pairCounts.isEmpty) done = true
        else {
          val ((p1, p2), w) = pairCounts.toSeq
            .minBy { case ((a, b), c) => (-c, a, b) }
          out += ((p1, p2, w))
          vocab = vocab.map { case (syms, n) =>
            (syms.foldLeft(List.empty[String]) { (acc, x) =>
              acc match {
                case init :+ last if last == p1 && x == p2 => init :+ (p1 + p2)
                case _ => acc :+ x
              }
            }, n)
          }
        }
      }
    }
    out.toSeq
  }

  test("t24: 20-round training equals the naive replay across checkpoint boundaries") {
    import spark.implicits._
    // 20 rounds crosses the periodic vocab localCheckpoint at rounds 8
    // and 16 — the checkpoints must be invisible to the learned merges
    // AND keep the live plan depth bounded (a 20-deep uncheckpointed
    // lineage was the r7 watch item).
    val rnd = new scala.util.Random(11)
    val alphabet = "abcd"
    val words = (0 until 300).map(_ =>
      (0 until (3 + rnd.nextInt(9))).map(_ => alphabet(rnd.nextInt(4))).mkString)
    val counts = words.groupBy(identity).map { case (w, g) => w -> g.size.toLong }
    val docs = Seq((1L, words.mkString(" "))).toDF("doc_id", "text")
    val got = Corpus.bpeMerges(docs, "text", rounds = 20).collect()
      .map(r => (r.getString(1), r.getString(2), r.getLong(3))).toSeq
    val want = refBpe(counts, 20)
    assert(got === want)
  }

  test("t24/t25: an exhausted corpus stops learning instead of wiping the vocab") {
    import spark.implicits._
    // single-char words: no adjacent pair exists, so round 1's winner
    // is EMPTY. The guarded loop must return zero merges and leave the
    // vocabulary intact — the un-guarded crossJoin form silently
    // emptied it and t25 then returned zero rows for every document.
    val single = Seq((1L, "a b c a"), (2L, "b c")).toDF("doc_id", "text")
    assert(Corpus.bpeMerges(single, "text", rounds = 3).collect().isEmpty)
    val toks = Corpus.bpeTokenCounts(single, "doc_id", "text", rounds = 3)
      .collect().map(r => r.getLong(0) -> r.getLong(3)).toMap
    assert(toks === Map(1L -> 4L, 2L -> 2L)) // 1 symbol per word, no merges

    // rounds beyond the learnable merges: "ab" learns (a,b) in round 1
    // and then has nothing left; rounds=5 must degrade to 1 merge and
    // tokenize under it (1 token per "ab" instance).
    val ab = Seq((1L, "ab ab ab")).toDF("doc_id", "text")
    val merges = Corpus.bpeMerges(ab, "text", rounds = 5).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2)))
    assert(merges.toSeq === Seq((1L, "a", "b")))
    val abToks = Corpus.bpeTokenCounts(ab, "doc_id", "text", rounds = 5)
      .collect().map(r => (r.getLong(1), r.getLong(3))).head
    assert(abToks === ((3L, 3L))) // 3 words, 1 token each
  }

  test("t24: fold merge equals the reference greedy merge on random words") {
    import spark.implicits._
    val rnd = new scala.util.Random(7)
    val alphabet = "ab"
    val words = (0 until 200).map(_ =>
      (0 until (2 + rnd.nextInt(8))).map(_ => alphabet(rnd.nextInt(2))).mkString)
    // reference greedy non-overlapping merge of pair (a, b) -> "ab"
    def refMerge(w: String, p1: String, p2: String): List[String] = {
      val syms = w.split("").toList
      syms.foldLeft(List.empty[String]) { (acc, x) =>
        acc match {
          case init :+ last if last == p1 && x == p2 => init :+ (p1 + p2)
          case _ => acc :+ x
        }
      }
    }
    val docs = Seq((1L, words.mkString(" "))).toDF("doc_id", "text")
    val merges = Corpus.bpeMerges(docs, "text", rounds = 1).collect()
    val (p1, p2) = (merges(0).getString(1), merges(0).getString(2))
    // replay the fold through Spark on each distinct word and compare
    val sparkMerged = docs.sparkSession.sql(
      s"""SELECT word, aggregate(split(word, ''), CAST(array() AS ARRAY<STRING>),
         |  (acc, x) -> CASE WHEN size(acc) > 0 AND element_at(acc, -1) = '$p1'
         |                     AND x = '$p2'
         |              THEN concat(slice(acc, 1, size(acc) - 1), array('$p1$p2'))
         |              ELSE concat(acc, array(x)) END) AS merged
         |FROM (SELECT explode(array(${words.distinct.map("'" + _ + "'").mkString(",")})) AS word)
         |""".stripMargin)
      .collect().map(r => r.getString(0) -> r.getSeq[String](1).toList).toMap
    words.distinct.foreach { w =>
      assert(sparkMerged(w) === refMerge(w, p1, p2), s"word $w pair ($p1,$p2)")
    }
  }

  // ---- Corpus.gopherRepetition (t38) ---------------------------------

  test("t38: gopherRepetition hand-computed battery — lines, top-grams, dup covers") {
    val df = Seq(
      (1L, "a b a b a b"),            // top-gram caps; tie → lexicographic
      (2L, "x y z x y q r s t u"),    // one repeated bigram, nothing else
      (3L, "p q r s t p q r s t v"),  // duplicated 5-gram, no dup 10-gram
      (4L, "hello world\nfoo\nfoo\nfoo\nbar"), // duplicate lines
      (5L, ""),                       // empty → all zeros
      (6L, null.asInstanceOf[String]) // null → all zeros
    ).toDF("doc_id", "text")
    val out = Corpus.gopherRepetition(df, "doc_id", "text")
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5), r.getLong(6), r.getLong(7), r.getLong(8),
        r.getLong(9))).toMap
    // doc 1: 6 one-char words. top2 "a b"×3 (2 chars) = 60000/6 → cap 10000;
    // top3 tie ("a b a","b a b" both ×2) → "a b a" (3 chars) = exactly 10000;
    // top4 "a b a b"×2 (4 chars) = 13333 → cap. No dup 5-gram (two distinct
    // windows), no 10-gram at 6 words.
    assert(out(1L) === ((6L, 1L, 0L, 0L, 10000L, 10000L, 10000L, 0L, 0L)))
    // doc 2: "x y" twice → 2·2·10000/10 = 4000; all 3/4-grams unique → the
    // lexicographic first ("q r s" / "q r s t") at count 1: 3000 / 4000.
    assert(out(2L) === ((10L, 1L, 0L, 0L, 4000L, 3000L, 4000L, 0L, 0L)))
    // doc 3: "p q r s t" at pos 1 and 6 → cover {1..10} of 11 chars = 9090;
    // top2 tie → "p q" ×2 = 3636; top3 "p q r" ×2 = 5454; top4 "p q r s" ×2
    // = 7272; the two 10-gram windows differ → dup10 0.
    assert(out(3L) === ((11L, 1L, 0L, 0L, 3636L, 5454L, 7272L, 9090L, 0L)))
    // doc 4: lines [hello world, foo×3, bar]: dup lines 2/5 = 4000; dup line
    // chars (23−17)/23 = 2608. Words 6, chars 22: top2 "foo foo" ×2 (6 chars)
    // = 5454; top3 min-tie "foo foo bar" (9) = 4090; top4 "foo foo foo bar"
    // (12) = 5454.
    assert(out(4L) === ((6L, 5L, 4000L, 2608L, 5454L, 4090L, 5454L, 0L, 0L)))
    assert(out(5L) === ((0L, 0L, 0L, 0L, 0L, 0L, 0L, 0L, 0L)))
    assert(out(6L) === ((0L, 0L, 0L, 0L, 0L, 0L, 0L, 0L, 0L)))
  }

  test("t38: dup-gram cover is a position UNION — overlaps never double-count") {
    // "w w w w w w" : every 5-gram window is the same gram, positions 1/2 →
    // covered = {1..6} = ALL 6 positions, so dup5 = 10000 exactly (a naive
    // count×len sum would claim 2×5 = 10 char-slots of 6 and overflow)
    val df = Seq((1L, "w w w w w w")).toDF("doc_id", "text")
    val r = Corpus.gopherRepetition(df, "doc_id", "text").collect()(0)
    assert(r.getLong(8) === 10000L)  // dup5gram_bp
    assert(r.getLong(5) === 10000L)  // top2 capped
  }

  // ---- Corpus.ngramNovelty (t39) --------------------------------------

  test("t39: novelty counts grams occurring exactly once corpus-wide") {
    val df = Seq(
      (1L, "a b c d e"),   // grams (n=3): abc, bcd, cde
      (2L, "x y a b c"),   // xya, yab, abc — shares abc with doc 1
      (3L, "p q r"),       // pqr unique
      (4L, "p q"),         // < 3 words → no grams
      (5L, "a b c")        // abc a THIRD time
    ).toDF("doc_id", "text")
    val out = Corpus.ngramNovelty(df, "doc_id", "text", n = 3)
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
    assert(out(1L) === ((3L, 2L, 6666L))) // abc shared → 2/3 novel
    assert(out(2L) === ((3L, 2L, 6666L)))
    assert(out(3L) === ((1L, 1L, 10000L)))
    assert(out(4L) === ((0L, 0L, 0L)))
    assert(out(5L) === ((1L, 0L, 0L)))   // its only gram occurs 3×
  }
}
