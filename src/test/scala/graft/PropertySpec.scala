package graft

import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import org.scalatest.funsuite.AnyFunSuite

import graft.etl.{StarSchema, Writers}

/** Property-style tests (SURVEY §5.2 #3) with ScalaCheck generators but
  * batched evaluation — one Spark job per property, not one per sample.
  */
class PropertySpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def samples[A](g: Gen[List[A]]): List[A] =
    g.apply(Gen.Parameters.default, Seed(42L)).get

  test("SQL-literal escaping round-trips any printable string") {
    val strings = samples(Gen.listOfN(300,
      Gen.asciiPrintableStr.map(_.take(40)))).distinct
    val df = strings.zipWithIndex.map(_.swap).toDF("id", "s")
    val stmts = Writers.insertStatements(df, "t")
      .collect().map(_.getString(0))
    // parse back: INSERT INTO t (id, s) VALUES (<id>, '<escaped>');
    val re = """INSERT INTO t \(id, s\) VALUES \((\d+), '(.*)'\);""".r
    val parsed = stmts.map {
      case re(id, esc) => id.toInt -> esc.replace("''", "'")
    }.toMap
    strings.zipWithIndex.foreach { case (s, i) =>
      assert(parsed(i) === s, s"round-trip failed for ${s.map(_.toInt)}")
    }
  }

  test("approx_count_distinct stays within HLL error of exact counts") {
    import org.apache.spark.sql.functions._
    val li = Tables.load(spark, "/root/testdata/sf0.001", "lineitem")
    val rows = li.groupBy($"l_returnflag")
      .agg(approx_count_distinct($"l_partkey").as("approx"),
        countDistinct($"l_partkey").as("exact"))
      .collect()
    rows.foreach { r =>
      val (a, e) = (r.getLong(1).toDouble, r.getLong(2).toDouble)
      assert(math.abs(a - e) / e < 0.1, s"HLL error too large: $a vs $e")
    }
  }

  test("text-function invariants hold on arbitrary strings") {
    import org.apache.spark.sql.functions._
    import graft.functions.TextFunctions
    // arbitrary printable strings + unicode-ish noise, incl. empties
    val strings = samples(Gen.listOfN(400, Gen.oneOf(
      Gen.asciiPrintableStr.map(_.take(60)),
      Gen.alphaNumStr.map(_.take(30)),
      Gen.const(""), Gen.const("   "),
      Gen.const("café néé ☕ 中文")))).distinct
    val df = strings.zipWithIndex.map(_.swap).toDF("id", "text")
      .select($"id", $"text",
        TextFunctions.qualityScore($"text").cast("long").as("q"),
        TextFunctions.langId($"text").as("lang"),
        TextFunctions.wsTokens($"text").cast("long").as("tok"),
        TextFunctions.fingerprint($"text").as("fp"))
    val rows = df.collect()
    val langs = Set("en", "fr", "de", "es", "und")
    rows.foreach { r =>
      assert(r.getLong(2) >= 0 && r.getLong(2) <= 10000,
        s"quality out of basis-point range for ${r.get(1)}")
      assert(langs.contains(r.getString(3)))
      assert(r.getLong(4) >= 0)
    }
    // fingerprint is invariant under punctuation noise
    val noisy = strings.zipWithIndex.map(_.swap).toDF("id", "text")
      .select($"id",
        TextFunctions.fingerprint(concat($"text", lit("!!..,;"))).as("fp2"))
      .collect().map(r => r.getInt(0) -> r.getString(1)).toMap
    rows.foreach { r =>
      assert(noisy(r.getInt(0)) === r.getString(5),
        s"fingerprint not punctuation-invariant for ${r.get(1)}")
    }
  }

  test("surrogate keys are dense, unique, and partition-invariant") {
    val words = samples(Gen.listOfN(500, Gen.oneOf(
      Gen.alphaLowerStr.map(_.take(6)), Gen.const("dup")))).filter(_.nonEmpty)
    val docs = words.grouped(10).zipWithIndex
      .map { case (w, i) => (i.toLong, w.mkString(" ")) }.toSeq
      .toDF("doc_id", "text")
      .withColumn("keywords", org.apache.spark.sql.functions.split($"text", " "))
      .withColumnRenamed("text", "abstract")
    def dim(partitions: Int) =
      StarSchema.keywords(docs.repartition(partitions))
        .collect().map(r => (r.getLong(0), r.getString(1))).toSet
    val d1 = dim(1); val d7 = dim(7)
    assert(d1 === d7) // repartition-stable
    val ids = d1.map(_._1).toSeq.sorted
    assert(ids === ids.indices.map(_.toLong)) // dense 0..n-1
    assert(d1.map(_._2).size === d1.size) // natural key unique
  }

  test("prefix-filtered similarity join equals brute force on random corpora") {
    import graft.operators.SetSimJoin
    // small vocab forces heavy token sharing — the regime where a
    // buggy prefix/positional prune would actually drop pairs
    val vocab = Vector("a", "b", "c", "d", "e", "f", "g", "h")
    val docGen = Gen.chooseNum(2, 12).flatMap(n =>
      Gen.listOfN(n, Gen.oneOf(vocab)).map(_.mkString(" ")))
    val corpora = samples(Gen.listOfN(3, Gen.listOfN(25, docGen)))
    for ((texts, ci) <- corpora.zipWithIndex) {
      val df = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }
        .toDF("doc_id", "text")
      val sets = texts.zipWithIndex.map { case (t, i) =>
        i.toLong -> t.split(" ").toSet }.toMap
      for ((n, d) <- Seq((1, 2), (3, 4))) {
        val got = SetSimJoin.jaccardJoin(
            SetSimJoin.wordSets(df, "doc_id", "text"), n, d)
          .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
        val want = (for {
          a <- sets.keys; b <- sets.keys if a < b
          i = (sets(a) & sets(b)).size.toLong
          u = (sets(a) | sets(b)).size.toLong
          if d * i >= n * u
        } yield (a, b, i)).toSet
        assert(got === want, s"corpus $ci tau=$n/$d")
      }
    }
  }

  test("KMV sketches: bottom-k, canonical bytes, and the estimate rule on arbitrary keys") {
    import org.apache.spark.sql.functions._
    import org.apache.spark.unsafe.types.UTF8String
    import graft.functions.{Kmv, Md5Prefix}
    // arbitrary strings incl. unicode, empties, and heavy dups — the
    // regimes where a string-order/byte-order mismatch would bite
    val keys = samples(Gen.listOfN(600, Gen.oneOf(
      Gen.asciiPrintableStr.map(_.take(24)),
      Gen.alphaNumStr.map(_.take(8)), // narrow space -> many dups
      Gen.const(""), Gen.const("café ☕"), Gen.const("中文键"))))
    val df = keys.zipWithIndex.map(_.swap).toDF("id", "k")
    val k = 24
    // JVM reference: bottom-k by (60-bit md5 prefix, key BYTES unsigned)
    def cmpBytes(a: Array[Byte], b: Array[Byte]): Int = {
      val n = math.min(a.length, b.length)
      var i = 0
      while (i < n) {
        val d = (a(i) & 0xff) - (b(i) & 0xff)
        if (d != 0) return d
        i += 1
      }
      a.length - b.length
    }
    val ranked = keys.distinct
      .map { s =>
        val u = UTF8String.fromString(s)
        (Md5Prefix.prefix(u, Kmv.HexDigits), u.getBytes, s)
      }
      .sortWith { case ((h1, b1, _), (h2, b2, _)) =>
        h1 < h2 || (h1 == h2 && cmpBytes(b1, b2) < 0) }
    val wantSample = ranked.take(k).map(_._3)
    val nd = ranked.size.toLong
    val wantEst =
      if (nd < k) nd
      else java.math.BigInteger.valueOf(k - 1L)
        .multiply(java.math.BigInteger.valueOf(Kmv.HashSpace))
        .divide(java.math.BigInteger.valueOf(math.max(ranked(k - 1)._1, 1L)))
        .longValueExact()
    // direct, two-tier rolled, and repartitioned forms: identical bytes
    val direct = df.agg(Kmv.kmv_sketch($"k", k).as("sk")).head().getAs[Array[Byte]](0)
    val rolled = df.groupBy(pmod($"id", lit(7))).agg(Kmv.kmv_sketch($"k", k).as("sk"))
      .agg(Kmv.kmv_merge_sketch($"sk").as("sk")).head().getAs[Array[Byte]](0)
    val repart = df.repartition(13).agg(Kmv.kmv_sketch($"k", k).as("sk"))
      .head().getAs[Array[Byte]](0)
    assert(rolled.toSeq === direct.toSeq)
    assert(repart.toSeq === direct.toSeq)
    val st = Kmv.deserialize(direct)
    val gotSample = {
      val it = st.set.iterator()
      val b = Seq.newBuilder[String]
      while (it.hasNext) b += UTF8String.fromBytes(it.next().key).toString
      b.result()
    }
    assert(gotSample === wantSample)
    assert(Kmv.estimate(st) === wantEst)
  }

  test("DDSketch: alpha envelope, canonical bytes, and rolled == direct on arbitrary doubles") {
    import org.apache.spark.sql.functions._
    import graft.functions.Dds
    // arbitrary finite doubles across the full sign/magnitude spectrum,
    // heavy dups, exact zeros — the regimes where a bucket-boundary or
    // sign-store bug would bite
    val vs = samples(Gen.listOfN(700, Gen.oneOf(
      Gen.chooseNum(-1e12, 1e12),
      Gen.chooseNum(-1.0, 1.0).map(_ / 1e9), // subnormal-adjacent tiny values
      Gen.oneOf(0.0, 0.0, 1.0, -1.0, 1e-300, -1e250))))
    val df = vs.zipWithIndex.map(_.swap).toDF("id", "v")
    val alpha = 0.02
    // direct, two-tier rolled, and repartitioned forms: identical bytes
    val direct = df.agg(Dds.dds_sketch($"v", alpha).as("sk")).head().getAs[Array[Byte]](0)
    val rolled = df.groupBy(pmod($"id", lit(7))).agg(Dds.dds_sketch($"v", alpha).as("sk"))
      .agg(Dds.dds_merge_sketch($"sk").as("sk")).head().getAs[Array[Byte]](0)
    val repart = df.repartition(13).agg(Dds.dds_sketch($"v", alpha).as("sk"))
      .head().getAs[Array[Byte]](0)
    assert(rolled.toSeq === direct.toSeq)
    assert(repart.toSeq === direct.toSeq)
    // every quantile of the deserialized sketch lands within alpha of
    // the discrete-lower-rule exact value (sign-exact at zero)
    val st = Dds.deserialize(direct)
    val sorted = vs.sorted
    for (q <- Seq(0.0, 0.05, 0.25, 0.5, 0.75, 0.95, 1.0)) {
      val tgt = math.max(1L, java.math.BigDecimal.valueOf(q)
        .multiply(java.math.BigDecimal.valueOf(sorted.size.toLong))
        .setScale(0, java.math.RoundingMode.CEILING).longValueExact())
      val exact = sorted((tgt - 1).toInt)
      val est = Dds.quantile(st, q).asInstanceOf[Double]
      if (exact == 0.0) assert(est === 0.0, s"q=$q")
      else assert(math.abs(est - exact) <= alpha * math.abs(exact) * 1.000001,
        s"q=$q est=$est exact=$exact")
    }
  }

  test("CMS sketches: partition-invariant bytes, lower bound, raw == weighted on arbitrary keys") {
    import org.apache.spark.sql.functions._
    import graft.functions.Cms
    val keys = samples(Gen.listOfN(800, Gen.oneOf(
      Gen.alphaNumStr.map(_.take(6)),
      Gen.const(""), Gen.const("naïve ☕"), Gen.const("重复"))))
    val df = keys.zipWithIndex.map(_.swap).toDF("id", "k")
    val direct = df.agg(Cms.cms_sketch($"k").as("sk")).head().getAs[Array[Byte]](0)
    val repart = df.repartition(17).agg(Cms.cms_sketch($"k").as("sk"))
      .head().getAs[Array[Byte]](0)
    assert(repart.toSeq === direct.toSeq)
    // weighted INIT from the aggregated counts: identical bytes
    val weighted = df.groupBy($"k").agg(count(lit(1)).as("n"))
      .agg(Cms.cms_sketch($"k", $"n").as("sk")).head().getAs[Array[Byte]](0)
    assert(weighted.toSeq === direct.toSeq)
    // two-tier roll-up: identical bytes
    val rolled = df.groupBy(pmod($"id", lit(5))).agg(Cms.cms_sketch($"k").as("sk"))
      .agg(Cms.cms_merge_sketch($"sk").as("sk")).head().getAs[Array[Byte]](0)
    assert(rolled.toSeq === direct.toSeq)
    // every key's estimate bounds its true count from above
    val exact = keys.groupBy(identity).map { case (s, xs) => s -> xs.size.toLong }
    val cells = Cms.deserialize(direct)
    exact.foreach { case (s, n) =>
      val est = Cms.estimate(cells, org.apache.spark.unsafe.types.UTF8String.fromString(s))
      assert(est >= n, s"lower bound violated for '$s': est $est < $n")
    }
  }
}
