package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** Dictionary.encode contract: codes are dense `[0, |distinct|)`,
  * deterministic under any partitioning (the two-phase rank orders by
  * the key itself), injective, null keys dropped — the properties the
  * an37 string→bitmap composition rests on. */
class DictionarySpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  test("codes are dense, deterministic across partitionings, and injective") {
    import spark.implicits._
    val df = (1 to 3000).map(i => (i.toLong, s"key-${i % 173}")).toDF("rid", "k")
    val runs = Seq(1, 7, 32).map { p =>
      val (coded, dict) = Dictionary.encode(df.repartition(p), "k", "code")
      val d = dict.collect().map(r => (r.getString(0), r.getLong(1))).toMap
      // dense [0, 173)
      assert(d.values.toSeq.sorted === (0L until 173L))
      // order = the key's own ordering (rank by key)
      assert(d.toSeq.sortBy(_._2).map(_._1) === d.keys.toSeq.sorted)
      // coded facts keep every non-null row, each mapped to its key's code
      val c = coded.collect().map(r => (r.getAs[String]("k"), r.getAs[Long]("code")))
      assert(c.length === 3000)
      assert(c.forall { case (k, code) => d(k) === code })
      d
    }
    assert(runs.distinct.size === 1, "partitioning changed the dictionary")
  }

  test("null keys get no dictionary row and are dropped from coded facts") {
    import spark.implicits._
    val df = Seq(Some("a"), None, Some("b"), Some("a")).toDF("k")
    val (coded, dict) = Dictionary.encode(df, "k", "code")
    assert(dict.count() === 2L)
    assert(coded.count() === 3L)
  }

  test("composition with bitmap_distinct equals count(distinct key) on strings") {
    import spark.implicits._
    val df = (1 to 2000).map(i => (s"g${i % 3}", s"url-${(i * 7) % 331}")).toDF("g", "k")
    val (coded, _) = Dictionary.encode(df, "k", "code")
    val viaBitmap = coded.groupBy($"g")
      .agg(graft.functions.BitmapDistinct.bitmap_distinct($"code").as("n"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val direct = df.groupBy($"g").agg(countDistinct($"k").as("n"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(viaBitmap === direct)
  }

  // ---- encodeIncremental (append-stable extension) ---------------------

  test("encodeIncremental freezes batch-1 codes bit-for-bit and appends new keys at max+1") {
    import spark.implicits._
    // batch-2 keys deliberately sort BEFORE, BETWEEN, and AFTER batch-1
    // keys — a plain re-encode would renumber almost everything
    val b1 = Seq("m", "c", "x", "f").toDF("k")
    val b2 = Seq("a", "d", "z", "c", "x").toDF("k") // c, x already known
    val (_, dict1) = Dictionary.encode(b1, "k", "code")
    val before = dict1.collect().map(r => (r.getString(0), r.getLong(1))).toMap
    val (coded2, dict2) = Dictionary.encodeIncremental(dict1, b2, "k", "code")
    val after = dict2.collect().map(r => (r.getString(0), r.getLong(1))).toMap
    // every batch-1 pair unchanged
    before.foreach { case (k, c) => assert(after(k) === c, s"code for '$k' moved") }
    // new keys ranked among THEMSELVES, appended at max(code)+1, dense
    assert(after("a") === 4L && after("d") === 5L && after("z") === 6L)
    assert(after.values.toSeq.sorted === (0L until 7L))
    // facts containing old AND new keys all code through the extended dict
    val c2 = coded2.collect().map(r => (r.getAs[String]("k"), r.getAs[Long]("code")))
    assert(c2.length === 5 && c2.forall { case (k, c) => after(k) === c })
  }

  test("encodeIncremental with no new keys returns the dictionary unchanged") {
    import spark.implicits._
    val b1 = Seq("p", "q", "r").toDF("k")
    val (_, dict1) = Dictionary.encode(b1, "k", "code")
    val before = dict1.collect().map(r => (r.getString(0), r.getLong(1))).toSet
    val (_, dict2) = Dictionary.encodeIncremental(dict1, Seq("q", "p").toDF("k"), "k", "code")
    assert(dict2.collect().map(r => (r.getString(0), r.getLong(1))).toSet === before)
    // empty starting dictionary degrades to encode's codes
    val empty = dict1.filter(lit(false))
    val (_, dict3) = Dictionary.encodeIncremental(empty, b1, "k", "code")
    val d3 = dict3.collect().map(r => (r.getString(0), r.getLong(1))).toMap
    assert(d3 === Map("p" -> 0L, "q" -> 1L, "r" -> 2L))
  }

  test("STORED sketches built on batch-1 codes merge exactly with batch-2 sketches") {
    import spark.implicits._
    val B = graft.functions.BitmapDistinct
    val b1 = (1 to 1500).map(i => (s"g${i % 3}", s"u-${(i * 13) % 211}")).toDF("g", "k")
    val b2 = (1 to 1500).map(i => (s"g${i % 3}", s"u-${(i * 7) % 400}")).toDF("g", "k")
    val (coded1, dict1) = Dictionary.encode(b1, "k", "code")
    // "yesterday's" sketch table, persisted as bytes on batch-1 codes
    val stored = coded1.groupBy($"g").agg(B.bitmap_sketch($"code").as("sk")).collect()
      .map(r => (r.getString(0), r.getAs[Array[Byte]]("sk"))).toMap
    val (coded2, _) = Dictionary.encodeIncremental(dict1, b2, "k", "code")
    val today = coded2.groupBy($"g").agg(B.bitmap_sketch($"code").as("sk")).collect()
      .map(r => (r.getString(0), r.getAs[Array[Byte]]("sk"))).toMap
    val direct = b1.unionByName(b2).groupBy($"g").agg(countDistinct($"k").as("n"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    direct.foreach { case (g, n) =>
      val merged = graft.functions.Bitmap64.deserialize(stored(g))
      merged.or(graft.functions.Bitmap64.deserialize(today(g)))
      assert(merged.cardinality === n, s"group $g: stale codes corrupted the merge")
    }
  }

  test("encodeIncremental: nulls dropped, deterministic across partitionings, dict schema required") {
    import spark.implicits._
    val b1 = Seq("a", "b").toDF("k")
    val (_, dict1) = Dictionary.encode(b1, "k", "code")
    val b2 = Seq(Some("c"), None, Some("d")).toDF("k")
    val results = Seq(1, 5, 32).map { p =>
      val (_, d) = Dictionary.encodeIncremental(dict1, b2.repartition(p), "k", "code")
      d.collect().map(r => (r.getString(0), r.getLong(1))).toMap
    }
    assert(results.distinct.size === 1, "partitioning changed the extended dictionary")
    assert(results.head === Map("a" -> 0L, "b" -> 1L, "c" -> 2L, "d" -> 3L))
    val e = intercept[IllegalArgumentException] {
      Dictionary.encodeIncremental(dict1.withColumnRenamed("code", "id"), b2, "k", "code")
    }
    assert(e.getMessage.contains("encodeIncremental"))
  }

  // ---- identity (dict_id lineage tag) ----------------------------------

  test("dict_id: deterministic content hash, preserved across extension, changed by rebuild") {
    import spark.implicits._
    val b1 = Seq("m", "c", "x").toDF("k")
    val b2 = Seq("a", "z").toDF("k")
    def idOf(d: org.apache.spark.sql.DataFrame): Long =
      d.select(col(Dictionary.IdCol)).distinct().collect().map(_.getLong(0)).toSeq match {
        case Seq(one) => one
        case other => fail(s"expected one dict_id, got $other")
      }
    // deterministic across partitionings and rebuilds over the SAME set
    val ids = Seq(1, 5, 32).map(p => idOf(Dictionary.encode(b1.repartition(p), "k", "code")._2))
    assert(ids.distinct.size === 1)
    // extension preserves the lineage id (gen-1's key-set hash)
    val (_, dict1) = Dictionary.encode(b1, "k", "code")
    val (coded2, dict2) = Dictionary.encodeIncremental(dict1, b2, "k", "code")
    assert(idOf(dict2) === ids.head, "extension changed the lineage id")
    // coded facts carry the id too (what bitmap_sketch_coded reads)
    assert(coded2.columns.contains(Dictionary.IdCol))
    // a REBUILD over the extended key set is a different lineage
    val (_, rebuilt) = Dictionary.encode(b1.unionByName(b2), "k", "code")
    assert(idOf(rebuilt) !== ids.head, "rebuild kept the old id")
    // empty-dictionary degenerate case: incremental from empty equals encode
    val (_, dict3) = Dictionary.encodeIncremental(dict1.filter(lit(false)), b1, "k", "code")
    assert(idOf(dict3) === ids.head, "empty-dict extension diverged from encode's id")
    // identity-less (pre-r12) dictionaries are rejected at construction
    val e = intercept[IllegalArgumentException] {
      Dictionary.encodeIncremental(dict1.drop(Dictionary.IdCol), b2, "k", "code")
    }
    assert(e.getMessage.contains("dict_id"))
  }

  test("malformed dictionaries fail loudly on first use: duplicate keys, duplicate codes, mixed lineages") {
    import spark.implicits._
    val batch = Seq("q").toDF("k")
    def expectRaise(dict: org.apache.spark.sql.DataFrame, needle: String): Unit = {
      val (coded, _) = Dictionary.encodeIncremental(dict, batch, "k", "code")
      val e = intercept[Exception] { coded.collect() }
      val m = Option(e.getMessage).getOrElse("") +
        Option(e.getCause).map(c => Option(c.getMessage).getOrElse("")).getOrElse("")
      assert(m.contains(needle), s"expected '$needle' in: $m")
    }
    // duplicate KEYS fan out the fact join silently without the guard
    expectRaise(
      Seq(("a", 0L, 7L), ("a", 1L, 7L)).toDF("k", "code", Dictionary.IdCol),
      "duplicate keys")
    // duplicate CODES alias two keys in every downstream bitmap
    expectRaise(
      Seq(("a", 0L, 7L), ("b", 0L, 7L)).toDF("k", "code", Dictionary.IdCol),
      "duplicate codes")
    // mixed dict_id = two lineages unioned into one "dictionary"
    expectRaise(
      Seq(("a", 0L, 7L), ("b", 1L, 8L)).toDF("k", "code", Dictionary.IdCol),
      "mixed dict_id")
    // a WELL-FORMED hand-built dictionary passes the same path
    val ok = Seq(("a", 0L, 7L), ("b", 1L, 7L)).toDF("k", "code", Dictionary.IdCol)
    val (coded, dict) = Dictionary.encodeIncremental(ok, batch, "k", "code")
    assert(coded.count() === 1L && dict.count() === 3L)
  }

  test("auditCodedTier: clean lineage passes; sibling forks and independent dictionaries are caught") {
    import spark.implicits._
    val CB = graft.functions.CodedBitmap
    val b1 = Seq("m", "c", "x", "f").toDF("k").withColumn("g", lit("a"))
    val (coded1, dict1) = Dictionary.encode(b1, "k", "code")
    val stored = coded1.groupBy($"g")
      .agg(CB.bitmap_sketch_coded($"code", col(Dictionary.IdCol)).as("sk"))

    // 1) the HONEST lineage: sketches coded by dict1 audit clean
    val clean = Dictionary.auditCodedTier(dict1, stored, "sk").head()
    assert(clean.getAs[Boolean]("codes_in_range") &&
      clean.getAs[Boolean]("ids_match") && clean.getAs[Boolean]("ok"))

    // 2) the SIBLING FORK the dict_id tag cannot see at merge time:
    //    extension A appends one key, extension B (the fork) appends
    //    two MORE; sketches coded through B carry codes past |A|,
    //    share A's dict_id, and would merge silently - the audit's
    //    range check catches them against A
    val (_, dictA) = Dictionary.encodeIncremental(dict1, Seq("zz").toDF("k"), "k", "code")
    val forkBatch = Seq("zz", "aa", "bb").toDF("k").withColumn("g", lit("a"))
    val (codedB, dictB) = Dictionary.encodeIncremental(dict1, forkBatch, "k", "code")
    val storedB = codedB.groupBy($"g")
      .agg(CB.bitmap_sketch_coded($"code", col(Dictionary.IdCol)).as("sk"))
    // same lineage id on both siblings - the merge-time guard is blind
    assert(dictA.select(col(Dictionary.IdCol)).head().getLong(0) ===
      dictB.select(col(Dictionary.IdCol)).head().getLong(0))
    val fork = Dictionary.auditCodedTier(dictA, storedB, "sk").head()
    assert(!fork.getAs[Boolean]("codes_in_range"),
      "sibling fork's out-of-range codes were not caught")
    assert(!fork.getAs[Boolean]("ok"))
    // B's own sketches against B's own dictionary stay clean
    assert(Dictionary.auditCodedTier(dictB, storedB, "sk")
      .head().getAs[Boolean]("ok"))

    // 3) an INDEPENDENT dictionary (different key set, different id):
    //    range may pass but the lineage id mismatch is caught
    val (_, dictOther) = Dictionary.encode(
      Seq("p", "q", "r", "s", "t", "u", "v", "w").toDF("k"), "k", "code")
    val other = Dictionary.auditCodedTier(dictOther, stored, "sk").head()
    assert(!other.getAs[Boolean]("ids_match") && !other.getAs[Boolean]("ok"))

    // 4) an empty / unset-sentinel sketch table audits clean (the
    //    merge identity)
    val emptyTier = stored.filter(lit(false))
    val empty = Dictionary.auditCodedTier(dict1, emptyTier, "sk").head()
    assert(empty.getAs[Boolean]("ok") && empty.getAs[Long]("n_sketch_ids") === 0L)
  }
}
