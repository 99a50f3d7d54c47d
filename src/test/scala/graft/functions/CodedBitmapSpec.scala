package graft.functions

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark
import graft.operators.Dictionary

/** Dictionary-identity tags in coded sketch bytes: same-lineage
  * sketches (one dictionary + encodeIncremental extensions) merge
  * exactly; REBUILT or independent dictionaries fail loudly; plain and
  * coded tiers can never mix silently; hostile bytes are rejected at
  * deserialize — the vhist-unit / dds-alpha discipline on the coded
  * seam (the r11 verdict's top item). */
class CodedBitmapSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  val CB = CodedBitmap

  private def sketchOf(df: org.apache.spark.sql.DataFrame): Map[String, Array[Byte]] =
    df.collect().map(r => (r.getString(0), r.getAs[Array[Byte]]("sk"))).toMap

  test("full coded lifecycle across an extended dictionary equals count(distinct) over the union") {
    import spark.implicits._
    val b1 = (1 to 1500).map(i => (s"g${i % 3}", s"u-${(i * 13) % 211}")).toDF("g", "k")
    val b2 = (1 to 1500).map(i => (s"g${i % 3}", s"u-${(i * 7) % 400}")).toDF("g", "k")
    val (coded1, dict1) = Dictionary.encode(b1, "k", "code")
    val stored = coded1.groupBy($"g")
      .agg(CB.bitmap_sketch_coded($"code", col(Dictionary.IdCol)).as("sk"))
    val (coded2, _) = Dictionary.encodeIncremental(dict1, b2, "k", "code")
    val today = coded2.groupBy($"g")
      .agg(CB.bitmap_sketch_coded($"code", col(Dictionary.IdCol)).as("sk"))
    val merged = stored.unionByName(today).groupBy($"g")
      .agg(CB.bitmap_merge_count_coded($"sk").as("n"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val direct = b1.unionByName(b2).groupBy($"g").agg(countDistinct($"k").as("n"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(merged === direct)
    // the stored tier (sketch -> sketch) preserves the lineage id and
    // its bytes read back with the lineage-checked scalar
    val tier = stored.unionByName(today).groupBy($"g")
      .agg(CB.bitmap_merge_sketch_coded($"sk").as("sk"))
    val viaScalar = tier.select($"g", CB.bitmap_and_count_coded($"sk", $"sk").as("n"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(viaScalar === direct)
    // bytes carry the id: deserializeTagged returns gen-1's lineage id
    val (id1, _) = Bitmap64.deserializeTagged(sketchOf(tier)("g0"))
    val dictId = dict1.select(col(Dictionary.IdCol)).head().getLong(0)
    assert(id1.longValue() === dictId, "stored tier lost the lineage id")
  }

  test("coded sketch bytes are canonical: any partitioning, same bytes") {
    import spark.implicits._
    val df = (1 to 2000).map(i => (s"g${i % 2}", s"w-${(i * 17) % 331}")).toDF("g", "k")
    val runs = Seq(1, 7, 32).map { p =>
      val (coded, _) = Dictionary.encode(df.repartition(p), "k", "code")
      sketchOf(coded.groupBy($"g")
        .agg(CB.bitmap_sketch_coded($"code", col(Dictionary.IdCol)).as("sk")))
        .view.mapValues(_.toSeq).toMap
    }
    assert(runs.distinct.size === 1, "partitioning changed coded sketch bytes")
  }

  test("REBUILT dictionary: merging its coded sketches with gen-1 sketches fails loudly") {
    import spark.implicits._
    val b1 = Seq("m", "c", "x", "f").toDF("k").withColumn("g", lit("a"))
    val b2 = Seq("a", "d", "z").toDF("k").withColumn("g", lit("a"))
    val (coded1, _) = Dictionary.encode(b1, "k", "code")
    val gen1 = coded1.groupBy($"g")
      .agg(CB.bitmap_sketch_coded($"code", col(Dictionary.IdCol)).as("sk"))
    // the MISTAKE the tag exists to catch: re-encode over the union
    // instead of extending the lineage — codes renumber, id changes
    val (codedR, _) = Dictionary.encode(b1.unionByName(b2), "k", "code")
    val rebuilt = codedR.groupBy($"g")
      .agg(CB.bitmap_sketch_coded($"code", col(Dictionary.IdCol)).as("sk"))
    val e = intercept[Exception] {
      gen1.unionByName(rebuilt).groupBy($"g")
        .agg(CB.bitmap_merge_count_coded($"sk")).collect()
    }
    val msg = Option(e.getMessage).getOrElse("") +
      Option(e.getCause).map(_.getMessage).getOrElse("")
    assert(msg.contains("different dictionaries"),
      s"rebuilt-dictionary merge did not fail loudly: $msg")
    // the per-row intersection scalar enforces the same contract
    val g1 = sketchOf(gen1)("a"); val rb = sketchOf(rebuilt)("a")
    val e2 = intercept[IllegalArgumentException] { CodedBitmap.andCount(g1, rb) }
    assert(e2.getMessage.contains("different dictionaries"))
  }

  test("plain and coded tiers never mix silently, in either direction") {
    import spark.implicits._
    val df = Seq(("a", 1L), ("a", 2L)).toDF("g", "code")
      .withColumn(Dictionary.IdCol, lit(42L))
    val coded = df.groupBy($"g")
      .agg(CB.bitmap_sketch_coded($"code", col(Dictionary.IdCol)).as("sk"))
    val plain = df.groupBy($"g")
      .agg(BitmapDistinct.bitmap_sketch($"code").as("sk"))
    val e1 = intercept[Exception] {
      plain.groupBy($"g").agg(CB.bitmap_merge_count_coded($"sk")).collect()
    }
    val m1 = Option(e1.getMessage).getOrElse("") +
      Option(e1.getCause).map(_.getMessage).getOrElse("")
    assert(m1.contains("plain bitmap_sketch bytes"), s"got: $m1")
    val e2 = intercept[Exception] {
      coded.groupBy($"g").agg(BitmapDistinct.bitmap_merge_count($"sk")).collect()
    }
    val m2 = Option(e2.getMessage).getOrElse("") +
      Option(e2.getCause).map(_.getMessage).getOrElse("")
    assert(m2.contains("CODED sketch bytes"), s"got: $m2")
  }

  test("NULL dict_id under a non-null code fails loudly") {
    import spark.implicits._
    val df = Seq(("a", 1L)).toDF("g", "code")
      .withColumn("dict_id", lit(null).cast("long"))
    val e = intercept[Exception] {
      df.groupBy($"g")
        .agg(CB.bitmap_sketch_coded($"code", $"dict_id")).collect()
    }
    val m = Option(e.getMessage).getOrElse("") +
      Option(e.getCause).map(_.getMessage).getOrElse("")
    assert(m.contains("NULL dict_id"), s"got: $m")
  }

  test("hostile coded bytes fail loudly: id-less with containers, truncation, trailing junk") {
    import spark.implicits._
    val good = Seq(("a", 5L), ("a", 900000L)).toDF("g", "code")
      .withColumn("dict_id", lit(7L))
      .groupBy($"g").agg(CB.bitmap_sketch_coded($"code", $"dict_id").as("sk"))
      .head().getAs[Array[Byte]]("sk")
    val (id, bm) = Bitmap64.deserializeTagged(good)
    assert(id.longValue() === 7L && bm.cardinality === 2L)
    // flip hasId to 0 and splice out the 8-byte id: containers without
    // an id are the unset-partial sentinel abused — must be rejected
    val noId = new Array[Byte](good.length - 8)
    noId(0) = good(0); noId(1) = good(1); noId(2) = 0
    System.arraycopy(good, 11, noId, 3, good.length - 11)
    val e1 = intercept[IllegalArgumentException] { Bitmap64.deserializeTagged(noId) }
    assert(e1.getMessage.contains("untagged sketch carrying containers"))
    val e2 = intercept[IllegalArgumentException] {
      Bitmap64.deserializeTagged(java.util.Arrays.copyOf(good, good.length - 2))
    }
    assert(e2.getMessage.contains("truncated"))
    val e3 = intercept[IllegalArgumentException] {
      Bitmap64.deserializeTagged(java.util.Arrays.copyOf(good, good.length + 4))
    }
    assert(e3.getMessage.contains("trailing"))
    // the empty unset-partial IS legal — the merge identity
    val empty = new Bitmap64().serializeTagged(null)
    val (nid, nbm) = Bitmap64.deserializeTagged(empty)
    assert((nid eq null) && nbm.isEmpty)
    // a plain V1 EMPTY sketch is exactly 6 bytes — it must hit the
    // purpose-built plain-bytes-in-a-coded-merge message, not a bogus
    // "bad magic" from a length floor (review-caught r12)
    val plainEmpty = new Bitmap64().serialize()
    assert(plainEmpty.length === 6)
    val e4 = intercept[IllegalArgumentException] {
      Bitmap64.deserializeTagged(plainEmpty)
    }
    assert(e4.getMessage.contains("plain bitmap_sketch bytes"))
  }

  test("SQL registration: the coded family works from plain SQL") {
    import spark.implicits._
    GraftFunctions.register(spark)
    Seq((1L, 10L), (2L, 10L), (2L, 10L)).toDF("code", "dict_id")
      .createOrReplaceTempView("coded_rows")
    val sk = spark.sql(
      "SELECT bitmap_sketch_coded(code, dict_id) AS sk FROM coded_rows")
    sk.createOrReplaceTempView("coded_sk")
    assert(spark.sql("SELECT bitmap_merge_count_coded(sk) AS n FROM coded_sk")
      .head().getLong(0) === 2L)
    assert(spark.sql(
      "SELECT bitmap_and_count_coded(t.sk2, t.sk2) FROM (SELECT " +
        "bitmap_merge_sketch_coded(sk) AS sk2 FROM coded_sk) t")
      .head().getLong(0) === 2L)
    // r13 additions: set difference + the audit readers, from SQL
    assert(spark.sql(
      "SELECT bitmap_andnot_count_coded(sk, sk) FROM coded_sk")
      .head().getLong(0) === 0L)
    assert(spark.sql("SELECT bitmap_max_code_coded(sk) FROM coded_sk")
      .head().getLong(0) === 2L)
    assert(spark.sql("SELECT bitmap_dict_id_coded(sk) FROM coded_sk")
      .head().getLong(0) === 10L)
  }

  test("bitmap_andnot_count_coded: exact asymmetric difference, lineage-checked, null-propagating") {
    import spark.implicits._
    val rows = Seq(("a", 1L), ("a", 2L), ("a", 3L), ("b", 2L), ("b", 9L))
      .toDF("g", "code").withColumn("dict_id", lit(77L))
    val sks = sketchOf(rows.groupBy($"g")
      .agg(CB.bitmap_sketch_coded($"code", $"dict_id").as("sk")))
    // {1,2,3} \ {2,9} = 2; {2,9} \ {1,2,3} = 1
    assert(CodedBitmap.andNotCount(sks("a"), sks("b")) === 2L)
    assert(CodedBitmap.andNotCount(sks("b"), sks("a")) === 1L)
    // Column form agrees with the static helper (codegen path)
    val viaCol = Seq((sks("a"), sks("b"))).toDF("x", "y")
      .select(CB.bitmap_andnot_count_coded($"x", $"y")).head().getLong(0)
    assert(viaCol === 2L)
    // null side → null out (outer-join friendly)
    assert(Seq((sks("a"), Option.empty[Array[Byte]])).toDF("x", "y")
      .select(CB.bitmap_andnot_count_coded($"x", $"y")).head().isNullAt(0))
    // different lineages fail loudly, same as the AND scalar
    val other = sketchOf(rows.withColumn("dict_id", lit(78L)).groupBy($"g")
      .agg(CB.bitmap_sketch_coded($"code", $"dict_id").as("sk")))
    val e = intercept[IllegalArgumentException] {
      CodedBitmap.andNotCount(sks("a"), other("a"))
    }
    assert(e.getMessage.contains("different dictionaries"))
  }

  test("coded readers: max_code and dict_id off the bytes; null on the empty sentinel") {
    import spark.implicits._
    val rows = Seq(("a", 5L), ("a", 900000L), ("a", 12L))
      .toDF("g", "code").withColumn("dict_id", lit(11L))
    val sk = sketchOf(rows.groupBy($"g")
      .agg(CB.bitmap_sketch_coded($"code", $"dict_id").as("sk")))("a")
    assert(CodedBitmap.maxCode(sk) === java.lang.Long.valueOf(900000L))
    assert(CodedBitmap.dictId(sk) === java.lang.Long.valueOf(11L))
    // Column forms agree (codegen path)
    val r = Seq(Tuple1(sk)).toDF("sk")
      .select(CB.bitmap_max_code_coded($"sk").as("m"),
        CB.bitmap_dict_id_coded($"sk").as("id")).head()
    assert(r.getLong(0) === 900000L && r.getLong(1) === 11L)
    // the unset-empty sentinel reads as (null, null)
    val empty = new Bitmap64().serializeTagged(null)
    val rn = Seq(Tuple1(empty)).toDF("sk")
      .select(CB.bitmap_max_code_coded($"sk").as("m"),
        CB.bitmap_dict_id_coded($"sk").as("id")).head()
    assert(rn.isNullAt(0) && rn.isNullAt(1))
  }
}
