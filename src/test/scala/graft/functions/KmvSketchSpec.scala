package graft.functions

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** KMV contract: the sample IS the bottom-k of the md5-prefix hash
  * order (brute-force-equal), sketch bytes are canonical (a pure
  * function of (key set, k) across partitionings and roll-up trees),
  * the estimate follows the pinned exact-below-k / (k-1)·2^60/h_k
  * rule, k reconciliation and hostile bytes fail loudly, and the SQL
  * registration reaches the same expressions. */
class KmvSketchSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  private def bruteBottomK(keys: Seq[String], k: Int): Seq[String] = {
    import org.apache.spark.unsafe.types.UTF8String
    keys.distinct
      .map(s => (Md5Prefix.prefix(UTF8String.fromString(s), Kmv.HexDigits), s))
      .sortBy { case (h, s) => (h, s) } // string sort ok: test keys are ASCII
      .take(k)
      .map(_._2)
  }

  test("sample equals brute-force bottom-k; bytes canonical across partitionings") {
    import spark.implicits._
    val keys = (1 to 500).map(i => s"key-${i % 173}")
    val df = keys.toDF("k")
    val expected = bruteBottomK(keys, 16)
    val skBytes = Seq(1, 7, 32).map { p =>
      df.repartition(p).agg(Kmv.kmv_sketch($"k", 16).as("sk")).head().getAs[Array[Byte]](0)
    }
    // canonical serialization: any partitioning → identical bytes
    assert(skBytes.map(_.toSeq).distinct.size === 1)
    val sample = df.agg(Kmv.kmv_sketch($"k", 16).as("sk"))
      .select(explode(Kmv.kmv_keys($"sk"))).as[String].collect().toSeq
    assert(sample === expected)
  }

  test("INIT -> MERGE roll-up bytes identical to sketching the keys directly") {
    import spark.implicits._
    val df = (1 to 4000).map(i => (i % 13, s"u${i % 997}")).toDF("g", "k")
    val direct = df.agg(Kmv.kmv_sketch($"k", 32).as("sk")).head().getAs[Array[Byte]](0)
    val tiered = df.groupBy($"g").agg(Kmv.kmv_sketch($"k", 32).as("sk"))
      .agg(Kmv.kmv_merge_sketch($"sk").as("sk")).head().getAs[Array[Byte]](0)
    // bottom-k of a union of bottom-k's = bottom-k of the union
    assert(tiered.toSeq === direct.toSeq)
    // and a second tier (pairs of groups) still lands on the same bytes
    val twoTier = df.groupBy($"g").agg(Kmv.kmv_sketch($"k", 32).as("sk"))
      .groupBy(pmod($"g", lit(3))).agg(Kmv.kmv_merge_sketch($"sk").as("sk"))
      .agg(Kmv.kmv_merge_sketch($"sk").as("sk")).head().getAs[Array[Byte]](0)
    assert(twoTier.toSeq === direct.toSeq)
  }

  test("estimate: exact below k; pinned integer formula at k; sane accuracy") {
    import spark.implicits._
    // below k → exact distinct count
    val small = (1 to 40).map(i => s"s${i % 7}").toDF("k")
    assert(small.agg(Kmv.kmv_sketch($"k", 32).as("sk"))
      .select(Kmv.kmv_estimate($"sk")).head().getLong(0) === 7L)
    // at k → (k-1)*2^60 / h_k, replayed here with BigInteger
    val keys = (1 to 10000).map(i => s"user-$i")
    val df = keys.toDF("k")
    val est = df.agg(Kmv.kmv_sketch($"k", 64).as("sk"))
      .select(Kmv.kmv_estimate($"sk")).head().getLong(0)
    import org.apache.spark.unsafe.types.UTF8String
    val h64 = keys
      .map(s => Md5Prefix.prefix(UTF8String.fromString(s), Kmv.HexDigits))
      .sorted.apply(63)
    val expected = java.math.BigInteger.valueOf(63L)
      .multiply(java.math.BigInteger.valueOf(Kmv.HashSpace))
      .divide(java.math.BigInteger.valueOf(h64)).longValueExact()
    assert(est === expected)
    // KMV sd ≈ 1/sqrt(k-2) ≈ 12.7% at k=64; deterministic hash, no flake
    assert(math.abs(est.toDouble / 10000 - 1.0) < 0.4, s"estimate $est at n=10000")
    // merge-estimate path agrees with the scalar
    val viaMerge = df.withColumn("g", pmod(crc32($"k"), lit(5)))
      .groupBy($"g").agg(Kmv.kmv_sketch($"k", 64).as("sk"))
      .agg(Kmv.kmv_merge_estimate($"sk")).head().getLong(0)
    assert(viaMerge === expected)
  }

  test("set ops: jaccard_bp/intersect exact below k, estimator sane at k, mixed k fails") {
    import spark.implicits._
    // EXACT regime: both vocabularies (40, 40, overlap 20) fit k=64 —
    // the union sample is exact, so both outputs are exact
    val aKeys = (1 to 40).map(i => s"w$i")
    val bKeys = (21 to 60).map(i => s"w$i")
    def sk(keys: Seq[String], k: Int): Array[Byte] = {
      val s = new Kmv.State(k)
      keys.foreach(x => s.addKey(org.apache.spark.unsafe.types.UTF8String.fromString(x)))
      Kmv.serialize(s)
    }
    assert(Kmv.intersectEstimate(sk(aKeys, 64), sk(bKeys, 64)) === 20L)
    assert(Kmv.jaccardBp(sk(aKeys, 64), sk(bKeys, 64)) === 20L * 10000L / 60L)
    // symmetric; self-jaccard = 10000; disjoint = 0
    assert(Kmv.jaccardBp(sk(bKeys, 64), sk(aKeys, 64)) ===
      Kmv.jaccardBp(sk(aKeys, 64), sk(bKeys, 64)))
    assert(Kmv.jaccardBp(sk(aKeys, 64), sk(aKeys, 64)) === 10000L)
    assert(Kmv.jaccardBp(sk(aKeys, 64), sk((100 to 140).map(i => s"z$i"), 64)) === 0L)
    // ESTIMATE regime: 2000 vs 2000 keys, true overlap 1000 (J = 1/3),
    // k=256 — deterministic estimator, bounded sanity envelope
    val bigA = (1 to 2000).map(i => s"doc$i")
    val bigB = (1001 to 3000).map(i => s"doc$i")
    val jbp = Kmv.jaccardBp(sk(bigA, 256), sk(bigB, 256))
    assert(jbp > 2000L && jbp < 4800L, s"jaccard_bp=$jbp for true 3333")
    val inter = Kmv.intersectEstimate(sk(bigA, 256), sk(bigB, 256))
    assert(inter > 600L && inter < 1500L, s"inter=$inter for true 1000")
    // mixed k fails loudly (the estimator contract)
    val e = intercept[IllegalArgumentException] {
      Kmv.jaccardBp(sk(aKeys, 64), sk(bKeys, 32))
    }
    assert(e.getMessage.contains("different k"))
    // the k=0 empty-unset sentinel (kmv_merge_sketch over all-NULL
    // rows) is the empty-SET identity, not a k mismatch
    val empty = Kmv.serialize(new Kmv.State(0))
    assert(Kmv.jaccardBp(empty, sk(aKeys, 64)) === 0L)
    assert(Kmv.intersectEstimate(sk(aKeys, 64), empty) === 0L)
    assert(Kmv.jaccardBp(empty, empty) === 0L)
    // Column + SQL forms reach the same kernel
    GraftFunctions.register(spark)
    val df = (aKeys.map(("a", _)) ++ bKeys.map(("b", _))).toDF("g", "k")
    val skDf = df.groupBy($"g").agg(Kmv.kmv_sketch($"k", 64).as("sk"))
    val row = skDf.filter($"g" === "a").crossJoin(
        skDf.filter($"g" === "b").select($"sk".as("sk_b")))
      .select(Kmv.kmv_jaccard_bp($"sk", $"sk_b").as("j"),
        Kmv.kmv_intersect_estimate($"sk", $"sk_b").as("i"))
      .head()
    assert(row.getLong(0) === 20L * 10000L / 60L && row.getLong(1) === 20L)
    df.createOrReplaceTempView("kmv_setops_in")
    val viaSql = spark.sql(
      """SELECT kmv_jaccard_bp(
        |  (SELECT kmv_sketch(k, 64) FROM kmv_setops_in WHERE g = 'a'),
        |  (SELECT kmv_sketch(k, 64) FROM kmv_setops_in WHERE g = 'b'))""".stripMargin)
      .head().getLong(0)
    assert(viaSql === 20L * 10000L / 60L)
  }

  test("null keys ignored; empty input -> empty sample, estimate 0") {
    import spark.implicits._
    val df = Seq(Some("a"), None, Some("b"), Some("a")).toDF("k")
    val r = df.agg(Kmv.kmv_sketch($"k", 8).as("sk"))
      .select(Kmv.kmv_estimate($"sk"), size(Kmv.kmv_keys($"sk"))).head()
    assert(r.getLong(0) === 2L && r.getInt(1) === 2)
    val empty = df.filter($"k" === "zzz").agg(Kmv.kmv_sketch($"k", 8).as("sk"))
      .select(Kmv.kmv_estimate($"sk"), size(Kmv.kmv_keys($"sk"))).head()
    assert(empty.getLong(0) === 0L && empty.getInt(1) === 0)
  }

  test("k mismatch, foreign bytes, and non-canonical bytes fail loudly") {
    import spark.implicits._
    val a = Seq("a", "b").toDF("k").agg(Kmv.kmv_sketch($"k", 8).as("sk"))
    val b = Seq("c").toDF("k").agg(Kmv.kmv_sketch($"k", 16).as("sk"))
    val e1 = intercept[Exception] {
      a.union(b).agg(Kmv.kmv_merge_estimate($"sk")).head()
    }
    assert(e1.getMessage.contains("different k") ||
      e1.getCause != null && e1.getCause.getMessage.contains("different k"))
    val e2 = intercept[Exception] {
      Seq(Array[Byte](1, 2, 3)).toDF("sk").agg(Kmv.kmv_merge_estimate($"sk")).head()
    }
    assert(e2.getMessage.contains("kmv") ||
      e2.getCause != null && e2.getCause.getMessage.contains("kmv"))
    // entries out of canonical order: craft two-entry bytes reversed
    val good = Seq("x", "y").toDF("k").agg(Kmv.kmv_sketch($"k", 4).as("sk"))
      .head().getAs[Array[Byte]](0)
    val st = Kmv.deserialize(good)
    assert(st.set.size() === 2)
    val es = st.set.toArray(new Array[Kmv.Entry](2))
    val buf = java.nio.ByteBuffer.allocate(good.length)
    buf.put(Kmv.Magic).put(Kmv.Version).putInt(4).putInt(2)
    Seq(es(1), es(0)).foreach { e =>
      buf.putLong(e.hash); buf.putInt(e.key.length); buf.put(e.key)
    }
    val e3 = intercept[IllegalArgumentException] { Kmv.deserialize(buf.array()) }
    assert(e3.getMessage.contains("canonical"))
  }

  test("k-way set ops: exact below k, j=2 agrees with the binary forms, empty annihilates intersection (r12)") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    // three overlapping small sets (all < k=32 ⇒ union sample exact ⇒
    // union AND intersection estimates are EXACT)
    val rows = (1 to 40).map(i => ("a", s"k$i")) ++
      (11 to 50).map(i => ("b", s"k$i")) ++
      (21 to 60).map(i => ("c", s"k$i"))
    val sk = rows.toDF("g", "k").groupBy($"g")
      .agg(Kmv.kmv_sketch($"k", 128).as("sk"))
    val arr3 = sk.agg(sort_array(collect_list(struct($"g", $"sk"))).as("a"))
      .select(
        Kmv.kmv_union_estimate(expr("transform(a, x -> x.sk)")).as("u"),
        Kmv.kmv_intersect_all_estimate(expr("transform(a, x -> x.sk)")).as("i"))
      .head()
    assert(arr3.getLong(0) === 60L) // |k1..k60|
    assert(arr3.getLong(1) === 20L) // |k21..k40|
    // j=2 equals the binary estimator exactly
    GraftFunctions.register(spark)
    val two = sk.filter($"g" =!= "c")
      .agg(sort_array(collect_list(struct($"g", $"sk"))).as("a"))
      .select(
        Kmv.kmv_intersect_all_estimate(expr("transform(a, x -> x.sk)")).as("i2"),
        expr("kmv_intersect_estimate(a[0].sk, a[1].sk)").as("ib"))
    val r2 = two.head()
    assert(r2.getLong(0) === r2.getLong(1))
    // an empty-unset (k=0) member: union unaffected, intersection 0
    val empty = Seq.empty[(String, String)].toDF("g", "k")
      .agg(Kmv.kmv_merge_sketch(lit(null).cast("binary")).as("sk"))
      .head().getAs[Array[Byte]](0)
    val aBytes = sk.filter($"g" === "a").head().getAs[Array[Byte]]("sk")
    val withEmpty = Seq((aBytes, empty)).toDF("sa", "se")
      .select(
        Kmv.kmv_union_estimate(array($"sa", $"se")).as("u"),
        Kmv.kmv_intersect_all_estimate(array($"sa", $"se")).as("i"))
      .head()
    assert(withEmpty.getLong(0) === 40L && withEmpty.getLong(1) === 0L)
    // null ELEMENT propagates null (outer-join friendly)
    val withNull = Seq(Tuple1(aBytes)).toDF("sa")
      .select(Kmv.kmv_union_estimate(
        array($"sa", lit(null).cast("binary"))).as("u")).head()
    assert(withNull.isNullAt(0))
    // mixed k fails loudly
    val sk8 = rows.toDF("g", "k").filter($"g" === "b").groupBy($"g")
      .agg(Kmv.kmv_sketch($"k", 8).as("sk")).head().getAs[Array[Byte]]("sk")
    val e = intercept[Exception] {
      Seq((aBytes, sk8)).toDF("sa", "sb")
        .select(Kmv.kmv_union_estimate(array($"sa", $"sb"))).head()
    }
    val m = Option(e.getMessage).getOrElse("") +
      Option(e.getCause).map(_.getMessage).getOrElse("")
    assert(m.contains("different k"))
    // SQL registration round-trip
    sk.createOrReplaceTempView("kmv_kway_sk")
    val viaSql = spark.sql(
      """SELECT kmv_union_estimate(transform(a, x -> x.sk)),
        |  kmv_intersect_all_estimate(transform(a, x -> x.sk))
        |FROM (SELECT sort_array(collect_list(struct(g, sk))) AS a
        |      FROM kmv_kway_sk)""".stripMargin).head()
    assert(viaSql.getLong(0) === 60L && viaSql.getLong(1) === 20L)
  }

  test("hostile tiny k-th hash: estimate overflow fails as the house format error") {
    // k distinct KEYS sharing one tiny hash pass deserialize (canonical
    // order is on (hash, key) pairs), but (k-1)*2^60/h_k then exceeds
    // Long — must be the loud kmv IllegalArgumentException, not a raw
    // ArithmeticException escaping longValueExact
    val k = 10
    val keys = (0 until k).map(i => s"key-$i".getBytes("UTF-8"))
    val buf = java.nio.ByteBuffer.allocate(10 + keys.map(12 + _.length).sum)
    buf.put(Kmv.Magic).put(Kmv.Version).putInt(k).putInt(k)
    keys.foreach { kb => buf.putLong(1L); buf.putInt(kb.length); buf.put(kb) }
    val st = Kmv.deserialize(buf.array()) // structurally valid
    val e = intercept[IllegalArgumentException] { Kmv.estimate(st) }
    assert(e.getMessage.contains("estimate overflow"))
  }

  test("analysis-time checks: non-string key, non-literal k, k out of range") {
    import spark.implicits._
    val e1 = intercept[Exception] {
      Seq(1L).toDF("k").agg(Kmv.kmv_sketch($"k", 8)).queryExecution.analyzed
    }
    assert(e1.getMessage.contains("STRING") || e1.getMessage.contains("kmv_sketch"))
    val e2 = intercept[Exception] {
      Seq("a").toDF("k").agg(Kmv.kmv_sketch($"k", 0)).queryExecution.analyzed
    }
    assert(e2.getMessage.contains("k must be") || e2.getMessage.contains("kmv_sketch"))
    // a LongType k past Int range must fail with its REAL value, not
    // silently truncate (2^32+16 would otherwise become k=16)
    import org.apache.spark.sql.catalyst.expressions.Literal
    import org.apache.spark.sql.types.LongType
    val e3 = intercept[IllegalArgumentException] {
      Kmv.extractK(Literal((1L << 32) + 16L, LongType), "kmv_sketch")
    }
    assert(e3.getMessage.contains("4294967312"))
  }

  test("SQL registration: kmv_sketch/kmv_merge_estimate/kmv_keys from plain SQL") {
    GraftFunctions.register(spark)
    import spark.implicits._
    (1 to 100).map(i => s"d${i % 23}").toDF("k").createOrReplaceTempView("kmv_in")
    val r = spark.sql(
      """SELECT kmv_estimate(sk) AS est, size(kmv_keys(sk)) AS n
        |FROM (SELECT kmv_sketch(k, 64) AS sk FROM kmv_in)""".stripMargin).head()
    assert(r.getLong(0) === 23L && r.getInt(1) === 23)
    val merged = spark.sql(
      """SELECT kmv_merge_estimate(sk) AS est FROM (
        |  SELECT kmv_sketch(k, 64) AS sk FROM kmv_in GROUP BY substr(k, 2, 1))""".stripMargin)
      .head().getLong(0)
    assert(merged === 23L)
  }
}
