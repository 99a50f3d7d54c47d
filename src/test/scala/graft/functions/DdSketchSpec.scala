package graft.functions

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** Relative-error quantile sketch contract: the alpha guarantee vs a
  * brute-force reference over values spanning many orders of magnitude
  * (negatives and zeros included), determinism across partitionings and
  * merge orders, INIT→MERGE ≡ one-shot bit-for-bit, fail-loud alpha
  * reconciliation and hostile-bytes rejection. */
class DdSketchSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  /** Reference: the house discrete-lower rank rule on raw values. */
  private def ref(vs: Seq[Double], q: Double): Double = {
    val sorted = vs.sorted
    val tgt = math.max(1L, java.math.BigDecimal.valueOf(q)
      .multiply(java.math.BigDecimal.valueOf(sorted.size.toLong))
      .setScale(0, java.math.RoundingMode.CEILING).longValueExact())
    sorted((tgt - 1).toInt)
  }

  private def within(est: Double, exact: Double, alpha: Double): Boolean =
    if (exact == 0.0) est == 0.0
    else math.abs(est - exact) <= alpha * math.abs(exact) * 1.000001

  test("alpha guarantee holds vs brute force: 9-decade mixed-sign values, q sweep, partitionings") {
    import spark.implicits._
    val rnd = new scala.util.Random(42)
    // magnitudes from 1e-4 to 1e5, ~10% negatives, ~5% exact zeros
    val vs: Seq[Double] = Seq.fill(20000) {
      val m = StrictMath.pow(10.0, rnd.nextDouble() * 9.0 - 4.0)
      val r = rnd.nextInt(20)
      if (r == 0) 0.0 else if (r <= 2) -m else m
    }
    val df = vs.toDF("v")
    for (alpha <- Seq(0.01, 0.05); q <- Seq(0.0, 0.01, 0.25, 0.5, 0.75, 0.95, 0.99, 1.0); p <- Seq(1, 7)) {
      val est = df.repartition(p).agg(Dds.dds_quantile($"v", alpha, q)).head().getDouble(0)
      val exact = ref(vs, q)
      assert(within(est, exact, alpha), s"alpha=$alpha q=$q parts=$p est=$est exact=$exact")
    }
  }

  test("INIT -> MERGE roll-up equals the one-shot estimate bit-for-bit") {
    import spark.implicits._
    val df = (1L to 30000L)
      .map(i => (s"g${i % 6}", ((i * 7919L) % 100000L).toDouble / 7.0 - 1000.0))
      .toDF("g", "v")
    for (q <- Seq(0.5, 0.95, 0.99)) {
      val oneShot = df.agg(Dds.dds_quantile($"v", 0.01, q)).head().getDouble(0)
      val rolled = df.groupBy($"g").agg(Dds.dds_sketch($"v", 0.01).as("sk"))
        .agg(Dds.dds_merge_quantile($"sk", q)).head().getDouble(0)
      assert(java.lang.Double.doubleToLongBits(rolled) ===
        java.lang.Double.doubleToLongBits(oneShot), s"q=$q")
      assert(within(rolled, ref(df.collect().map(_.getDouble(1)).toSeq, q), 0.01), s"q=$q vs ref")
    }
  }

  test("sketch bytes are canonical: any partitioning same bytes; merge_sketch == direct sketch") {
    import spark.implicits._
    val df = (1L to 5000L).map(i => ((i * 31L) % 257L).toDouble - 128.0).toDF("v")
    val bytes = Seq(1, 8, 32).map { p =>
      df.repartition(p).agg(Dds.dds_sketch($"v", 0.02)).head().getAs[Array[Byte]](0).toSeq
    }
    assert(bytes.distinct.size === 1)
    // stored-tier roll-up: fine sketches count-add to the SAME bytes
    val rolled = df.withColumn("g", ($"v" > 0.0).cast("int"))
      .groupBy($"g").agg(Dds.dds_sketch($"v", 0.02).as("sk"))
      .agg(Dds.dds_merge_sketch($"sk")).head().getAs[Array[Byte]](0).toSeq
    assert(rolled === bytes.head)
  }

  test("zeros and negatives: sign-mirrored estimates, exact zero, empty -> null, nulls ignored") {
    import spark.implicits._
    val df = Seq(-1000.0, -10.0, 0.0, 0.0, 5.0, 500.0).toDF("v")
    // q=0.25 -> rank 2 of 6 -> -10 (within 1%)
    val lo = df.agg(Dds.dds_quantile($"v", 0.01, 0.25)).head().getDouble(0)
    assert(lo < 0.0 && within(lo, -10.0, 0.01), s"got $lo")
    // q=0.5 -> rank 3 -> 0.0 exactly
    assert(df.agg(Dds.dds_quantile($"v", 0.01, 0.5)).head().getDouble(0) === 0.0)
    // empty and all-null inputs -> null
    assert(df.filter($"v" > 1e9).agg(Dds.dds_quantile($"v", 0.01, 0.5)).head().isNullAt(0))
    val withNulls = Seq(Some(7.0), None, Some(7.0)).toDF("v")
    assert(within(withNulls.agg(Dds.dds_quantile($"v", 0.01, 0.5)).head().getDouble(0), 7.0, 0.01))
  }

  test("SQL registration: dds_sketch / dds_merge_quantile / dds_merge_sketch / dds_quantile") {
    import spark.implicits._
    GraftFunctions.register(spark)
    (1 to 1000).map(i => (i % 4, i.toDouble)).toDF("g", "v").createOrReplaceTempView("dds_in")
    val p50 = spark.sql(
      """SELECT dds_merge_quantile(sk, 0.5) FROM (
        |  SELECT dds_merge_sketch(sk) AS sk FROM (
        |    SELECT g, dds_sketch(v, 0.01) AS sk FROM dds_in GROUP BY g))""".stripMargin)
      .head().getDouble(0)
    assert(within(p50, 500.0, 0.01), s"got $p50")
    val one = spark.sql("SELECT dds_quantile(v, 0.01, 0.99) FROM dds_in").head().getDouble(0)
    assert(within(one, 990.0, 0.01), s"got $one")
    // the per-row scalar from SQL: q parses as DECIMAL(2,2) — extracted
    // at analysis, never evaluated per row (the ClassCastException trap)
    val ofSql = spark.sql(
      """SELECT dds_quantile_of(sk, 0.99) FROM (
        |  SELECT dds_sketch(v, 0.01) AS sk FROM dds_in)""".stripMargin)
      .head().getDouble(0)
    assert(within(ofSql, 990.0, 0.01), s"got $ofSql")
    // Column form agrees bit-for-bit
    val ofCol = spark.table("dds_in").agg(Dds.dds_sketch($"v", 0.01).as("sk"))
      .select(Dds.dds_quantile_of($"sk", 0.99)).head().getDouble(0)
    assert(java.lang.Double.doubleToLongBits(ofCol) ===
      java.lang.Double.doubleToLongBits(ofSql))
  }

  test("dds_quantile_of generated code COMPILES (no silent Janino fallback)") {
    import spark.implicits._
    // CODEGEN_ONLY turns a Janino failure into a hard error instead of
    // the silent interpreted fallback that would mask a broken doGenCode
    val key = "spark.sql.codegen.factoryMode"
    val prev = spark.conf.getOption(key)
    spark.conf.set(key, "CODEGEN_ONLY")
    try {
      val sk = (1 to 100).map(_.toDouble).toDF("v")
        .agg(Dds.dds_sketch($"v", 0.01).as("sk"))
      val got = sk.select(Dds.dds_quantile_of($"sk", 0.5)).head().getDouble(0)
      assert(within(got, 50.0, 0.01), s"got $got")
      // null sketch propagates null through the generated path too
      val row = sk.select(Dds.dds_quantile_of(lit(null).cast("binary"), 0.5))
        .head()
      assert(row.isNullAt(0))
    } finally {
      prev match {
        case Some(v) => spark.conf.set(key, v)
        case None => spark.conf.unset(key)
      }
    }
  }

  test("dds_quantiles: one decode, k rank walks — element-for-element equal to dds_quantile_of (r12)") {
    import spark.implicits._
    val qs = Seq(0.0, 0.5, 0.95, 0.99, 1.0)
    val sk = ((1 to 400).map(_.toDouble) ++ Seq(-7.5, 0.0)).toDF("v")
      .agg(Dds.dds_sketch($"v", 0.01).as("sk"))
    // run under CODEGEN_ONLY so a broken doGenCode (the referenced
    // double[] constant) is a hard error, not a silent fallback
    val key = "spark.sql.codegen.factoryMode"
    val prev = spark.conf.getOption(key)
    spark.conf.set(key, "CODEGEN_ONLY")
    try {
      val row = sk.select(
        Dds.dds_quantiles($"sk", qs).as("multi"),
        org.apache.spark.sql.functions.array(
          qs.map(q => Dds.dds_quantile_of($"sk", q)): _*).as("single")).head()
      assert(row.getSeq[Double](0) === row.getSeq[Double](1))
      // empty sketch: null per element
      val empty = Seq.empty[Double].toDF("v")
        .agg(Dds.dds_sketch($"v", 0.01).as("sk"))
        .select(Dds.dds_quantiles($"sk", Seq(0.5, 0.9))).head().getSeq[Any](0)
      assert(empty === Seq(null, null))
    } finally {
      prev match {
        case Some(v) => spark.conf.set(key, v)
        case None => spark.conf.unset(key)
      }
    }
    // SQL registration + analysis-time q range check
    GraftFunctions.register(spark)
    sk.createOrReplaceTempView("dds_sk_multi")
    val viaSql = spark.sql(
      "SELECT dds_quantiles(sk, array(0.5, 0.99)) FROM dds_sk_multi")
      .head().getSeq[Double](0)
    val direct = sk.select(Dds.dds_quantile_of($"sk", 0.5),
      Dds.dds_quantile_of($"sk", 0.99)).head()
    assert(viaSql === Seq(direct.getDouble(0), direct.getDouble(1)))
    val e = intercept[Exception] {
      spark.sql("SELECT dds_quantiles(sk, array(0.5, 1.5)) FROM dds_sk_multi")
        .queryExecution.analyzed
    }
    assert(e.getMessage.contains("[0, 1]") || e.getMessage.contains("quantile"))
  }

  test("analysis-time failures: bad alpha, bad q, mistyped inputs") {
    import spark.implicits._
    val df = Seq(1.0).toDF("v")
    val e1 = intercept[Exception] {
      df.agg(Dds.dds_sketch($"v", 0.9)).queryExecution.analyzed
    }
    assert(e1.getMessage.contains("alpha"))
    val e2 = intercept[Exception] {
      df.agg(Dds.dds_quantile($"v", 0.01, 1.5)).queryExecution.analyzed
    }
    assert(e2.getMessage.contains("[0, 1]") || e2.getMessage.contains("quantile"))
    val e3 = intercept[Exception] {
      Seq(1L).toDF("v").agg(Dds.dds_sketch($"v", 0.01)).queryExecution.analyzed
    }
    assert(e3.getMessage.contains("DOUBLE"))
    val e4 = intercept[Exception] {
      Seq(1L).toDF("sk").agg(Dds.dds_merge_quantile($"sk", 0.5)).queryExecution.analyzed
    }
    assert(e4.getMessage.toLowerCase.contains("binary"))
  }

  test("merging sketches with DIFFERENT alphas fails loudly, never silently count-adds") {
    import spark.implicits._
    val df = (1 to 100).map(_.toDouble).toDF("v")
    val a = df.agg(Dds.dds_sketch($"v", 0.01).as("sk"))
    val b = df.agg(Dds.dds_sketch($"v", 0.02).as("sk"))
    val e = intercept[Exception] {
      a.unionByName(b).agg(Dds.dds_merge_quantile($"sk", 0.5)).head()
    }
    def msgs(t: Throwable): Seq[String] =
      if (t == null) Nil else Option(t.getMessage).toSeq ++ msgs(t.getCause)
    assert(msgs(e).exists(_.contains("different alphas")))
  }

  test("non-finite values fail loudly at INIT") {
    import spark.implicits._
    val e = intercept[Exception] {
      Seq(1.0, Double.NaN).toDF("v").agg(Dds.dds_quantile($"v", 0.01, 0.5)).head()
    }
    def msgs(t: Throwable): Seq[String] =
      if (t == null) Nil else Option(t.getMessage).toSeq ++ msgs(t.getCause)
    assert(msgs(e).exists(_.contains("non-finite")))
  }

  test("hostile bytes fail loudly: bad magic, non-positive counts, non-canonical order, alpha-0 with data") {
    def sketch(alphaBits: Long, zero: Long, entries: Seq[(Int, Long)]): Array[Byte] = {
      val buf = java.nio.ByteBuffer.allocate(26 + 12 * entries.size)
      buf.put(Dds.Magic).put(Dds.Version)
      buf.putLong(alphaBits).putLong(zero).putInt(0).putInt(entries.size)
      entries.foreach { case (i, c) => buf.putInt(i).putLong(c) }
      buf.array()
    }
    val okBits = java.lang.Double.doubleToLongBits(0.01)
    // sanity: the hand-crafted layout is accepted when sane
    assert(Dds.quantile(Dds.deserialize(sketch(okBits, 0L, Seq(3 -> 5L))), 0.5)
      .asInstanceOf[Double] > 0.0)
    val bad = intercept[IllegalArgumentException] {
      Dds.deserialize(Array[Byte](9, 9, 9, 9, 9, 9, 9, 9, 9, 9, 9, 9, 9,
        9, 9, 9, 9, 9, 9, 9, 9, 9, 9, 9, 9, 9))
    }
    assert(bad.getMessage.contains("magic"))
    val neg = intercept[IllegalArgumentException] {
      Dds.deserialize(sketch(okBits, 0L, Seq(3 -> -5L)))
    }
    assert(neg.getMessage.contains("non-positive count"))
    val order = intercept[IllegalArgumentException] {
      Dds.deserialize(sketch(okBits, 0L, Seq(5 -> 1L, 3 -> 1L)))
    }
    assert(order.getMessage.contains("canonical"))
    // alpha-0 is the unset-partial sentinel: legal empty, hostile with data
    assert(Dds.deserialize(sketch(0L, 0L, Nil)).isEmpty)
    val sentinel = intercept[IllegalArgumentException] {
      Dds.deserialize(sketch(0L, 2L, Nil))
    }
    assert(sentinel.getMessage.contains("alpha-0"))
    val badAlpha = intercept[IllegalArgumentException] {
      Dds.deserialize(sketch(java.lang.Double.doubleToLongBits(0.75), 0L, Nil))
    }
    assert(badAlpha.getMessage.contains("bad sketch alpha"))
    // overflow-hostile counts: nNeg + nPos wraps negative as a plain
    // int sum — must die on the loud bucket-count check, not in the
    // entry loops (BufferUnderflow/OOM)
    val overflow = intercept[IllegalArgumentException] {
      val buf = java.nio.ByteBuffer.allocate(26)
      buf.put(Dds.Magic).put(Dds.Version)
      buf.putLong(okBits).putLong(0L).putInt(1 << 30).putInt(1 << 30)
      Dds.deserialize(buf.array())
    }
    assert(overflow.getMessage.contains("bad bucket counts"))
    // truncated entry: header promises 2 buckets, bytes carry 1 — must
    // die on the loud require, not a raw BufferUnderflowException
    val full = sketch(okBits, 0L, Seq(3 -> 5L, 7 -> 2L))
    val truncated = intercept[IllegalArgumentException] {
      Dds.deserialize(java.util.Arrays.copyOf(full, full.length - 12))
    }
    assert(truncated.getMessage.contains("truncated"))
    // trailing junk after the promised buckets: canonical bytes are a
    // pure function of the sketch — extra bytes are corruption
    val trailing = intercept[IllegalArgumentException] {
      Dds.deserialize(java.util.Arrays.copyOf(full, full.length + 3))
    }
    assert(trailing.getMessage.contains("trailing"))
  }

  test("hostile counts and bucket indexes fail loudly instead of wrapping or returning Infinity") {
    def sketch(entries: Seq[(Int, Long)]): Array[Byte] = {
      val buf = java.nio.ByteBuffer.allocate(26 + 12 * entries.size)
      buf.put(Dds.Magic).put(Dds.Version)
      buf.putLong(java.lang.Double.doubleToLongBits(0.01)).putLong(0L)
      buf.putInt(0).putInt(entries.size)
      entries.foreach { case (i, c) => buf.putInt(i).putLong(c) }
      buf.array()
    }
    // near-MAX counts in two structurally-valid sketches: the merged
    // bucket count would wrap Long — must throw, not corrupt the walk
    val big = sketch(Seq(3 -> (Long.MaxValue - 10L)))
    val wrap = intercept[IllegalArgumentException] {
      Dds.merge(Dds.deserialize(big), Dds.deserialize(big), "spec")
    }
    assert(wrap.getMessage.contains("overflow"))
    // same wrap through the total-count walk of quantile: two buckets
    // summing past Long.MAX
    val two = sketch(Seq(3 -> (Long.MaxValue - 10L), 7 -> 100L))
    val wrapTotal = intercept[IllegalArgumentException] {
      Dds.quantile(Dds.deserialize(two), 0.5)
    }
    assert(wrapTotal.getMessage.contains("overflow"))
    // a top-range bucket index (unreachable from any finite double —
    // only hostile bytes can carry it) overflows gamma^i to Infinity:
    // the quantile must fail loudly, never return ±Infinity
    val inf = intercept[IllegalArgumentException] {
      Dds.quantile(Dds.deserialize(sketch(Seq(100000 -> 5L))), 0.99)
    }
    assert(inf.getMessage.contains("estimate overflows"))
    // but LEGAL near-MaxValue inputs must NOT trip it (review-caught:
    // the naive 2·gamma^i intermediate overflowed before the /(g+1)
    // brought the estimate back into range) — the sub-1 factor applies
    // first, so every finite input round-trips to a finite estimate
    val huge = new Dds.DState(java.lang.Double.doubleToLongBits(0.01))
    Dds.add(huge, Double.MaxValue)
    Dds.add(huge, -Double.MaxValue)
    val hi = Dds.quantile(huge, 1.0).asInstanceOf[Double]
    val lo = Dds.quantile(huge, 0.0).asInstanceOf[Double]
    assert(!hi.isInfinite && hi > 1e307, s"got $hi")
    assert(!lo.isInfinite && lo < -1e307, s"got $lo")
  }
}
