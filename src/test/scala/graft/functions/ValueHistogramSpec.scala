package graft.functions

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** Exact-quantile sketch contract: the pinned discrete-lower rule vs a
  * brute-force reference, exactness and determinism across
  * partitionings/merge orders, INIT→MERGE ≡ one-shot, null/empty
  * handling, loud failures. */
class ValueHistogramSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  /** Reference: smallest value whose cumulative count >= ceil(q*n). */
  private def ref(vs: Seq[Long], q: Double): Long = {
    val sorted = vs.sorted
    val tgt = math.max(1L, java.math.BigDecimal.valueOf(q)
      .multiply(java.math.BigDecimal.valueOf(sorted.size.toLong))
      .setScale(0, java.math.RoundingMode.CEILING).longValueExact())
    sorted((tgt - 1).toInt)
  }

  test("quantiles equal the brute-force rule across partitionings, q sweep, dup-heavy + negative values") {
    import spark.implicits._
    val rnd = new scala.util.Random(99)
    val vs = Seq.fill(20000)((rnd.nextLong() % 500L) - 100L) // heavy dups, negatives
    val df = vs.toDF("v")
    for (q <- Seq(0.0, 0.01, 0.25, 0.5, 0.75, 0.95, 0.99, 1.0); p <- Seq(1, 7, 32)) {
      val got = df.repartition(p).agg(Vhist.vhist_quantile($"v", q)).head().getLong(0)
      assert(got === ref(vs, q), s"q=$q parts=$p")
    }
  }

  test("INIT -> MERGE roll-up equals the one-shot quantile exactly (counts add losslessly)") {
    import spark.implicits._
    val df = (1L to 30000L).map(i => (s"g${i % 6}", (i * 7919L) % 1000L)).toDF("g", "v")
    for (q <- Seq(0.5, 0.95, 0.99)) {
      val oneShot = df.agg(Vhist.vhist_quantile($"v", q)).head().getLong(0)
      val rolled = df.groupBy($"g").agg(Vhist.vhist_sketch($"v").as("sk"))
        .agg(Vhist.vhist_merge_quantile($"sk", q)).head().getLong(0)
      assert(rolled === oneShot, s"q=$q")
      assert(rolled === ref(df.collect().map(_.getLong(1)).toSeq, q), s"q=$q vs ref")
    }
  }

  test("sketch bytes are canonical: any partitioning, same bytes") {
    import spark.implicits._
    val df = (1L to 5000L).map(i => (i * 31L) % 257L).toDF("v")
    val bytes = Seq(1, 8, 32).map { p =>
      df.repartition(p).agg(Vhist.vhist_sketch($"v")).head().getAs[Array[Byte]](0).toSeq
    }
    assert(bytes.distinct.size === 1)
  }

  test("nulls ignored; empty input yields null; SQL registration works") {
    import spark.implicits._
    GraftFunctions.register(spark)
    val df = Seq(Some(5L), None, Some(1L), Some(9L)).toDF("v")
    assert(df.agg(Vhist.vhist_quantile($"v", 0.5)).head().getLong(0) === 5L)
    assert(df.filter($"v".isNull).agg(Vhist.vhist_quantile($"v", 0.5)).head().isNullAt(0))
    df.createOrReplaceTempView("vh_in")
    assert(spark.sql("SELECT vhist_quantile(v, 0.5) FROM vh_in").head().getLong(0) === 5L)
    val viaSketch = spark.sql(
      """SELECT vhist_merge_quantile(sk, CAST(1.0 AS DOUBLE)) FROM (
        |  SELECT vhist_sketch(v) AS sk FROM vh_in GROUP BY v % 2)""".stripMargin)
      .head().getLong(0)
    assert(viaSketch === 9L)
  }

  test("analysis-time failures: bad q, mistyped inputs") {
    import spark.implicits._
    val df = Seq(1L).toDF("v")
    val e1 = intercept[Exception] {
      df.agg(Vhist.vhist_quantile($"v", 1.5)).queryExecution.analyzed
    }
    assert(e1.getMessage.contains("[0, 1]") || e1.getMessage.contains("vhist"))
    val e2 = intercept[Exception] {
      Seq("x").toDF("v").agg(Vhist.vhist_sketch($"v")).queryExecution.analyzed
    }
    assert(e2.getMessage.toLowerCase.contains("integral") || e2.getMessage.contains("vhist"))
    val e3 = intercept[Exception] {
      Seq(1L).toDF("sk").agg(Vhist.vhist_merge_quantile($"sk", 0.5))
        .queryExecution.analyzed
    }
    assert(e3.getMessage.toLowerCase.contains("binary") || e3.getMessage.contains("vhist"))
  }

  test("foreign bytes fail loudly at merge") {
    import spark.implicits._
    val e = intercept[Exception] {
      Seq(Array[Byte](9, 9, 9, 9, 9, 9, 9)).toDF("sk")
        .agg(Vhist.vhist_merge_quantile($"sk", 0.5)).head()
    }
    def msgs(t: Throwable): Seq[String] =
      if (t == null) Nil else Option(t.getMessage).toSeq ++ msgs(t.getCause)
    assert(msgs(e).exists(_.contains("magic")))
  }

  test("unit-pinned sketch: pre-bucket inside the expression, quantile back in original units") {
    import spark.implicits._
    // latencies in microseconds, sketched at unit=1000 (ms buckets):
    // the quantile must come back as the winning ms bucket's lower edge
    val us = (1 to 1000).map(i => i.toLong * 1000L + 499L).toDF("lat_us")
    val sk = us.agg(Vhist.vhist_sketch($"lat_us", 1000L).as("sk"))
    val p50 = sk.agg(Vhist.vhist_merge_quantile($"sk", 0.5)).head().getLong(0)
    // floor((500*1000+499)/1000) = 500 buckets -> x1000 back = 500000
    assert(p50 === 500000L)
    // the unit rides the bytes: V2-tagged, refuses the unit-1 reader
    val bytes = sk.head().getAs[Array[Byte]](0)
    val (u, _) = Vhist.deserializeTagged(bytes)
    assert(u === 1000L)
    val e = intercept[IllegalArgumentException] { Vhist.deserialize(bytes) }
    assert(e.getMessage.contains("unit"))
    // unit=1 through the 2-arg form is byte-identical to the 1-arg form
    val a = us.agg(Vhist.vhist_sketch($"lat_us", 1L)).head().getAs[Array[Byte]](0)
    val b = us.agg(Vhist.vhist_sketch($"lat_us")).head().getAs[Array[Byte]](0)
    assert(java.util.Arrays.equals(a, b))
  }

  test("merging sketches with DIFFERENT units fails loudly, never silently count-adds") {
    import spark.implicits._
    val df = (1 to 100).map(_.toLong).toDF("v")
    val ms = df.agg(Vhist.vhist_sketch($"v", 10L).as("sk"))
    val s = df.agg(Vhist.vhist_sketch($"v", 100L).as("sk"))
    val e = intercept[Exception] {
      ms.unionByName(s).agg(Vhist.vhist_merge_quantile($"sk", 0.5)).head()
    }
    def msgs(t: Throwable): Seq[String] =
      if (t == null) Nil else Option(t.getMessage).toSeq ++ msgs(t.getCause)
    assert(msgs(e).exists(_.contains("different units")))
    // same-unit sketches from different groups merge fine, SQL form too
    graft.functions.GraftFunctions.register(spark)
    df.withColumn("g", $"v" % 2).createOrReplaceTempView("vh_unit_t")
    val merged = spark.sql(
      """SELECT vhist_merge_quantile(sk, 0.5) AS p50 FROM (
        |  SELECT g, vhist_sketch(v, 10) AS sk FROM vh_unit_t GROUP BY g)""".stripMargin)
      .head().getLong(0)
    // bucket floor(50/10)=5 is the median bucket -> 5*10 = 50
    assert(merged === 50L)
  }

  test("corrupt counts fail loudly at deserialize, never as an NPE in quantile") {
    // well-formed header, one entry with a NEGATIVE count: the cumulative
    // walk could never reach its target — deserialize must reject it
    def sketch(count: Long): Array[Byte] = {
      val buf = java.nio.ByteBuffer.allocate(1 + 1 + 4 + 16)
      buf.put(Vhist.Magic).put(Vhist.Version).putInt(1)
      buf.putLong(42L).putLong(count)
      buf.array()
    }
    // confirm the hand-crafted layout itself is accepted when sane
    assert(Vhist.quantile(Vhist.deserialize(sketch(3L)), 0.5) === 42L)
    val e = intercept[IllegalArgumentException] { Vhist.deserialize(sketch(-3L)) }
    assert(e.getMessage.contains("non-positive count"))
    val z = intercept[IllegalArgumentException] { Vhist.deserialize(sketch(0L)) }
    assert(z.getMessage.contains("non-positive count"))
  }

  test("hostile unit-0 V2 bytes carrying entries are rejected (the reconcile bypass)") {
    // unit 0 is the unset-PARTIAL sentinel reconcileUnit deliberately
    // skips; a unit-0 sketch WITH entries would count-add raw buckets
    // into any tier without tripping the unit check — deserializeTagged
    // must refuse it. Empty unit-0 partials stay legal.
    def v2(unit: Long, entries: Int): Array[Byte] = {
      val buf = java.nio.ByteBuffer.allocate(1 + 1 + 8 + 4 + 16 * entries)
      buf.put(Vhist.Magic).put(Vhist.Version2).putLong(unit).putInt(entries)
      (1 to entries).foreach(i => buf.putLong(i.toLong).putLong(1L))
      buf.array()
    }
    assert(Vhist.deserializeTagged(v2(0L, 0))._2.isEmpty) // legal empty partial
    assert(Vhist.deserializeTagged(v2(1000L, 2))._1 === 1000L) // legal tagged sketch
    val e = intercept[IllegalArgumentException] { Vhist.deserializeTagged(v2(0L, 2)) }
    assert(e.getMessage.contains("unit-0"))
  }
}
