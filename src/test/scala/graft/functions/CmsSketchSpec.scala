package graft.functions

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** CMS-bytes contract: estimates off the sketch bytes are
  * value-identical to the an14 relation form (same d/w/probe hash),
  * always ≥ the true count, canonical across partitionings, roll-up
  * bytes identical to direct sketching (merge = cell addition),
  * sparse/dense boundary round-trips, hostile bytes fail loudly, and
  * the SQL registration reaches the same expressions. */
class CmsSketchSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  test("estimates equal the Sketches relation form and bound the true counts") {
    import spark.implicits._
    val words = (1 to 5000).map(i => s"w${i % 331}").toDF("w")
    val wc = words.groupBy($"w").agg(count(lit(1)).as("n"))
    // relation form (an14 machinery)
    val rel = graft.operators.Sketches.cmsEstimate(
      wc, "w", graft.operators.Sketches.cmsBuild(wc, "w", "n", d = 4, w = 2048),
      d = 4, w = 2048)
    // bytes form: one sketch, scalar probe per key
    val sk = words.agg(Cms.cms_sketch($"w").as("sk"))
    val bytes = wc.crossJoin(broadcast(sk))
      .select($"w", $"n", Cms.cms_est($"sk", $"w").as("est_b"))
    val joined = bytes.join(rel, Seq("w")).collect()
    assert(joined.length === 331)
    joined.foreach { r =>
      val (n, estB, estR) =
        (r.getAs[Long]("n"), r.getAs[Long]("est_b"), r.getAs[Long]("est"))
      assert(estB === estR, s"bytes vs relation diverge on ${r.getAs[String]("w")}")
      assert(estB >= n, s"CMS lower bound violated on ${r.getAs[String]("w")}")
    }
  }

  test("roll-up bytes identical to direct sketching; canonical across partitionings") {
    import spark.implicits._
    val df = (1 to 8000).map(i => (i % 7, s"k${i % 911}")).toDF("g", "w")
    val direct = df.agg(Cms.cms_sketch($"w").as("sk")).head().getAs[Array[Byte]](0)
    val tiered = df.groupBy($"g").agg(Cms.cms_sketch($"w").as("sk"))
      .agg(Cms.cms_merge_sketch($"sk").as("sk")).head().getAs[Array[Byte]](0)
    assert(tiered.toSeq === direct.toSeq)
    val parts = Seq(1, 5, 32).map { p =>
      df.repartition(p).agg(Cms.cms_sketch($"w").as("sk")).head().getAs[Array[Byte]](0)
    }
    assert(parts.map(_.toSeq).distinct.size === 1)
  }

  test("sparse/dense serialization boundary round-trips; probe matches cmsPosition") {
    import spark.implicits._
    import org.apache.spark.unsafe.types.UTF8String
    // few keys -> sparse bytes, far below the dense 64 KiB page
    val sparse = Seq("a", "b", "a").toDF("w")
      .agg(Cms.cms_sketch($"w").as("sk")).head().getAs[Array[Byte]](0)
    assert(sparse.length < 200, s"sparse sketch unexpectedly ${sparse.length} B")
    val cells = Cms.deserialize(sparse)
    assert(Cms.estimate(cells, UTF8String.fromString("a")) === 2L)
    assert(Cms.estimate(cells, UTF8String.fromString("b")) === 1L)
    assert(Cms.estimate(cells, UTF8String.fromString("zz-unseen")) === 0L)
    // the engine-side probe is the SQL probe: replay via the Column form
    val pos = Seq("probe-key").toDF("w")
      .select((0 until 4).map(j =>
        graft.operators.Sketches.cmsPosition($"w", j, 2048).as(s"p$j")): _*)
      .head()
    (0 until 4).foreach { j =>
      assert(Cms.position(j, UTF8String.fromString("probe-key")) === pos.getLong(j).toInt)
    }
    // many distinct keys push past the sparse ceiling -> dense page
    val dense = (1 to 3000).map(i => s"d$i").toDF("w")
      .agg(Cms.cms_sketch($"w").as("sk")).head().getAs[Array[Byte]](0)
    assert(dense.length === 3 + 8 * Cms.Cells)
    assert(Cms.deserialize(dense).sum === 3000L * 4)
  }

  test("weighted INIT over (key, count) rows is byte-identical to raw rows") {
    import spark.implicits._
    val raw = (1 to 2000).map(i => s"k${i % 97}").toDF("w")
    val fromRaw = raw.agg(Cms.cms_sketch($"w").as("sk")).head().getAs[Array[Byte]](0)
    val fromCounts = raw.groupBy($"w").agg(count(lit(1)).as("n"))
      .agg(Cms.cms_sketch($"w", $"n").as("sk")).head().getAs[Array[Byte]](0)
    assert(fromCounts.toSeq === fromRaw.toSeq)
    // zero weights are no-ops; null weights skip the row
    val withZeros = raw.groupBy($"w").agg(count(lit(1)).as("n"))
      .union(Seq(("ghost", 0L)).toDF("w", "n"))
      .agg(Cms.cms_sketch($"w", $"n").as("sk")).head().getAs[Array[Byte]](0)
    assert(withZeros.toSeq === fromRaw.toSeq)
    // negative weights fail loudly (the lower-bound guarantee)
    val e = intercept[Exception] {
      Seq(("k", -1L)).toDF("w", "n").agg(Cms.cms_sketch($"w", $"n")).head()
    }
    assert(e.getMessage.contains("negative weight") ||
      e.getCause != null && e.getCause.getMessage.contains("negative weight"))
    // SQL 2-arg form reaches the same expression
    GraftFunctions.register(spark)
    raw.groupBy($"w").agg(count(lit(1)).as("n")).createOrReplaceTempView("cms_wc")
    val sqlBytes = spark.sql("SELECT cms_sketch(w, n) AS sk FROM cms_wc")
      .head().getAs[Array[Byte]](0)
    assert(sqlBytes.toSeq === fromRaw.toSeq)
  }

  test("null keys ignored; hostile bytes fail loudly") {
    import spark.implicits._
    val r = Seq(Some("a"), None, Some("a")).toDF("w")
      .agg(Cms.cms_sketch($"w").as("sk"))
      .select(Cms.cms_est($"sk", lit("a"))).head()
    assert(r.getLong(0) === 2L)
    val e1 = intercept[Exception] {
      Seq(Array[Byte](9, 9, 9)).toDF("sk").agg(Cms.cms_merge_sketch($"sk")).head()
    }
    assert(e1.getMessage.contains("cms") ||
      e1.getCause != null && e1.getCause.getMessage.contains("cms"))
    // negative sparse count: loud format error, not a silent undershoot
    val buf = java.nio.ByteBuffer.allocate(3 + 4 + 12)
    buf.put(Cms.Magic).put(Cms.Version).put(Cms.SparseTag).putInt(1)
    buf.putInt(5).putLong(-3L)
    val e2 = intercept[IllegalArgumentException] { Cms.deserialize(buf.array()) }
    assert(e2.getMessage.contains("non-positive"))
  }

  test("SQL registration: cms_sketch/cms_merge_sketch/cms_est from plain SQL") {
    GraftFunctions.register(spark)
    import spark.implicits._
    (1 to 300).map(i => (i % 3, s"t${i % 41}")).toDF("g", "w")
      .createOrReplaceTempView("cms_in")
    val est = spark.sql(
      """SELECT cms_est(sk, 't0') AS est FROM (
        |  SELECT cms_merge_sketch(sk) AS sk FROM (
        |    SELECT cms_sketch(w) AS sk FROM cms_in GROUP BY g))""".stripMargin)
      .head().getLong(0)
    // t0 appears for i % 41 == 0 within 1..300: i in {41,82,...,287} -> 7 rows
    assert(est >= 7L)
    val exact = spark.sql("SELECT count(*) FROM cms_in WHERE w = 't0'").head().getLong(0)
    assert(exact === 7L && est >= exact)
  }

  test("cms_est_all: one decode, k probes — element-for-element equal to cms_est (r12)") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val keys = (0 until 12).map(i => s"t$i")
    val sk = (1 to 500).map(i => s"t${i % 17}").toDF("w")
      .agg(Cms.cms_sketch($"w").as("sk"))
    // multi-probe vs k single probes off the same bytes, plus a null
    // element (null estimate) and an absent key (collision floor >= 0)
    val row = sk.select(
      Cms.cms_est_all($"sk",
        array(keys.map(lit(_)) :+ lit(null).cast("string") :+ lit("absent-key"): _*))
        .as("multi"),
      array(keys.map(k => Cms.cms_est($"sk", lit(k))): _*).as("single")).head()
    val multi = row.getSeq[Any](0)
    val single = row.getSeq[Long](1)
    assert(multi.take(12) === single)
    assert(multi(12) == null, "null key element must yield a null estimate")
    assert(multi(13).asInstanceOf[Long] >= 0L)
    // SQL registration
    GraftFunctions.register(spark)
    sk.createOrReplaceTempView("cms_sk_multi")
    val viaSql = spark.sql(
      "SELECT cms_est_all(sk, array('t0', 't1')) FROM cms_sk_multi")
      .head().getSeq[Long](0)
    assert(viaSql === single.take(2))
    // analysis-time type check: non-array keys are rejected
    val e = intercept[Exception] {
      sk.select(Cms.cms_est_all($"sk", lit("t0"))).head()
    }
    assert(e.getMessage.contains("ARRAY"))
  }
}
