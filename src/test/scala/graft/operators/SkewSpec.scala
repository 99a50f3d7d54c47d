package graft.operators

import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

class SkewSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  // one pathologically hot key (90% of rows) + a long tail
  lazy val skewed = ((1 to 9000).map(i => ("hot", i.toLong, i * 1.0)) ++
    (1 to 1000).map(i => (s"k${i % 50}", i.toLong, i * 2.0)))
    .toDF("k", "rid", "v")

  test("salted aggregation equals the plain aggregation") {
    import org.apache.spark.sql.functions._
    val plain = skewed.groupBy("k")
      .agg(sum($"v").as("sum_v"), count(lit(1)).as("n"))
      .collect().map(r => (r.getString(0), r.getDouble(1), r.getLong(2))).toSet
    val salted = Skew.saltedSum(skewed, Seq("k"), "v", "rid", salts = 8)
      .collect().map(r => (r.getString(0), r.getDouble(1), r.getLong(2))).toSet
    assert(salted === plain)
  }

  test("salted join equals the plain inner join") {
    val dim = Seq(("hot", "HOT"), ("k1", "K1"), ("k7", "K7"), ("missing", "M"))
      .toDF("k", "label")
    val plain = skewed.join(dim, "k").select("k", "rid", "label")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getString(2))).toSet
    val salted = Skew.saltedJoin(skewed, dim, "k", "rid", salts = 8)
      .select("k", "rid", "label")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getString(2))).toSet
    assert(salted === plain)
  }

  test("salting is deterministic across recomputation") {
    val a = Skew.saltedSum(skewed.repartition(3), Seq("k"), "v", "rid", 8).collect().toSet
    val b = Skew.saltedSum(skewed.repartition(11), Seq("k"), "v", "rid", 8).collect().toSet
    // sums of doubles per (k, salt) partial: double addition order inside
    // a salt bucket is fixed by the deterministic salt, so totals match
    assert(a.map(_.getString(0)) === b.map(_.getString(0)))
  }

  // ---- Skew.dispatchJoin (the an32-report -> weapon composition) ------

  test("dispatchJoin routes each measured regime to the weapon the curves justify") {
    import org.apache.spark.sql.functions._
    val dim = ((0 to 60).map(i => (s"k$i", s"L$i")) :+ (("hot", "HOT")))
      .toDF("k", "label")
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.select("k", "rid", "label").collect()
        .map(r => (r.getString(0), r.getLong(1), r.getString(2))).sorted.toSeq

    // regime 1 — uniform keys: max/mean ~ 1, AQE handles it -> plain
    val uniform = (1 to 5000).map(i => (s"k${i % 50}", i.toLong, 1.0)).toDF("k", "rid", "v")
    val (dfP, sP) = Skew.dispatchJoin(uniform, dim, "k", "rid")
    assert(sP === "plain")
    assert(rows(dfP) === rows(uniform.join(dim, "k")))

    // regime 2 — one key owns 90% of rows, hot set enumerable -> hotcold
    val (dfH, sH) = Skew.dispatchJoin(skewed, dim, "k", "rid")
    assert(sH === "hotcold")
    assert(rows(dfH) === rows(skewed.join(dim, "k")))
    assert(dfH.queryExecution.executedPlan.toString.contains("BroadcastHashJoin"),
      "hot slice not broadcast")

    // regime 3 — MANY hot keys (more than the IN-list cap) -> salted
    val manyHot = (1 to 6000).map(i => (s"k${i % 6}", i.toLong, 1.0))
      .toDF("k", "rid", "v")
      .unionByName((1 to 600).map(i => (s"t$i", i.toLong, 1.0)).toDF("k", "rid", "v"))
    val (dfS, sS) = Skew.dispatchJoin(manyHot, dim, "k", "rid",
      skewRatio = 2, maxHotKeys = 2, salts = 4)
    assert(sS === "salted")
    assert(rows(dfS) === rows(manyHot.join(dim, "k")))

    // empty left never throws, routes plain
    val (dfE, sE) = Skew.dispatchJoin(uniform.filter(lit(false)), dim, "k", "rid")
    assert(sE === "plain" && dfE.count() === 0L)
  }

  // ---- Skew.hotColdJoin (sk3) -----------------------------------------

  test("hotColdJoin equals the plain inner join, rows never duplicated") {
    val dim = Seq(("hot", "HOT"), ("k1", "K1"), ("k7", "K7"), ("missing", "M"))
      .toDF("k", "label")
    val plain = skewed.join(dim, "k").select("k", "rid", "label")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getString(2)))
    val split = Skew.hotColdJoin(skewed, dim, "k", hotThreshold = 50)
      .select("k", "rid", "label")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getString(2)))
    // multiset equality: the disjoint hot/cold key split must neither
    // drop nor duplicate a single row
    assert(split.sorted.toSeq === plain.sorted.toSeq)
  }

  test("hotColdJoin plans a broadcast for the hot keys and falls back to a plain join when none are hot") {
    val dim = skewed.select("k").distinct().withColumn("label", org.apache.spark.sql.functions.upper($"k"))
    val split = Skew.hotColdJoin(skewed, dim, "k", hotThreshold = 50)
    val p = split.queryExecution.sparkPlan.toString
    assert(p.contains("BroadcastHashJoin"), s"hot branch not broadcast:\n$p")
    assert(p.contains("Union"), s"no hot/cold union:\n$p")
    // threshold above every key's count → the plain single-join path
    val none = Skew.hotColdJoin(skewed, dim, "k", hotThreshold = 1000000)
    assert(!none.queryExecution.sparkPlan.toString.contains("Union"))
  }

  test("hotColdJoin: a null key crossing the threshold never poisons the IN list") {
    // 200 null-keyed rows (over threshold) + normal keys: an IN list
    // containing null makes non-matching rows NULL (not false), which
    // would silently empty the cold branch — nulls must never be "hot"
    val withNulls = ((1 to 200).map(i => (null.asInstanceOf[String], i.toLong, 0.0)) ++
      (1 to 200).map(i => ("hot", 1000L + i, 0.0)) ++
      (1 to 5).map(i => (s"cold$i", 2000L + i, 0.0))).toDF("k", "rid", "v")
    val dim = withNulls.select("k").distinct()
      .withColumn("label", org.apache.spark.sql.functions.coalesce(
        org.apache.spark.sql.functions.upper($"k"),
        org.apache.spark.sql.functions.lit("NULL")))
    val plain = withNulls.join(dim, "k").select("k", "rid")
      .collect().map(r => (r.getString(0), r.getLong(1)))
    val split = Skew.hotColdJoin(withNulls, dim, "k", hotThreshold = 50)
      .select("k", "rid")
      .collect().map(r => (r.getString(0), r.getLong(1)))
    assert(split.sorted.toSeq === plain.sorted.toSeq)
    assert(split.count(_._1.startsWith("cold")) === 5) // cold branch intact
  }

  test("hotColdJoin fails fast when the hot-key set would not be broadcastable") {
    // every key 'hot' at threshold 1 and maxHotKeys below the key count
    val dim = skewed.select("k").distinct().withColumn("label", org.apache.spark.sql.functions.upper($"k"))
    val e = intercept[IllegalArgumentException] {
      Skew.hotColdJoin(skewed, dim, "k", hotThreshold = 1, maxHotKeys = 2)
    }
    assert(e.getMessage.contains("hotColdJoin"))
  }

  test("hotColdJoin's hot-key probe is bounded on a WIDE all-hot key domain") {
    // 100k distinct keys, every one 'hot' at threshold 1: the probe must
    // materialize maxHotKeys + 1 rows (dispatchJoin's limit), never the
    // whole key set — a mis-set threshold fails with the clean require,
    // not a driver-sized collect
    import org.apache.spark.sql.functions._
    val wide = spark.range(100000L)
      .select(concat(lit("w"), $"id").as("k"), $"id".as("rid"))
    val dim = Seq(("w0", "W0")).toDF("k", "label")
    val e = intercept[IllegalArgumentException] {
      Skew.hotColdJoin(wide, dim, "k", hotThreshold = 1, maxHotKeys = 10)
    }
    assert(e.getMessage.contains("more than 10 keys"))
  }
}
