package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** Bloom semi-join reduction, CDC upsert merge, Z-order layout. */
class ScaleOpsSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  // ---- Bloom ---------------------------------------------------------

  test("bloom: no false negatives, false-positive rate inside the design bound") {
    val build = (1L to 500L).toDF("key")
    val probe = (1L to 2000L).toDF("key")
    val out = Bloom.probe(probe, "key", Bloom.build(build, "key", k = 3, m = 1 << 13), k = 3, m = 1 << 13)
      .select($"key", $"bloom_pass").collect().map(r => (r.getLong(0), r.getBoolean(1)))
    // every build key passes — the structural guarantee
    assert(out.filter(_._1 <= 500).forall(_._2))
    // absent keys pass at ~(1 - e^(-kn/m))^k ≈ 0.5%; 5% is a generous ceiling
    val fp = out.count { case (k2, p) => k2 > 500 && p }
    assert(fp < 75, s"false positives: $fp of 1500")
  }

  test("bloom semiJoinReduce is a superset of the semi-join and a fraction of the input") {
    val small = (1L to 300L).map(i => i * 13).toDF("key")
    val big = (1L to 8000L).toDF("key")
    val reduced = Bloom.semiJoinReduce(big, "key", small, "key")
    val semi = big.join(small.withColumnRenamed("key", "k2"), $"key" === $"k2", "left_semi")
    assert(semi.exceptAll(reduced).count() === 0) // no survivor lost
    val n = reduced.count()
    assert(n >= semi.count() && n < 8000, s"reduced to $n")
  }

  test("bloom probe plan: big side sees only a broadcast of the one-row filter, no shuffle") {
    val small = (1L to 100L).toDF("key")
    val big = (1L to 1000L).toDF("key")
    val plan = Bloom.probe(big, "key", Bloom.build(small, "key", 3, 1 << 13), 3, 1 << 13)
      .queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastNestedLoopJoin")) // 1-row filter side
    assert(!plan.contains("SortMergeJoin") && !plan.contains("ShuffledHashJoin"))
  }

  // ---- Cdc -----------------------------------------------------------

  test("cdc upsert: last version wins, tombstones delete, inserts land") {
    val base = Seq((1L, "a"), (2L, "b"), (3L, "c")).toDF("key", "v")
    val changes = Seq(
      (1L, "a1", 1L, "U"), (1L, "a2", 2L, "U"), // two generations: a2 wins
      (2L, "b1", 1L, "U"),
      (3L, "c", 1L, "D"),                        // delete
      (4L, "d", 1L, "U")                         // insert
    ).toDF("key", "v", "version", "op")
    val out = Cdc.upsert(Cdc.asBase(base).unionByName(changes), Seq("key"))
      .select("key", "v").as[(Long, String)].collect().sortBy(_._1)
    assert(out.toSeq === Seq((1L, "a2"), (2L, "b1"), (4L, "d")))
  }

  test("cdc upsert is idempotent: re-merging the snapshot with the same log is a no-op") {
    val base = (1L to 50L).map(i => (i, s"v$i")).toDF("key", "v")
    val changes = Seq((7L, "x", 1L, "U"), (13L, "y", 1L, "D"), (60L, "z", 1L, "U"))
      .toDF("key", "v", "version", "op")
    val once = Cdc.upsert(Cdc.asBase(base).unionByName(changes), Seq("key"))
    val twice = Cdc.upsert(Cdc.asBase(once.drop("version")).unionByName(changes), Seq("key"))
    assert(once.select("key", "v").exceptAll(twice.select("key", "v")).count() === 0)
    assert(twice.select("key", "v").exceptAll(once.select("key", "v")).count() === 0)
  }

  test("cdc compact fold: tombstones survive, so batch order cannot resurrect a delete") {
    // the e14 failure mode: a deleted key's OLDER update arrives in a
    // later (or redelivered) batch. With upsert's eager delete-drop the
    // key would resurrect; compact keeps the tombstone and wins on
    // version. Both fold orders must agree.
    val batchA = Seq((1L, 0L, 100L, "D"), (2L, 5L, 10L, "U"))
      .toDF("key", "v", "version", "op")
    val batchB = Seq((1L, 3L, 50L, "U")).toDF("key", "v", "version", "op")
    def fold(bs: Seq[org.apache.spark.sql.DataFrame]) =
      bs.reduceLeft((st, b) => Cdc.compact(st.unionByName(b), Seq("key")))
        .filter($"op" =!= "D")
        .select("key", "v").as[(Long, Long)].collect().toSet
    val ab = fold(Seq(batchA, batchB))
    val ba = fold(Seq(batchB, batchA))
    assert(ab === Set((2L, 5L)))
    assert(ba === ab)
    // redelivery of any batch is a no-op
    assert(fold(Seq(batchA, batchA, batchB, batchB)) === ab)
  }

  test("cdc delete-then-reinsert at a later version resurrects the key") {
    val base = Seq((1L, "old")).toDF("key", "v")
    val changes = Seq((1L, "old", 1L, "D"), (1L, "new", 2L, "U")).toDF("key", "v", "version", "op")
    val out = Cdc.upsert(Cdc.asBase(base).unionByName(changes), Seq("key"))
      .select("key", "v").as[(Long, String)].collect()
    assert(out.toSeq === Seq((1L, "new")))
  }

  test("cdc upsertEvolve: the log's new column null-fills the base, LWW still holds") {
    val base = Seq((1L, "a"), (2L, "b"), (3L, "c")).toDF("key", "v")
    val changes = Seq(
      (1L, "a1", "west", 1L, "U"), // touched: carries the new column
      (3L, "c", "east", 1L, "D"),  // delete still deletes
      (4L, "d", "north", 1L, "U")  // insert lands with the new column
    ).toDF("key", "v", "region", "version", "op")
    val out = Cdc.upsertEvolve(base, changes, Seq("key"))
      .select("key", "v", "region")
      .as[(Long, String, Option[String])].collect().sortBy(_._1)
    assert(out.toSeq === Seq(
      (1L, "a1", Some("west")),
      (2L, "b", None),           // untouched base row: evolved column is NULL
      (4L, "d", Some("north"))))
  }

  test("cdc upsertEvolve equals plain upsert when no schema evolves") {
    val base = (1L to 40L).map(i => (i, s"v$i")).toDF("key", "v")
    val changes = Seq((7L, "x", 1L, "U"), (13L, "y", 1L, "D"))
      .toDF("key", "v", "version", "op")
    val evolved = Cdc.upsertEvolve(base, changes, Seq("key")).select("key", "v")
    val plain = Cdc.upsert(Cdc.asBase(base).unionByName(changes), Seq("key"))
      .select("key", "v")
    assert(evolved.exceptAll(plain).count() === 0)
    assert(plain.exceptAll(evolved).count() === 0)
  }

  // ---- RangeJoin -----------------------------------------------------

  test("range join equals the naive predicate join, including overlaps and hi-exclusivity") {
    val points = (0L to 500L).map(i => (i, i * 7 % 400)).toDF("id", "p")
    // overlapping intervals, some spanning multiple buckets, one empty
    val intervals = Seq(
      (1L, 0L, 100L), (2L, 50L, 250L), (3L, 100L, 101L),
      (4L, 300L, 300L), (5L, 240L, 400L)
    ).toDF("iid", "lo", "hi")
    val fast = RangeJoin.pointInInterval(points, "p", intervals, "lo", "hi", bucketWidth = 64L)
      .select("id", "iid")
    val naive = points.join(intervals, $"p" >= $"lo" && $"p" < $"hi")
      .select("id", "iid")
    assert(fast.exceptAll(naive).count() === 0)
    assert(naive.exceptAll(fast).count() === 0)
    // hi is exclusive: a point sitting exactly on an interval's hi
    // must not pair with that interval
    val atBoundary = points.join(intervals, $"p" === $"hi").select("id", "iid")
    assert(atBoundary.count() > 0 && atBoundary.intersect(fast).count() === 0)
  }

  test("range join is exact beyond 2^53 and at Long.MIN-adjacent points") {
    // the retired double-division bucket (floor(v / w.toDouble)) lost
    // mantissa bits past 2^53 and silently dropped matches; the MIN
    // neighborhood exercises the ANSI-safe wrap guard
    val big = (0L to 4L).map(i => (i, (1L << 53) - 2L + i)).toDF("id", "p")
    val minPts = Seq((100L, Long.MinValue), (101L, Long.MinValue + 3L))
      .toDF("id", "p")
    val pts = big.unionByName(minPts)
    val ivs = Seq(
      (1L, (1L << 53) - 10L, (1L << 53) + 1L),
      (2L, Long.MinValue, Long.MinValue + 10L)).toDF("iid", "lo", "hi")
    val fast = RangeJoin.pointInInterval(pts, "p", ivs, "lo", "hi",
      bucketWidth = 2L).select("id", "iid")
    val naive = pts.join(ivs, $"p" >= $"lo" && $"p" < $"hi").select("id", "iid")
    assert(naive.count() > 0)
    assert(fast.exceptAll(naive).count() === 0)
    assert(naive.exceptAll(fast).count() === 0)
  }

  test("range join rejects inputs whose columns collide with its internals") {
    // same contract Bloom.probe enforces: a payload column named like
    // the bucketing internals (_rj_num/_bl/_bh/_bkt) would resolve
    // ambiguously and then be silently dropped — fail fast instead
    val pts = (0L to 10L).toDF("p").withColumn("_bkt", $"p")
    val ivs = Seq((1L, 0L, 5L)).toDF("iid", "lo", "hi")
    val ex = intercept[IllegalArgumentException] {
      RangeJoin.pointInInterval(pts, "p", ivs, "lo", "hi", 16L)
    }
    assert(ex.getMessage.contains("_bkt"))
    val ivs2 = ivs.withColumn("_bl", $"lo")
    val ex2 = intercept[IllegalArgumentException] {
      RangeJoin.pointInInterval((0L to 10L).toDF("p"), "p", ivs2, "lo", "hi", 16L)
    }
    assert(ex2.getMessage.contains("_bl"))
  }

  test("interval overlap join equals the naive theta join, each pair exactly once") {
    // intervals wide relative to the bucket (multi-bucket pairs must
    // still emit ONCE), touching intervals (adjacency is not overlap),
    // an empty interval, and a fully-contained one
    val left = Seq(
      (1L, 0L, 100L), (2L, 50L, 250L), (3L, 100L, 105L),
      (4L, 300L, 300L), (5L, 240L, 400L), (6L, 10L, 20L)
    ).toDF("lid", "l_lo", "l_hi")
    val right = Seq(
      (10L, 90L, 260L), (11L, 105L, 110L), (12L, 0L, 10L),
      (13L, 399L, 500L), (14L, 12L, 14L)
    ).toDF("rid", "r_lo", "r_hi")
    val fast = RangeJoin.intervalOverlap(left, "l_lo", "l_hi",
        right, "r_lo", "r_hi", bucketWidth = 16L)
      .select("lid", "rid")
    val naive = left.join(right,
        greatest($"l_lo", $"r_lo") < least($"l_hi", $"r_hi"))
      .select("lid", "rid")
    assert(fast.exceptAll(naive).count() === 0)
    assert(naive.exceptAll(fast).count() === 0)
    // no duplicate emission despite shared buckets
    assert(fast.count() === fast.distinct().count())
    val pairs = fast.as[(Long, Long)].collect().toSet
    assert(pairs.contains((2L, 10L)))  // wide overlap across many buckets
    assert(!pairs.contains((3L, 11L))) // touching at 105: not an overlap
    assert(!pairs.exists(_._1 == 4L))  // empty interval matches nothing
    assert(pairs.contains((6L, 14L)))  // containment is overlap
  }

  test("interval overlap join is exact on negative and Long.MIN-adjacent intervals") {
    val left = Seq((1L, -100L, -50L), (2L, Long.MinValue, Long.MinValue + 8L))
      .toDF("lid", "l_lo", "l_hi")
    val right = Seq((10L, -60L, -55L), (11L, Long.MinValue + 5L, Long.MinValue + 20L),
        (12L, -49L, 0L))
      .toDF("rid", "r_lo", "r_hi")
    val fast = RangeJoin.intervalOverlap(left, "l_lo", "l_hi",
        right, "r_lo", "r_hi", bucketWidth = 7L).select("lid", "rid")
    val naive = left.join(right,
        greatest($"l_lo", $"r_lo") < least($"l_hi", $"r_hi"))
      .select("lid", "rid")
    assert(naive.count() === 2)
    assert(fast.exceptAll(naive).count() === 0)
    assert(naive.exceptAll(fast).count() === 0)
  }

  test("interval overlap join rejects shared or reserved column names") {
    val l = Seq((1L, 2L)).toDF("lo", "hi")
    val r = Seq((1L, 2L)).toDF("lo2", "hi2")
    intercept[IllegalArgumentException] {
      RangeJoin.intervalOverlap(l, "lo", "hi",
        Seq((1L, 2L)).toDF("lo", "hi2"), "lo", "hi2", 8L)
    }
    intercept[IllegalArgumentException] {
      RangeJoin.intervalOverlap(l.withColumn("_bkt", lit(1L)), "lo", "hi",
        r, "lo2", "hi2", 8L)
    }
  }

  test("interval overlap join plans no nested-loop strategy") {
    val l = (0L to 50L).map(i => (i, i * 3, i * 3 + 5)).toDF("lid", "l_lo", "l_hi")
    val r = Seq((1L, 10L, 30L)).toDF("rid", "r_lo", "r_hi")
    val plan = RangeJoin.intervalOverlap(l, "l_lo", "l_hi", r, "r_lo", "r_hi", 16L)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("BroadcastNestedLoopJoin") && !plan.contains("CartesianProduct"))
  }

  test("range join plan is an equi-join on buckets, not a nested-loop join") {
    val points = (0L to 100L).toDF("p")
    val intervals = Seq((1L, 10L, 30L)).toDF("iid", "lo", "hi")
    val plan = RangeJoin.pointInInterval(points, "p", intervals, "lo", "hi", 16L)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("BroadcastNestedLoopJoin") && !plan.contains("CartesianProduct"))
  }

  // ---- Sketches (count-min) ------------------------------------------

  test("cms estimates never undercount, and each hash row sums to the total") {
    val counts = (1 to 400).map(i => (s"key$i", (i % 17 + 1).toLong)).toDF("k", "n")
    val d = 4; val w = 256 // narrow width forces real collisions
    val sketch = Sketches.cmsBuild(counts, "k", "n", d, w)
    assert(sketch.count() <= d.toLong * w)
    // every row j partitions the keys: per-row cell sum == total mass
    val total = counts.agg(sum($"n")).as[Long].head()
    val rowSums = sketch.groupBy("j").agg(sum($"cell").as("s")).select("s").as[Long].collect()
    assert(rowSums.length === d && rowSums.forall(_ === total))
    // one-sided error: est >= exact for EVERY key
    val under = Sketches.cmsEstimate(counts, "k", sketch, d, w)
      .join(counts, Seq("k")).filter($"est" < $"n")
    assert(under.count() === 0)
  }

  test("cms estimates unseen keys as >= 0 rows, never dropping them") {
    // the sketch is SPARSE: an unseen key probing empty cells must
    // still get a row (est = 0 when any of its d cells is untouched),
    // not vanish through an inner join or overestimate via a
    // min-over-non-empty-cells
    val counts = Seq(("a", 5L), ("b", 3L)).toDF("k", "n")
    val sketch = Sketches.cmsBuild(counts, "k", "n", 4, 256)
    val probes = Seq("a", "zz_unseen_1", "zz_unseen_2").toDF("k")
    val est = Sketches.cmsEstimate(probes, "k", sketch, 4, 256)
      .collect().map(r => (r.getString(0), r.getLong(1))).toMap
    assert(est.keySet === Set("a", "zz_unseen_1", "zz_unseen_2"))
    assert(est("a") >= 5L)
    // with 2 keys × 4 hashes in 256 cells, an unseen key colliding in
    // ALL 4 rows is ~impossible: est must be exactly 0
    assert(est("zz_unseen_1") === 0L && est("zz_unseen_2") === 0L)
  }

  test("cms is exact when the width makes collisions vanish") {
    val counts = (1 to 20).map(i => (s"key$i", i.toLong * 10)).toDF("k", "n")
    val est = Sketches.cmsEstimate(counts, "k",
      Sketches.cmsBuild(counts, "k", "n", 4, 1 << 16), 4, 1 << 16)
      .join(counts, Seq("k")).filter($"est" =!= $"n")
    // 20 keys × 4 hashes in 65536 cells: a collision in ALL 4 rows for
    // any key is ~impossible, so min over rows is the exact count
    assert(est.count() === 0)
  }

  // ---- Layout --------------------------------------------------------

  test("zValue interleaves bits: (0b101, 0b011) -> 27") {
    val out = Seq((5L, 3L)).toDF("a", "b")
      .select(Layout.zValue($"a", $"b", 3).as("z")).as[Long].head()
    // a bits at even positions: 1@0, 0@2, 1@4; b bits at odd: 1@1, 1@3, 0@5
    assert(out === (1 + 2 + 8 + 16))
  }

  test("z-ordered layout bounds BOTH dimensions per file; hash layout bounds neither") {
    // a uniform 64x64 grid, one row per cell
    val grid = (0 until 64).flatMap(i => (0 until 64).map(j => (i.toLong, j.toLong)))
      .toDF("b1", "b2")
    def avgSpanProduct(df: org.apache.spark.sql.DataFrame): Double =
      df.withColumn("pid", spark_partition_id())
        .groupBy("pid")
        .agg(((max($"b1") - min($"b1") + 1) * (max($"b2") - min($"b2") + 1)).as("area"))
        .agg(avg($"area")).as[Double].head()
    val zArea = avgSpanProduct(Layout.zOrdered(grid, $"b1", $"b2", bits = 6, numFiles = 16))
    val hashArea = avgSpanProduct(grid.repartition(16, $"b1", $"b2"))
    // 4096 cells / 16 files = 256 cells per file; the z-curve keeps the
    // covered rectangle near that, hash partitioning covers ~the full grid
    assert(zArea < 1300, s"z-ordered avg area $zArea")
    assert(hashArea > 4 * zArea, s"hash $hashArea vs z $zArea")
  }

  // ---- Cdc.mergePartialAggs ------------------------------------------

  test("incremental agg maintenance: merge of partials equals full recompute") {
    import org.apache.spark.sql.functions._
    val rows = (1L to 300L).map(i => (i, s"g${i % 4}", (i * 7 % 100).toDouble))
      .toDF("id", "grp", "v")
    def partial(df: org.apache.spark.sql.DataFrame) = df.groupBy($"grp")
      .agg(count(lit(1)).as("cnt_n"), sum($"v").as("sum_v"),
        min($"v").as("min_v"), max($"v").as("max_v"))
    // three arbitrary disjoint batches, merged pairwise
    val merged = Cdc.mergePartialAggs(
      Cdc.mergePartialAggs(
        partial(rows.filter($"id" % 3 === 0)),
        partial(rows.filter($"id" % 3 === 1)), Seq("grp")),
      partial(rows.filter($"id" % 3 === 2)), Seq("grp"))
    val full = partial(rows)
    def norm(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => (r.getString(0), r.getLong(1),
        r.getDouble(2), r.getDouble(3), r.getDouble(4))).toSet
    assert(norm(merged) === norm(full))
  }

  test("incremental agg maintenance: non-algebraic measure names are rejected") {
    import org.apache.spark.sql.functions._
    val p = (1L to 10L).toDF("id").groupBy($"id")
      .agg(avg($"id").as("avg_v"))
    val e = intercept[IllegalArgumentException] {
      Cdc.mergePartialAggs(p, p, Seq("id"))
    }
    assert(e.getMessage.contains("avg_v"))
  }
}
