package graft.queries

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark
import graft.operators.Graph

/** PageRank, SCD2, funnel, boilerplate strip, rolling features. */
class AdvancedOpsSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private val sf = "/root/testdata/sf0.001"

  // ---- PageRank ------------------------------------------------------

  test("pageRank: symmetric 2-cycle is the stable uniform ranking") {
    val edges = Seq((0L, 1L), (1L, 0L)).toDF("src", "dst")
    val r = Graph.pageRank(edges, iters = 3).collect()
      .map(x => x.getLong(0) -> x.getLong(1)).toMap
    // init = 1e12/2; contrib = full rank (deg 1); damped back to exactly
    // teleport + 0.85 * 5e11 = 5e11 each round — the fixpoint
    assert(r === Map(0L -> 500000000000L, 1L -> 500000000000L))
  }

  test("pageRank: star graph matches the hand-computed fixed-point arithmetic") {
    val e0 = Seq((0L, 1L), (0L, 2L), (0L, 3L)).toDF("src", "dst")
    val edges = e0.unionByName(e0.select($"dst".as("src"), $"src".as("dst")))
    val r = Graph.pageRank(edges, iters = 1).collect()
      .map(x => x.getLong(0) -> x.getLong(1)).toMap
    // N=4, init=250000000000, teleport=(15*init)/100=37500000000
    // center: 3 leaves contribute init each -> tp + 85*750e9/100
    assert(r(0L) === 37500000000L + 85L * 750000000000L / 100L)
    // leaf: center contributes init/3 (truncated)
    val leaf = 37500000000L + 85L * (250000000000L / 3L) / 100L
    assert(r(1L) === leaf && r(2L) === leaf && r(3L) === leaf)
  }

  test("pageRank: 20-iteration depth converges to the 2-cycle fixpoint (lineage truncated)") {
    // real iteration counts are the operator contract (the r4 verdict's
    // latent hazard): without the per-3-rounds localCheckpoint this
    // nests 20 join+agg layers and dies in the optimizer, not the
    // executors. The 2-cycle is a per-round fixpoint, so depth cannot
    // change the answer — determinism AND completion are the assertion.
    val edges = Seq((0L, 1L), (1L, 0L)).toDF("src", "dst")
    val r = Graph.pageRank(edges, iters = 20).collect()
      .map(x => x.getLong(0) -> x.getLong(1)).toMap
    assert(r === Map(0L -> 500000000000L, 1L -> 500000000000L))
  }

  // ---- k-hop BFS -----------------------------------------------------

  test("kHopReach: path graph — distances count hops, beyond-horizon nodes absent") {
    val edges = Seq((0L, 1L), (1L, 2L), (2L, 3L), (3L, 4L)).toDF("src", "dst")
    val seeds = Seq(0L).toDF("node")
    val d = Graph.kHopReach(edges, seeds, maxHops = 3).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(d === Map(0L -> 0L, 1L -> 1L, 2L -> 2L, 3L -> 3L), s"got $d")
  }

  test("kHopReach: min distance wins when paths of different lengths reach a node") {
    // 0→1→2 (two hops) and 0→2 (one hop): the fold must keep 1
    val edges = Seq((0L, 1L), (1L, 2L), (0L, 2L)).toDF("src", "dst")
    val d = Graph.kHopReach(edges, Seq(0L).toDF("node"), maxHops = 3)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(d === Map(0L -> 0L, 1L -> 1L, 2L -> 1L))
  }

  test("kHopReach: cycles don't inflate distances or loop state") {
    val edges = Seq((0L, 1L), (1L, 0L)).toDF("src", "dst")
    val d = Graph.kHopReach(edges, Seq(0L).toDF("node"), maxHops = 5)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(d === Map(0L -> 0L, 1L -> 1L))
  }

  test("kHopReach: multiple seeds take the nearest, and hop 4+ stays truncated (lineage checkpoint)") {
    val edges = (0L until 8L).map(i => (i, i + 1)).toDF("src", "dst")
    val d = Graph.kHopReach(edges, Seq(0L, 6L).toDF("node"), maxHops = 8)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    // node 7/8 are 1/2 hops from seed 6, not 7/8 hops from seed 0
    assert(d(7L) === 1L && d(8L) === 2L && d(5L) === 5L && d.size === 9)
  }

  test("pageRank: a source-only node keeps its teleport rank and its contributions") {
    // c has out-edges but no in-edges — legal under the operator
    // contract (every node appears as a source). The receiver-only
    // iteration used to drop c from `ranks` after round 1: missing
    // from the output AND withholding its mass from round 2 on.
    val edges = Seq((0L, 1L), (1L, 0L), (2L, 0L)).toDF("src", "dst")
    val r = Graph.pageRank(edges, iters = 3).collect()
      .map(x => x.getLong(0) -> x.getLong(1)).toMap
    assert(r.keySet === Set(0L, 1L, 2L), s"node set $r")
    // N=3, init=333333333333, teleport=(15*init)/100
    val tp = 15L * (1000000000000L / 3L) / 100L
    assert(r(2L) === tp, s"source-only node must sit at teleport rank, got ${r(2L)}")
    // node 0 receives from BOTH 1 and 2 every round; with c dropped it
    // would receive only 1's mass — strictly less than this
    val it1_0 = tp + 85L * (333333333333L + 333333333333L) / 100L
    val it1_1 = tp + 85L * 333333333333L / 100L
    val it2_0 = tp + 85L * (it1_1 + tp) / 100L
    val it3_0 = tp + 85L * ((tp + 85L * (it1_0) / 100L) + tp) / 100L
    assert(r(0L) === it3_0, s"expected $it3_0 got ${r(0L)}")
  }

  test("pageRank: rank mass is conserved up to truncation leak") {
    val df = AdvancedOps.an15PageRank(spark, sf)
    val total = df.agg(sum($"rank")).as[Long].head()
    // truncating divisions only ever LOSE mass: total <= scale, and the
    // per-division loss (< 1 unit each) keeps the leak tiny
    assert(total <= 1000000000000L && total > 990000000000L, s"mass $total")
    // bipartite node ids: even = customer, odd = supplier
    val kinds = df.select($"node" % 2 === 0, $"kind" === "customer")
      .as[(Boolean, Boolean)].collect()
    assert(kinds.forall { case (even, cust) => even === cust })
  }

  // ---- SCD Type 2 ----------------------------------------------------

  test("scd2: versions are consecutive, intervals contiguous, one open row per user") {
    val rows = AdvancedOps.u7Scd2(spark, sf)
      .select($"user_id", $"tier", $"valid_from", $"valid_to", $"version",
        $"is_current")
      .as[(Long, Long, Long, Option[Long], Long, Boolean)]
      .collect().groupBy(_._1)
    assert(rows.nonEmpty)
    rows.foreach { case (_, vs) =>
      val sorted = vs.sortBy(_._5)
      assert(sorted.map(_._5).toSeq === (1L to sorted.length).toSeq)
      sorted.sliding(2).foreach {
        case Array(a, b) =>
          assert(a._4.contains(b._3)) // valid_to == next valid_from
          assert(a._2 !== b._2)       // only CHANGES open versions
        case _ =>
      }
      assert(sorted.count(_._6) === 1 && sorted.last._6) // one open row
      assert(sorted.last._4.isEmpty)
    }
  }

  // ---- funnel --------------------------------------------------------

  test("funnel: single-shuffle sequence scan == three-step min-join formulation") {
    val ev = graft.Tables.load(spark, sf, "events")
      .filter($"event_type".isin("view", "click", "purchase"))
      .select($"user_id", unix_micros($"ts").as("tus"), $"event_type")
      .cache()
    val v = ev.filter($"event_type" === "view")
      .groupBy($"user_id").agg(min($"tus").as("tv"))
    val c = ev.filter($"event_type" === "click").join(v, "user_id")
      .filter($"tus" > $"tv").groupBy($"user_id").agg(min($"tus").as("tc"))
    val p = ev.filter($"event_type" === "purchase").join(c, "user_id")
      .filter($"tus" > $"tc").groupBy($"user_id").agg(min($"tus").as("tp"))
    val expected = (
      ev.select($"user_id").distinct().count(),
      v.count(), c.count(), p.count(),
      p.join(v, "user_id").agg(coalesce(sum($"tp" - $"tv"), lit(0L)))
        .as[Long].head())
    val got = AdvancedOps.e8Funnel(spark, sf)
      .as[(Long, Long, Long, Long, Long)].head()
    assert(got === expected)
    ev.unpersist()
  }

  // ---- boilerplate strip ---------------------------------------------

  test("boilerplate strip: exactly the planted docs are stripped, and stripping restores the original text") {
    val docs = graft.Tables.load(spark, sf, "documents")
      .select($"doc_id", $"text")
    val out = AdvancedOps.t14BoilerplateStrip(spark, sf)
      .join(docs, "doc_id")
      .select($"doc_id", $"stripped", $"text_clean" === $"text",
        $"n_words" - $"n_words_clean")
      .as[(Long, Boolean, Boolean, Long)].collect()
    assert(out.nonEmpty)
    out.foreach { case (id, stripped, restores, delta) =>
      assert(stripped === (id % 3 === 0), s"doc $id")
      if (stripped) { assert(restores && delta === 5L, s"doc $id") }
      else assert(delta === 0L, s"doc $id")
    }
  }

  // ---- cohort retention ----------------------------------------------

  test("cohort retention: week-0 activity equals cohort size, later weeks never exceed it") {
    val rows = AdvancedOps.an16CohortRetention(spark, sf)
      .as[(Long, Long, Long, Long)].collect()
    assert(rows.nonEmpty)
    rows.foreach { case (cw, k, active, cohort) =>
      assert(active <= cohort, s"cohort $cw k=$k")
      if (k === 0L) assert(active === cohort, s"cohort $cw")
    }
    // every user lands in exactly one cohort: sizes sum to the user count
    val users = graft.Tables.load(spark, sf, "events")
      .select($"user_id").distinct().count()
    assert(rows.filter(_._2 === 0L).map(_._4).sum === users)
  }

  // ---- k-means -------------------------------------------------------

  test("kmeans: every point assigned exactly once, to a seed-derived cluster") {
    val out = AdvancedOps.n7Kmeans(spark, sf)
      .as[(Long, Long, Double)].collect()
    val n = graft.Tables.load(spark, sf, "embeddings").count()
    assert(out.length === n)
    assert(out.map(_._1).distinct.length === n)
    assert(out.forall(r => r._2 >= 0 && r._2 < 8))
  }

  test("kmeans single assignment step == brute-force nearest seed") {
    import graft.operators.Clustering
    val points = graft.Tables.load(spark, sf, "embeddings")
      .select($"vec_id", $"embedding".cast("array<double>").as("v"))
    val got = Clustering.lloyd(spark, points, k = 4, iters = 1)
      .select($"vec_id", $"cid").as[(Long, Long)].collect().toMap
    // brute force on the driver over the same seeds and score formula
    val seeds = points.orderBy($"vec_id").limit(4).collect()
      .map(r => r.getSeq[Double](1).toArray).zipWithIndex
    val pts = points.as[(Long, Seq[Double])].collect()
    pts.foreach { case (id, vs) =>
      val v = vs.toArray
      val best = seeds.map { case (c, i) =>
        val cc = c.zip(c).map { case (a, b) => a * b }.sum
        val xc = v.zip(c).map { case (a, b) => a * b }.sum
        (BigDecimal(cc - 2 * xc).setScale(6, BigDecimal.RoundingMode.HALF_UP), i)
      }.min
      assert(got(id) === best._2.toLong, s"vec $id")
    }
  }

  test("kmeans is invariant to input partitioning") {
    import graft.operators.Clustering
    val points = graft.Tables.load(spark, sf, "embeddings")
      .select($"vec_id", $"embedding".cast("array<double>").as("v"))
    val a = Clustering.lloyd(spark, points, k = 8, iters = 2)
      .select($"vec_id", $"cid", $"score").as[(Long, Long, Double)].collect().sortBy(_._1)
    val b = Clustering.lloyd(spark, points.repartition(13), k = 8, iters = 2)
      .select($"vec_id", $"cid", $"score").as[(Long, Long, Double)].collect().sortBy(_._1)
    assert(a.toSeq === b.toSeq)
  }

  // ---- rolling features ----------------------------------------------

  test("rolling 1h features == the quadratic self-join definition") {
    val ev = graft.Tables.load(spark, sf, "events")
      .select($"event_id", $"user_id", unix_micros($"ts").as("tus"),
        floor($"value" * 100).cast("long").as("vc"))
      .cache()
    val other = ev.select($"user_id", $"tus".as("tus2"), $"vc".as("vc2"))
    val expected = ev.join(other, "user_id")
      .filter($"tus2" <= $"tus" && $"tus2" >= $"tus" - 3600000000L)
      .groupBy($"event_id")
      .agg(count(lit(1)).as("cnt_1h"), sum($"vc2").as("sum_vc_1h"))
    val got = AdvancedOps.e9Rolling(spark, sf)
      .select($"event_id", $"cnt_1h", $"sum_vc_1h")
    assert(got.exceptAll(expected.select($"event_id", $"cnt_1h", $"sum_vc_1h"))
      .count() === 0)
    assert(got.count() === expected.count())
    ev.unpersist()
  }

  test("j9: as-of PIT lookup equals the naive interval join over SCD2") {
    import org.apache.spark.sql.functions._
    val sf = "/root/testdata/sf0.001"
    val dim = AdvancedOps.u7Scd2(spark, sf)
      .select($"user_id", $"tier", $"valid_from", $"valid_to")
    val facts = graft.Tables.load(spark, sf, "events")
      .filter($"event_type" === "purchase")
      .select($"event_id", $"user_id", unix_micros($"ts").as("tus"))
    val naive = facts.as("f").join(dim.as("d"),
        $"f.user_id" === $"d.user_id" && $"d.valid_from" <= $"f.tus" &&
          ($"d.valid_to".isNull || $"f.tus" < $"d.valid_to"))
      .select($"event_id", $"f.user_id", $"tier".as("tier_at"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    val asOf = AdvancedOps.j9PitLookup(spark, sf)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(asOf === naive)
    // versions partition each user's timeline: exactly one match per fact
    assert(asOf.size === facts.count())
  }

  test("an24: session paths cover all sessions with at most 4 steps each") {
    import org.apache.spark.sql.functions._
    val sf = "/root/testdata/sf0.001"
    val out = AdvancedOps.an24SessionPaths(spark, sf).collect()
    assert(out.length <= 10)
    out.foreach { r =>
      assert(r.getString(0).split(">").length <= 4)
      assert(r.getLong(1) >= 1L)
    }
    // top-10 ordering is (n desc, path asc)
    val pairs = out.map(r => (r.getLong(1), r.getString(0)))
    assert(pairs.sortBy { case (n, p) => (-n, p) }.toSeq === pairs.toSeq)
  }

  // ---- Graph.connectedComponents (d16: alternating star contraction) --

  test("connectedComponents: long chain collapses to its min in logarithmic rounds") {
    import spark.implicits._
    // a 200-link chain is the min-label worst case (~100 propagation
    // rounds); star contraction must finish inside 12 alternations
    val edges = (0L until 200L).map(i => (i, i + 1)).toDF("src", "dst")
    val out = Graph.connectedComponents(edges, maxRounds = 12).collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    assert(out.length === 201)
    assert(out.forall(_._2 === 0L), s"non-root labels: ${out.filterNot(_._2 == 0L).take(5).toSeq}")
  }

  test("connectedComponents fails LOUDLY at the round cap instead of returning split components (r10 contract)") {
    import spark.implicits._
    // a 64-link chain cannot reach the star fixpoint in 2 alternations:
    // pre-r10 the loop returned the truncated (wrong) labels silently —
    // the caller could not tell a converged result from a partial one
    val edges = (0L until 64L).map(i => (i, i + 1)).toDF("src", "dst")
    val e = intercept[IllegalStateException] {
      Graph.connectedComponents(edges, maxRounds = 2)
    }
    assert(e.getMessage.contains("fixpoint") && e.getMessage.contains("maxRounds"))
    // and the same graph under a sufficient cap converges fine
    val ok = Graph.connectedComponents(edges, maxRounds = 12).collect()
    assert(ok.length === 65 && ok.forall(_.getLong(1) === 0L))
  }

  test("dupClusters fails LOUDLY when maxIter is too small for the graph diameter (r10 contract)") {
    import spark.implicits._
    // a 64-link chain needs ~32 double-propagation rounds; 3 must trip
    // the convergence contract, and the message routes the caller to
    // the star-contraction operator built for path-shaped graphs
    val pairs = (0L until 64L).map(i => (i, i + 1)).toDF("d1", "d2")
    val e = intercept[IllegalStateException] {
      graft.operators.Dedup.dupClusters(pairs, maxIter = 3)
    }
    assert(e.getMessage.contains("converge") &&
      e.getMessage.contains("connectedComponents"))
  }

  test("connectedComponents: multiple components, duplicate and self-loop edges tolerated") {
    import spark.implicits._
    val edges = Seq(
      (5L, 9L), (9L, 5L), (9L, 9L),        // pair w/ dup + self-loop
      (20L, 21L), (21L, 22L), (22L, 20L),  // triangle
      (40L, 41L),                          // isolated pair
      (77L, 77L)                           // self-loop-ONLY node: singleton
    ).toDF("src", "dst")
    val out = Graph.connectedComponents(edges).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toMap
    assert(out === Map(5L -> 5L, 9L -> 5L,
      20L -> 20L, 21L -> 20L, 22L -> 20L, 40L -> 40L, 41L -> 40L,
      77L -> 77L))
  }

  test("connectedComponents agrees with dupClusters on a pseudo-random graph") {
    import spark.implicits._
    // deterministic scatter: 300 edges over ~120 nodes, mixed shapes
    val edges = (1 to 300).map { i =>
      val a = (i * 37) % 120; val b = (i * i * 13 + 7) % 120
      (a.toLong, b.toLong)
    }.filter { case (a, b) => a != b }.toDF("src", "dst")
    val stars = Graph.connectedComponents(edges).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toMap
    val prop = graft.operators.Dedup.dupClusters(
        edges.select($"src".as("d1"), $"dst".as("d2"))).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toMap
    assert(stars === prop)
  }

  test("connectedComponents: string-keyed nodes order lexicographically, never cast") {
    import spark.implicits._
    val edges = Seq(("url-b", "url-a"), ("url-c", "url-b"), ("zz", "yy"))
      .toDF("src", "dst")
    val out = Graph.connectedComponents(edges).collect()
      .map(r => (r.getString(0), r.getString(1))).toMap
    assert(out === Map("url-a" -> "url-a", "url-b" -> "url-a",
      "url-c" -> "url-a", "yy" -> "yy", "zz" -> "yy"))
  }
}
