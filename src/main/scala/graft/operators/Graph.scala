package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Distributed graph analytics on edge lists — the iterate-by-join
  * pattern (one key shuffle per iteration) that scales PageRank-style
  * algorithms to edge sets far beyond one machine, without any graph
  * library: the edge relation is partitioned by source, the rank
  * relation by node, and each iteration is a co-partitioned join +
  * aggregation Catalyst plans like any other query.
  *
  * All rank arithmetic is FIXED-POINT INTEGER (`scale` units = rank
  * 1.0): contributions are `rank div out_degree` and the damping step
  * is `(85 * sum) div 100` — BIGINT divisions every engine truncates
  * identically, so after any number of iterations the ranks are
  * bit-equal on Spark and the DuckDB oracle (float summation order,
  * the usual iterative-algorithm hazard, never enters). The deliberate
  * mass leak of truncating division is identical on both sides.
  */
object Graph {

  /** PageRank after `iters` synchronous iterations over a directed
    * edge list (`src`, `dst`), damping 0.85, teleport mass distributed
    * uniformly. Requires every node to appear as a source (no dangling
    * nodes) — true by construction for bipartite graphs materialized
    * in both directions, the shape [[graft.queries.AdvancedOps]]
    * builds. Output: (node, r) with r in fixed-point `scale` units.
    *
    * Scale posture: `edges ⋈ deg` is computed once, hash-partitioned
    * on `src`, and cached; each iteration shuffles only the (node,
    * rank) relation — |V| rows, not |E| — into that partitioning,
    * aggregates contributions map-side, and emits the next rank
    * relation. The driver sees one scalar (|V|); rank state never
    * leaves the cluster.
    */
  def pageRank(edges: DataFrame, iters: Int,
      scale: Long = 1000000000000L): DataFrame = {
    // ONE pass over the upstream edge build (r13): the out-degree is a
    // COUNT OVER the src-keyed window on the already-repartitioned
    // edge relation, so `ed` — the relation every iteration joins — is
    // built and cached in a single edge evaluation. The previous shape
    // cached deg and ed separately, and because cache population
    // happens per JOB, the expensive upstream build (for the gate's
    // an15: orders ⋈ lineitem + distinct) ran TWICE per run — measured
    // as two ~16 s-of-task-time stage groups in the Profile trace.
    // deg (|V| rows, referenced by the node count, the full node set,
    // and the initial ranks) now derives FROM the cached ed with a
    // co-partitioned aggregate — no extra shuffle, no re-build.
    val ed = edges.repartition(col("src"))
      .withColumn("deg", count(lit(1)).over(
        org.apache.spark.sql.expressions.Window.partitionBy(col("src"))))
      .cache()
    val deg = ed.groupBy("src").agg(min(col("deg")).as("deg")).cache()
    val n = deg.count() // one driver scalar, like any COUNT(*)
    val init = scale / n
    val teleport = (15L * init) / 100L
    val nodes = deg.select(col("src").as("node"))
    var ranks = deg.select(col("src").as("node"), lit(init).as("r"))
    (1 to iters).foreach { i =>
      // name-based using-join: `ranks` is derived from `ed`, so
      // cross-DataFrame column references would be ambiguous self-join
      // attributes; the fresh alias keeps resolution unambiguous
      val contribs = ed.join(ranks.select(col("node").as("src"), col("r")), "src")
        .select(col("dst"), expr("r div deg").as("contrib"))
        .groupBy("dst")
        .agg(sum(col("contrib")).as("s"))
      // next ranks come from the FULL node set, not just receivers: a
      // node with out-edges but no in-edges (legal under the stated
      // contract) would otherwise vanish from `ranks` after one
      // iteration — dropped from the output AND silently withholding
      // its contributions from iteration 2 on. It keeps its teleport
      // share (s = 0) like real PageRank. Both sides arrive hashed on
      // the node key, so the left join adds no extra exchange.
      ranks = nodes
        .join(contribs.select(col("dst").as("node"), col("s")), Seq("node"), "left")
        .select(col("node"),
          (lit(teleport) + expr("(85 * coalesce(s, CAST(0 AS BIGINT))) div 100")).as("r"))
      // Truncate lineage every 3 rounds (the dupClusters pattern,
      // Dedup.scala): without it the plan nests one join+agg per
      // iteration, so analysis/codegen cost grows with `iters` and
      // real PageRank iteration counts (20-50) die in the optimizer
      // long before any executor works. The checkpoint materializes
      // |V| rows — the same rows the next shuffle moves anyway.
      if (i % 3 == 0 && i < iters) ranks = ranks.localCheckpoint()
    }
    // eager-materialize the result BEFORE releasing the cached edge
    // relation: the tail iterations are still lazy plans over `ed`,
    // and a session-lifetime |E|-sized cache leak evicts everyone else
    val out = ranks.localCheckpoint()
    ed.unpersist(blocking = false)
    deg.unpersist(blocking = false)
    out
  }

  /** Minimum-hop BFS distances from a seed set, capped at `maxHops` —
    * the k-hop neighborhood-expansion primitive ("which suppliers are
    * within 3 trades of these customers", interaction-graph features,
    * blast-radius audits). `seeds`: (node); `edges`: (src, dst).
    * Output: (node, dist), dist = fewest hops from any seed, reached
    * nodes only.
    *
    * Frontier BFS as iterate-by-join: `dist` holds the best-known
    * (node, dist); hop h expands ONLY nodes whose minimum distance is
    * h−1 — after the min-fold, a node sits at its discovery hop, so
    * every node is expanded exactly once across the whole run — joins
    * them against the src-partitioned cached edge relation, and folds
    * the discovered candidates back with a min-aggregate. State is
    * |reached| rows, never paths: total work is Σ frontier-degree ≤
    * |E| — the BFS bound — where a naive transitive closure pays the
    * path-count blowup (deg^k). Each hop shuffles only the dist
    * relation; the oracle replays the same fixpoint as a recursive CTE
    * with UNION-dedup semantics plus a final min-group. */
  def kHopReach(edges: DataFrame, seeds: DataFrame, maxHops: Int): DataFrame = {
    require(maxHops >= 0, s"kHopReach: maxHops must be >= 0, got $maxHops")
    val ed = edges.repartition(col("src")).cache()
    // checkpoint the seed distances (|seeds| rows — bounded): the dist
    // lineage references them once per hop branch, and when the caller
    // derives seeds from the same expensive edge build (an30), the
    // un-materialized form re-ran that build inside the loop (r13)
    var dist = seeds.select(col("node"), lit(0L).as("dist")).distinct()
      .localCheckpoint()
    (1 to maxHops).foreach { h =>
      val frontier = dist.filter(col("dist") === (h - 1))
        .select(col("node").as("src"))
        .join(ed, "src")
        .select(col("dst").as("node"), lit(h.toLong).as("dist"))
        .distinct()
      dist = dist.unionByName(frontier)
        .groupBy(col("node")).agg(min(col("dist")).as("dist"))
      // pageRank's lineage-truncation cadence: one join+agg layer per
      // hop otherwise stacks into optimizer-killing plan depth
      if (h % 3 == 0 && h < maxHops) dist = dist.localCheckpoint()
    }
    val out = dist.localCheckpoint()
    ed.unpersist(blocking = false)
    out
  }

  /** Connected components by ALTERNATING STAR CONTRACTION — the
    * two-round large-star / small-star scheme of Kiveris et al.,
    * "Connected Components in MapReduce and Beyond" (SoCC 2014). This
    * is the adversarial-diameter complement to
    * [[graft.operators.Dedup.dupClusters]]' min-label propagation:
    * propagation pays one shuffle round per hop of graph diameter (a
    * 10,000-link chain = ~10,000 rounds), star contraction halves
    * chain structure every alternation and converges in O(log²)
    * rounds on ANY topology — the right primitive when components can
    * be long paths (URL redirect chains, citation chains, linked-page
    * graphs), not the tiny cliques near-dup graphs produce.
    *
    *  - large-star(u): every neighbor v > u re-attaches to
    *    m = min(Γ(u) ∪ u);
    *  - small-star(u): orient edges toward the larger endpoint; every
    *    smaller neighbor (and u itself) re-attaches to the minimum.
    *
    * Both operations are ONE groupBy + ONE join over the edge list —
    * no windows, no driver state; edge weights only ever decrease, so
    * the (count, hash-sum) fingerprint is a sound fixpoint test (the
    * d6 label-sum discipline). At convergence every component is a
    * star centered on its minimum node: labels read off as
    * min(self, neighbors). Nodes compare with their column's own
    * ordering — string keys work, ids are never cast.
    *
    * Scale posture: shuffles are sized to the GRAPH (dupClusters'
    * repartition discipline: ~1M edges/partition, never corpus
    * parallelism); each round moves only the current edge relation,
    * which contraction SHRINKS round over round. localCheckpoint per
    * round bounds lineage. Output: (node, component), component = the
    * component's minimum node id.
    *
    * Input `pairs`: (src, dst) — undirected, duplicates and self-loops
    * tolerated. Ids must be non-null. */
  def connectedComponents(pairs: DataFrame, maxRounds: Int = 25): DataFrame = {
    val pIn = pairs.select(col("src").as("a"), col("dst").as("b"))
    val p0 = pIn.filter(col("a") =!= col("b")).distinct().localCheckpoint()
    val nEdges = p0.count()
    val sess = p0.sparkSession
    val sessParts = sess.conf.get("spark.sql.shuffle.partitions", "200").toInt
    val nParts = math.max(1L,
      math.min(sessParts.toLong, nEdges / 1000000L + 1L)).toInt
    // nodes captured from the RAW input, before the self-loop filter:
    // a node appearing only as (x, x) is a singleton component and
    // must still get its output row (dupClusters parity) — and star
    // edges at convergence don't mention every input pairing anyway
    val nodes = pIn.select(col("a").as("node"))
      .unionByName(pIn.select(col("b").as("node"))).distinct()
      .localCheckpoint()

    def largeStar(e: DataFrame): DataFrame = {
      val nb = e.unionByName(e.select(col("b").as("a"), col("a").as("b")))
      val m = nb.groupBy(col("a")).agg(min(col("b")).as("mn"))
        .select(col("a"), least(col("a"), col("mn")).as("m"))
      nb.join(m, "a").filter(col("b") > col("a"))
        .select(col("b").as("a"), col("m").as("b"))
        .filter(col("a") =!= col("b")).distinct()
    }
    def smallStar(e: DataFrame): DataFrame = {
      val o = e.select(greatest(col("a"), col("b")).as("c"),
        least(col("a"), col("b")).as("w"))
      val m = o.groupBy(col("c")).agg(min(col("w")).as("m"))
      o.join(m, "c").select(col("w").as("a"), col("m").as("b"))
        .unionByName(m.select(col("c").as("a"), col("m").as("b")))
        .filter(col("a") =!= col("b")).distinct()
    }
    def fingerprint(e: DataFrame): (Long, java.math.BigDecimal) = {
      val r = e.agg(count(lit(1)),
        sum(xxhash64(col("a"), col("b")).cast("decimal(38,0)"))).head()
      (r.getLong(0), r.getDecimal(1))
    }

    var e = p0.repartition(nParts, col("a"))
    var prev = (-1L, null.asInstanceOf[java.math.BigDecimal])
    var r = 0
    var done = false
    while (!done && r < maxRounds) {
      // ONE alternation per checkpoint: stacking two alternations per
      // barrier (the dupClusters double-propagation trick) was
      // measured 2× SLOWER here (r13: 4.5 → 9.3 s median at sf0.1) —
      // each star operator references its input relation several
      // times (e ∪ swap, nb ⋈ m), so un-materialized composition
      // multiplies subplan evaluation roughly 4× per extra layer,
      // which costs far more than the barrier it saves. Propagation
      // (dupClusters) composes linearly and wins from the trick;
      // contraction does not.
      e = smallStar(largeStar(e)).repartition(nParts, col("a")).localCheckpoint()
      val fp = fingerprint(e)
      done = fp._1 == prev._1 && fp._2 == prev._2
      prev = fp
      r += 1
    }
    // CONVERGENCE CONTRACT (r10): a loop that exits at the round cap
    // without the fingerprint fixpoint has NOT computed connected
    // components — labels from a non-converged edge set silently split
    // components. An exactness-everywhere engine fails loudly instead;
    // the measured curves (SCALING.md: <=12 rounds on 4096-link
    // chains, O(log^2) by Kiveris et al.) make the default cap
    // generous for any realistic topology, so tripping this means the
    // caller should raise maxRounds, not that the algorithm stalled.
    if (!done) throw new IllegalStateException(
      s"connectedComponents did not reach the star fixpoint in $maxRounds rounds " +
        s"(${nEdges} input edges) — raise maxRounds")
    // at the fixpoint E is a union of stars: component = min over
    // self ∪ neighbors (centers have only larger neighbors → self)
    val nb = e.unionByName(e.select(col("b").as("a"), col("a").as("b")))
      .groupBy(col("a")).agg(min(col("b")).as("mn"))
    nodes.join(nb.select(col("a").as("node"), col("mn")), Seq("node"), "left")
      .select(col("node"),
        least(col("node"), coalesce(col("mn"), col("node"))).as("component"))
  }
}
