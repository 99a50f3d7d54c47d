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
    // deg is |V| rows — bounded — and referenced EVERYWHERE: the node
    // count, the edge co-partition, the full node set each iteration,
    // the initial ranks, and (when small) a broadcast per iteration.
    // Uncached, every one of those re-runs the whole upstream edge
    // build — for the gate's an15 that is orders ⋈ lineitem +
    // distinct repeated ~6× per run (visible as six identical
    // scan/agg stage groups in the Profile trace; the cache removes
    // all but the first).
    val deg = edges.groupBy("src").agg(count(lit(1)).as("deg")).cache()
    val n = deg.count() // one driver scalar, like any COUNT(*)
    val init = scale / n
    val teleport = (15L * init) / 100L
    val ed = edges.join(deg, "src").repartition(col("src")).cache()
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
    var dist = seeds.select(col("node"), lit(0L).as("dist")).distinct()
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
}
