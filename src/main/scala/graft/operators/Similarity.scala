package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Approximate-nearest-neighbor search over an embedding column
  * (array<float>), for similarity dedup / retrieval over training
  * corpora.
  *
  * - `cosineTopK` is the exact brute-force baseline: broadcast the
  *   (small) query set, score every candidate, per-query top-k via
  *   window. Linear in candidates, no shuffle of the big side beyond
  *   the final top-k — the right shape when queries ≪ candidates.
  * - `ivfTopK` is the scale path: coarse-quantize candidates into
  *   cells (here: the precomputed `label` column or any partitioner),
  *   probe only the nProbe nearest cells per query. At 100 TB the cell
  *   id becomes the partition key, so a probe touches only matching
  *   partitions instead of the full corpus.
  *
  * Scores are computed on doubles with a deterministic left-to-right
  * fold (`aggregate`), rounded to 6 decimals so results are
  * engine-comparable.
  */
object Similarity {

  /** dot(a, b) over array<double> columns, deterministic fold order —
    * the native codegen'd expression (graft.functions.DotProductExpr).
    * Bit-identical to [[dotHof]] (property-pinned in SimilaritySpec);
    * native because the HOF form interprets two lambdas and allocates
    * a zipped array per pair, which dominates the ANN hot path. */
  def dot(a: Column, b: Column): Column =
    graft.functions.DotProduct.dot_product(a, b)

  /** The declarative higher-order formulation of [[dot]], kept as the
    * executable reference the native expression is pinned against. */
  def dotHof(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x * y), lit(0.0), (acc, v) => acc + v)

  def cosine(a: Column, b: Column): Column =
    round(dot(a, b) / (sqrt(dot(a, a)) * sqrt(dot(b, b))), 6)

  /** MMR diversity re-ranking (Carbonell & Goldstein, "The Use of MMR,
    * Diversity-Based Reranking", SIGIR 1998): greedily pick k items
    * maximizing `λ·rel − (1−λ)·max-sim-to-already-picked` — the
    * curation step that keeps a training sample from collapsing onto
    * near-duplicates of the best match.
    *
    * `cands`: (vec_id, v, rel) — a BOUNDED candidate page (a top-k0
    * retrieval result, not a corpus). MMR is inherently sequential in
    * k, so each of the k steps is one tiny job over the candidate
    * page: pairwise round-6 cosines are computed ONCE (k0² rows,
    * bounded by construction), and the driver holds only the picked
    * (id, score) rows — the lloyd-seeds pattern. Scores are EXACT
    * DECIMAL arithmetic over the round-6 rel/sim inputs (λ as a
    * decimal literal), so the greedy argmax — where one ulp flips the
    * entire remaining selection — replays identically on any engine.
    * Output: (pick, vec_id, score), pick = 1..k in selection order. */
  def mmrRerank(cands: DataFrame, k: Int,
      lambda: BigDecimal = BigDecimal("0.7")): DataFrame = {
    val spark = cands.sparkSession
    import spark.implicits._
    val c = cands.select(col("vec_id"), col("v"), col("rel")).cache()
    val sims = c.select(col("vec_id").as("a"), col("v").as("va"))
      .join(c.select(col("vec_id").as("b"), col("v").as("vb")),
        col("a") =!= col("b"))
      .select(col("a"), col("b"), cosine(col("va"), col("vb")).as("sim"))
      .cache()
    sims.count()
    val oneMinus = BigDecimal(1) - lambda
    var selected = Vector.empty[(Int, Long, java.math.BigDecimal)]
    (1 to k).foreach { i =>
      val selIds = selected.map(_._2)
      val base =
        if (selIds.isEmpty) c.withColumn("ms", lit(null).cast("double"))
        else c.filter(!col("vec_id").isin(selIds: _*))
          .join(sims.filter(col("b").isin(selIds: _*))
            .groupBy(col("a")).agg(max(col("sim")).as("ms")),
            col("vec_id") === col("a"), "left")
      val pick = base.select(col("vec_id"),
          (col("rel").cast("decimal(18,6)") * lit(lambda) -
            lit(oneMinus) * coalesce(col("ms"), lit(0.0)).cast("decimal(18,6)"))
            .as("score"))
        .orderBy(col("score").desc, col("vec_id").asc)
        .limit(1).collect()
      if (pick.nonEmpty)
        selected :+= ((i, pick.head.getLong(0), pick.head.getDecimal(1)))
    }
    c.unpersist(blocking = false)
    sims.unpersist(blocking = false)
    selected.map { case (p, id, sc) => (p, id, sc.doubleValue) }
      .toDF("pick", "vec_id", "score")
  }

  /** Exact top-k cosine neighbors for each query vector.
    * Output: (qid, vec_id, cos), k rows per query, ranked by rounded
    * cosine desc then vec_id (fully deterministic). Norms are computed
    * once per row BEFORE the |queries|× fan-out join, not per pair. */
  def cosineTopK(candidates: DataFrame, queries: DataFrame, k: Int): DataFrame = {
    val cand = candidates.select(col("vec_id"), col("embedding").cast("array<double>").as("v"))
      .withColumn("nv", sqrt(dot(col("v"), col("v"))))
    val q = queries.select(col("vec_id").as("qid"), col("embedding").cast("array<double>").as("qv"))
      .withColumn("nq", sqrt(dot(col("qv"), col("qv"))))
    val scored = cand
      .join(broadcast(q), col("vec_id") =!= col("qid"))
      .select(col("qid"), col("vec_id"),
        (round(dot(col("qv"), col("v")) / (col("nq") * col("nv")), 6) + lit(0.0)).as("cos"))
    scored
      .withColumn("rn", row_number().over(
        Window.partitionBy(col("qid")).orderBy(col("cos").desc, col("vec_id").asc)))
      .filter(col("rn") <= k)
      .drop("rn")
  }

  /** Hard-negative mining for contrastive training (the DPR recipe,
    * Karpukhin et al. EMNLP 2020: the best negatives are the top-ranked
    * retrieval results that are NOT gold — random negatives are too
    * easy and the bi-encoder stops learning from them). For each query
    * vector, score the cosine top-`k` candidates (k deep enough to see
    * past the positives), drop every candidate sharing the query's
    * label (the gold/positive class), and keep the `m` highest-ranked
    * survivors — the negatives that look most like positives.
    *
    * Scale shape: rides [[cosineTopK]]'s broadcast-query scoring (the
    * corpus never shuffles; per-partition heaps via the qid window over
    * |queries|·k rows), then joins labels by broadcasting the TINY
    * top-k relation against the candidate table — n19's direction, the
    * one that stays broadcastable at any corpus size. Output:
    * (qid, q_label, neg_id, neg_label, cos, rank), rank 1 = hardest. */
  def hardNegatives(candidates: DataFrame, queries: DataFrame,
      k: Int, m: Int): DataFrame = {
    val topk = cosineTopK(candidates, queries, k)
    val qLabels = queries.select(col("vec_id").as("qid"), col("label").as("q_label"))
    candidates.select(col("vec_id"), col("label").as("neg_label"))
      .join(broadcast(topk), Seq("vec_id"))
      .join(broadcast(qLabels), Seq("qid"))
      .filter(col("neg_label") =!= col("q_label"))
      .withColumn("rank", row_number().over(
        Window.partitionBy(col("qid")).orderBy(col("cos").desc, col("vec_id").asc)))
      .filter(col("rank") <= m)
      .select(col("qid"), col("q_label"), col("vec_id").as("neg_id"),
        col("neg_label"), col("cos"), col("rank"))
  }

  /** Reciprocal-rank fusion (Cormack, Clarke & Büttcher, SIGIR 2009):
    * fuse N already-cut candidate lists — e.g. a BM25 lexical top-k and
    * a dense-cosine top-k, the standard hybrid-retrieval pair — into one
    * ranking by `score(d) = Σ_lists 1/(kRrf + rank_list(d))`. Rank-based
    * fusion needs no score calibration across rankers, which is exactly
    * why RAG stacks reach for it over weighted score sums.
    *
    * Each input must be a BOUNDED candidate list (a top-k retrieval
    * result, k a constant — not a corpus): ranks are recomputed inside,
    * per list, by `(score desc, id)` — a total order over the rounded
    * scores every ranker here emits, so the integer ranks replay
    * engine-exact. The window partitions on the LIST TAG, so ranking is
    * one hash exchange of Σk rows, never a single-partition funnel of
    * anything corpus-sized; per-list contributions are rounded to 6 and
    * summed on DECIMAL(18,6) (the t9 float discipline), and the final
    * cut is a TakeOrderedAndProject. The id column keeps its own type
    * (the t30/t31 contract — no silent long cast).
    *
    * Output: (doc_id, n_lists, rrf), top `topK` by (rrf desc, doc_id). */
  def rrfFuse(lists: Seq[(String, DataFrame)], idCol: String,
      scoreCol: String, kRrf: Int = 60, topK: Int = 20): DataFrame = {
    require(lists.nonEmpty, "rrfFuse: need at least one ranked list")
    val tagged = lists.map { case (tag, df) =>
      df.select(lit(tag).as("src"), col(idCol).as("doc_id"),
        col(scoreCol).cast("double").as("score"))
    }.reduce(_ unionByName _)
    tagged
      .withColumn("rank", row_number().over(
        Window.partitionBy(col("src"))
          .orderBy(col("score").desc, col("doc_id").asc)))
      .withColumn("contrib",
        round(lit(1.0) / (lit(kRrf) + col("rank")), 6).cast("decimal(18,6)"))
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_lists"), sum(col("contrib")).as("s"))
      .select(col("doc_id"), col("n_lists"),
        round(col("s"), 6).cast("double").as("rrf"))
      .orderBy(col("rrf").desc, col("doc_id"))
      .limit(topK)
  }

  /** Embedding-cosine near-duplicate pairs: all (v1 < v2) pairs within
    * the same block whose cosine ≥ threshold. Blocking (a cluster id, a
    * coarse LSH cell, a source partition) is what keeps the pair space
    * linear-ish — the unblocked form is O(n²) and intentionally not
    * offered. */
  def nearDupPairs(emb: DataFrame, blockCol: String, threshold: Double): DataFrame = {
    // norms once per ROW before the pair join (sqrt(dot(v,v)) is the
    // same double whether computed before or per pair — only the
    // per-pair recomputation goes away)
    val e = emb.select(col("vec_id"), col(blockCol).as("blk"),
        col("embedding").cast("array<double>").as("v"))
      .withColumn("nv", sqrt(dot(col("v"), col("v"))))
    val a = e.select(col("blk"), col("vec_id").as("v1"), col("v").as("va"), col("nv").as("na"))
    val b = e.select(col("blk"), col("vec_id").as("v2"), col("v").as("vb"), col("nv").as("nb"))
    a.join(b, Seq("blk")).filter(col("v1") < col("v2"))
      .select(col("v1"), col("v2"),
        (round(dot(col("va"), col("vb")) / (col("na") * col("nb")), 6) + lit(0.0)).as("cos"))
      .filter(col("cos") >= threshold)
  }

  /** Exact per-cell centroids in long format (cell, pos, c): the
    * element-wise mean is summed on DECIMAL(28,10) — associative-exact,
    * so the result is bit-stable under any partitioning/AQE re-plan —
    * then divided and rounded to 6 decimals. Embedding floats are
    * dyadic rationals, so the double→decimal cast can never hit a
    * round-half tie and every engine rounds identically: the centroid
    * build is oracle-checkable and idempotent at any scale. */
  def centroidsExact(emb: DataFrame, cellCol: String): DataFrame =
    emb.select(col(cellCol).as("cell"),
        posexplode(col("embedding").cast("array<double>")).as(Seq("pos", "x")))
      .groupBy("cell", "pos")
      .agg(round(sum(col("x").cast("decimal(28,10)")).cast("double") / count(lit(1)), 6)
        .as("c"))

  /** [[centroidsExact]] re-assembled to one array<double> per cell. */
  def centroidVectors(emb: DataFrame, cellCol: String): DataFrame =
    centroidsExact(emb, cellCol)
      .groupBy("cell")
      .agg(array_sort(collect_list(struct(col("pos"), col("c")))).as("pm"))
      .select(col("cell"), expr("transform(pm, p -> p.c)").as("cv"))

  // ---- signed-random-projection (hyperplane) LSH --------------------

  /** Deterministic hyperplane matrix for signed-random-projection LSH:
    * `nBits` planes × `dim` integer components in [-1000, 1000], each
    * derived from md5("lsh:&lt;plane&gt;:&lt;dim&gt;") — any engine (and the
    * DuckDB oracle) rebuilds the identical matrix from the same seed
    * strings. Integer components (not floats) keep the projection
    * arithmetic exact. */
  def hyperplanes(nBits: Int, dim: Int): Array[Array[Long]] =
    Array.tabulate(nBits) { j =>
      Array.tabulate(dim) { i =>
        val d = java.security.MessageDigest.getInstance("MD5")
          .digest(s"lsh:$j:$i".getBytes("UTF-8"))
        val hex = d.take(4).map("%02x".format(_)).mkString
        java.lang.Long.parseLong(hex, 16) % 2001L - 1000L
      }
    }

  /** SRP bucket id of an array&lt;double&gt; column: bit j = sign of the
    * projection onto plane j. Elements are quantized to
    * `floor(x·2^20)` first — an EXACT double op (a float's 24-bit
    * mantissa merely shifts exponent), after which every product
    * (≤2^34) and the 64-term sum (≤2^40) is an integer exactly
    * representable in a double: the projection is order-free and
    * SIMD-proof without decimal arithmetic, so a sign can never flip
    * from float summation order (the one hazard that would make an
    * LSH bucket engine- or partitioning-dependent). The projections
    * run through the codegen'd native [[dot]] — the r3 DECIMAL
    * aggregate-HOF form computed the same order-free sign ~50× slower
    * (interpreted lambda + BigDecimal per element). Pure per-row
    * expression work: the planes ride along as literals, no join, no
    * shuffle. */
  def srpBucket(vcol: String, planes: Array[Array[Long]]): Column = {
    val vq = expr(s"transform($vcol, x -> CAST(floor(x * 1048576.0) AS DOUBLE))")
    planes.zipWithIndex.map { case (ks, j) =>
      val plane = array(ks.map(k => lit(k.toDouble)): _*)
      when(dot(vq, plane) >= 0, lit(1L << j)).otherwise(lit(0L))
    }.reduce(_ + _)
  }

  /** LSH-bucketed ANN — the shuffle-free-index scale path next to IVF:
    * candidates hash to one SRP bucket each (per-row expressions, no
    * index-build shuffle at all, unlike IVF's centroid pass); each
    * query probes its own bucket plus the `nBits` hamming-1 flips
    * (multi-probe — recall without a bigger candidate join). Exact
    * cosine rerank inside the probed buckets, deterministic top-k.
    * At 100 TB the bucket id is the partition key: a query touches
    * nBits+1 partitions, never the corpus. */
  def lshTopK(candidates: DataFrame, queries: DataFrame, dim: Int,
      nBits: Int = 6, k: Int = 10): DataFrame = {
    val planes = hyperplanes(nBits, dim)
    val cand = candidates.select(col("vec_id"),
        col("embedding").cast("array<double>").as("v"))
      .withColumn("nv", sqrt(dot(col("v"), col("v"))))
      .withColumn("bucket", srpBucket("v", planes))
    val probes = queries.select(col("vec_id").as("qid"),
        col("embedding").cast("array<double>").as("qv"))
      .withColumn("nq", sqrt(dot(col("qv"), col("qv"))))
      .withColumn("qb", srpBucket("qv", planes))
      .select(col("qid"), col("qv"), col("nq"), explode(expr(
        s"array_union(array(qb), transform(sequence(0, ${nBits - 1}), " +
          "j -> qb ^ shiftleft(CAST(1 AS BIGINT), j)))")).as("bucket"))
    cand.join(broadcast(probes), Seq("bucket"))
      .filter(col("vec_id") =!= col("qid"))
      .select(col("qid"), col("vec_id"),
        (round(dot(col("qv"), col("v")) / (col("nq") * col("nv")), 6) + lit(0.0)).as("cos"))
      .withColumn("rn", row_number().over(
        Window.partitionBy(col("qid")).orderBy(col("cos").desc, col("vec_id").asc)))
      .filter(col("rn") <= k)
      .drop("rn")
  }

  /** IVF-style ANN: mean centroid per cell (from `cellCol`), probe the
    * nProbe nearest cells per query, exact rank within probed cells.
    * Centroids come from [[centroidsExact]], so cell probing — and
    * therefore the whole result — is deterministic and oracle-checked
    * (rounded cosine rank with explicit cell/vec_id tie-breaks). */
  def ivfTopK(candidates: DataFrame, queries: DataFrame, cellCol: String,
      k: Int, nProbe: Int = 2): DataFrame = {
    // norms once per candidate/query row, NOT per scored pair — same
    // doubles (sqrt(dot(v,v)) is position-independent), |pairs|/|rows|
    // fewer dot products
    val cand = candidates.select(col("vec_id"), col(cellCol).as("cell"),
        col("embedding").cast("array<double>").as("v"))
      .withColumn("nv", sqrt(dot(col("v"), col("v"))))
    val q = queries.select(col("vec_id").as("qid"),
        col("embedding").cast("array<double>").as("qv"))
      .withColumn("nq", sqrt(dot(col("qv"), col("qv"))))

    val centroids = centroidVectors(candidates, cellCol)

    val probes = centroids
      .join(broadcast(q), lit(true))
      .select(col("qid"), col("cell"), col("qv"), col("nq"), cosine(col("qv"), col("cv")).as("ccos"))
      .withColumn("rn", row_number().over(
        Window.partitionBy(col("qid")).orderBy(col("ccos").desc, col("cell").asc)))
      .filter(col("rn") <= nProbe)
      .select(col("qid"), col("cell"), col("qv"), col("nq"))

    cand
      .join(broadcast(probes), Seq("cell"))
      .filter(col("vec_id") =!= col("qid"))
      .select(col("qid"), col("vec_id"),
        (round(dot(col("qv"), col("v")) / (col("nq") * col("nv")), 6) + lit(0.0)).as("cos"))
      .withColumn("rn", row_number().over(
        Window.partitionBy(col("qid")).orderBy(col("cos").desc, col("vec_id").asc)))
      .filter(col("rn") <= k)
      .drop("rn")
  }

  // ---- Johnson–Lindenstrauss random projection ----------------------

  /** Deterministic JL projection matrix — `kDim` rows × `dim` integer
    * components in [-1000, 1000] from md5("jl:&lt;row&gt;:&lt;dim&gt;"), the
    * [[hyperplanes]] construction under its own seed family (sharing
    * seeds with SRP-LSH would correlate the two sketches). Dense
    * ±bounded-integer entries are a standard JL distribution
    * (Achlioptas, "Database-friendly random projections", PODS 2001
    * shows even sparse ±1 suffices); integer components keep the
    * projection exact. */
  def jlPlanes(kDim: Int, dim: Int): Array[Array[Long]] =
    Array.tabulate(kDim) { j =>
      Array.tabulate(dim) { i =>
        val d = java.security.MessageDigest.getInstance("MD5")
          .digest(s"jl:$j:$i".getBytes("UTF-8"))
        val hex = d.take(4).map("%02x".format(_)).mkString
        java.lang.Long.parseLong(hex, 16) % 2001L - 1000L
      }
    }

  /** Project an array&lt;double&gt; column to `planes.length` EXACT integer
    * coordinates (as array&lt;double&gt;): elements quantized to
    * `floor(x·2^20)` (exact — see [[srpBucket]]'s analysis), then each
    * coordinate is an integer dot product whose every term (≤ 2^32)
    * and sum (≤ 2^40 at dim 64) is exactly representable in a double —
    * order-free, engine-independent, replayable in ANSI SQL. Pure
    * per-row expression work through the codegen'd [[dot]]; the
    * planes ride along as literals. The 100 TB story: the projected
    * corpus is dim/kDim× smaller, and every downstream exact-cosine
    * rank runs on the sketch — this is the dimensionality-reduction
    * leg of the ANN family (IVF partitions, SRP buckets, PQ encodes,
    * JL shrinks). */
  def jlProject(vcol: String, planes: Array[Array[Long]]): Column = {
    val vq = expr(s"transform($vcol, x -> CAST(floor(x * 1048576.0) AS DOUBLE))")
    array(planes.map { ks =>
      dot(vq, array(ks.map(k => lit(k.toDouble)): _*))
    }: _*)
  }

  /** Exact top-k cosine search in JL-projected space: project both
    * sides with the same deterministic matrix, then [[cosineTopK]]'s
    * broadcast-scored ranking on the kDim-dim sketches. Returns
    * (qid, vec_id, cos) where cos is the PROJECTED-space cosine —
    * an approximation whose quality n14's recall gate measures. */
  def jlTopK(candidates: DataFrame, queries: DataFrame, dim: Int,
      kDim: Int = 16, k: Int = 10): DataFrame = {
    val planes = jlPlanes(kDim, dim)
    val cand = candidates.select(col("vec_id"),
        col("embedding").cast("array<double>").as("fv"))
      .withColumn("v", jlProject("fv", planes))
      .withColumn("nv", sqrt(dot(col("v"), col("v"))))
    val q = queries.select(col("vec_id").as("qid"),
        col("embedding").cast("array<double>").as("fq"))
      .withColumn("qv", jlProject("fq", planes))
      .withColumn("nq", sqrt(dot(col("qv"), col("qv"))))
    cand
      .join(broadcast(q.select(col("qid"), col("qv"), col("nq"))),
        col("vec_id") =!= col("qid"))
      .select(col("qid"), col("vec_id"),
        (round(dot(col("qv"), col("v")) / (col("nq") * col("nv")), 6) + lit(0.0)).as("cos"))
      .withColumn("rn", row_number().over(
        Window.partitionBy(col("qid")).orderBy(col("cos").desc, col("vec_id").asc)))
      .filter(col("rn") <= k)
      .drop("rn")
  }

  /** Sketch-prefilter + exact re-rank — the deployment shape of JL
    * projection: the corpus-sized scoring pass runs ONLY on the
    * dim/kDim× smaller sketches ([[jlTopK]], k0 candidates per
    * query), then exact full-space cosine re-ranks just those k0 rows
    * per query. At 100 TB the full vectors are touched k0·|queries|
    * times instead of |corpus|·|queries| — raw sketch ranking trades
    * too much recall (n14's gate measures it), re-ranking recovers
    * most of it for k0 ≪ |corpus|. Output: (qid, vec_id, cos) with
    * EXACT full-space cosines, k per query. */
  def jlRerankTopK(candidates: DataFrame, queries: DataFrame, dim: Int,
      kDim: Int = 16, k0: Int = 50, k: Int = 10): DataFrame = {
    val pre = jlTopK(candidates, queries, dim, kDim, k0)
      .select(col("qid"), col("vec_id"))
    val cand = candidates.select(col("vec_id"),
        col("embedding").cast("array<double>").as("v"))
      .withColumn("nv", sqrt(dot(col("v"), col("v"))))
    val q = queries.select(col("vec_id").as("qid"),
        col("embedding").cast("array<double>").as("qv"))
      .withColumn("nq", sqrt(dot(col("qv"), col("qv"))))
    pre.join(cand, "vec_id")
      .join(broadcast(q), "qid")
      .select(col("qid"), col("vec_id"),
        (round(dot(col("qv"), col("v")) / (col("nq") * col("nv")), 6) + lit(0.0)).as("cos"))
      .withColumn("rn", row_number().over(
        Window.partitionBy(col("qid")).orderBy(col("cos").desc, col("vec_id").asc)))
      .filter(col("rn") <= k)
      .drop("rn")
  }
}
