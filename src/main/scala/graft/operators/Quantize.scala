package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Symmetric int8 embedding quantization — the storage/bandwidth path
  * for ANN at scale (4x smaller vectors, integer dot products).
  *
  * Quantization uses FLOOR, not round: `q_i = floor(x_i * 127 / m)`
  * with `m = max |x_i|`. floor on a double is the same bit pattern in
  * every engine, while round() ties diverge between Spark (HALF_UP)
  * and DuckDB (rint) — determinism is worth half a ulp of centering.
  * Values are clamped to [-127, 127]: for a full-mantissa m, the
  * double quotient (-m*127)/m can round to just BELOW -127 (≈14% of
  * random doubles), so floor alone would emit -128 — float32-widened
  * embeddings never hit it, but the clamp makes the contract hold for
  * ANY input. An all-zero vector quantizes to all zeros by the m=0
  * guard.
  *
  * Everything is per-row expression work: no shuffle, linear scans,
  * partition-layout independent.
  */
object Quantize {

  /** max |x_i| of an array<double> column (exact — comparison only). */
  def maxAbs(v: Column): Column = array_max(transform(v, x => abs(x)))

  /** Integer dot product of two quantized vectors — exact, order-free
    * (bigint addition is associative), the scoring primitive a
    * quantized ANN serves from. */
  def qdot(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x * y), lit(0L), (acc, x) => acc + x)

  /** Top-k retrieval over QUANTIZED vectors — the scoring path n4's
    * storage format exists for: candidates and queries are both
    * int8-quantized, each pair is scored by the exact integer dot,
    * and ranking de-quantizes by the two scale factors
    * (score ∝ qdot · m_q · m_c; the 1/127² constant can't change an
    * ordering). The integer dots are engine-exact; the rank compares
    * identical doubles, so the whole result is oracle-exact — unlike
    * float-dot brute force, the quantized scorer moves 4× fewer bytes
    * per vector and does integer MACs, which is the point at 100 TB.
    * Output: (qid, vec_id, qd) ranked per query, k rows each. */
  def quantizedTopK(candidates: DataFrame, queries: DataFrame,
      idCol: String, vecCol: String, k: Int = 10): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val c = quantize(candidates, idCol, vecCol)
      .select(col(idCol).as("vec_id"), col("q").as("cq"), col("max_abs").as("mc"))
    val q = quantize(queries, idCol, vecCol)
      .select(col(idCol).as("qid"), col("q").as("qq"), col("max_abs").as("mq"))
    c.join(broadcast(q), col("vec_id") =!= col("qid"))
      .select(col("qid"), col("vec_id"),
        qdot(col("qq"), col("cq")).as("qd"),
        (col("mq") * col("mc")).as("scale"))
      .withColumn("rn", row_number().over(
        Window.partitionBy(col("qid"))
          .orderBy((col("qd") * col("scale")).desc, col("vec_id").asc)))
      .filter(col("rn") <= k)
      .select(col("qid"), col("vec_id"), col("qd"))
  }

  /** BLOCKWISE symmetric int8 quantization (n17) — one scale per
    * `blockDim`-dim block instead of per vector (the bitsandbytes /
    * GGUF-Q8 block layout): a single outlier dimension costs only its
    * own block's resolution, not the whole vector's. Same determinism
    * discipline as [[quantize]] — FLOOR (engine round() ties can't
    * diverge), clamp at -127, all-zero-block guard — and pure per-row
    * expression work: the blocks come from an array transform, never a
    * shuffle. Output: one row per (id, block) with the block scale,
    * quantized values, exact integer self-dot, and the round-6 max
    * reconstruction error. */
  def quantizeBlockwise(emb: DataFrame, idCol: String, vecCol: String,
      blockDim: Int = 16): DataFrame = {
    val v = col(vecCol).cast("array<double>")
    emb
      .select(col(idCol), v.as("__v"))
      // empty-vector guard: sequence(0, -1) DESCENDS in Spark (it would
      // emit bogus blocks 0 and -1 with null stats); an empty embedding
      // contributes zero block rows, matching the oracle's range(0)
      .filter(size(col("__v")) > 0)
      .select(col(idCol), explode(expr(
        s"transform(sequence(0, CAST(ceil(size(__v) / ${blockDim}.0) - 1 AS INT)), " +
          s"b -> struct(CAST(b AS BIGINT) AS block, " +
          s"slice(__v, b * $blockDim + 1, $blockDim) AS bv))"))
        .as("x"))
      .select(col(idCol), col("x.block").as("block"), col("x.bv").as("bv"))
      .withColumn("scale", maxAbs(col("bv")))
      .withColumn("q",
        when(col("scale") === 0.0, transform(col("bv"), _ => lit(0L)))
          .otherwise(transform(col("bv"),
            x => greatest(lit(-127L), floor(x * lit(127.0) / col("scale")).cast("long")))))
      .withColumn("qdot",
        aggregate(zip_with(col("q"), col("q"), (a, b) => a * b),
          lit(0L), (acc, x) => acc + x))
      .withColumn("err",
        when(col("scale") === 0.0, lit(0.0))
          .otherwise(round(array_max(zip_with(col("bv"), col("q"),
            (x, q) => abs(x - q * col("scale") / lit(127.0)))), 6)))
      .select(col(idCol), col("block"), col("scale"), col("q"),
        col("qdot"), col("err"))
  }

  // ---- product quantization (PQ) -----------------------------------
  //
  // Jégou, Douze, Schmid, "Product Quantization for Nearest Neighbor
  // Search" (TPAMI 2011): split each d-dim vector into m subvectors,
  // k-means each subspace independently, store a vector as its m
  // nearest-centroid ids — m bytes-ish instead of 4·d — and answer
  // queries with Asymmetric Distance Computation: one m·k lookup
  // table per query, scored against CODES only. This is the memory
  // path for web-scale ANN: at 100 TB of float32 embeddings the codes
  // relation is ~64× smaller, scoring never touches a float vector,
  // and the only corpus-sized operations are broadcast fan-outs and
  // one skinny aggregation. Training reuses the deterministic
  // [[Clustering]] Lloyd (lowest-id seeds, round-6 scores, decimal
  // means), so the whole index is engine-replayable — the DuckDB
  // oracle rebuilds codebooks, codes, and ADC rankings bit-for-bit.

  /** Train one codebook per subspace: (sub, cid, cv) with cv of
    * length dim/m. m full passes over the points (one Lloyd per
    * subspace); at scale, train on a sample and encode the corpus —
    * encode is the only part that must see every row.
    *
    * The returned table is `localCheckpoint`ed (r13): it is m·k rows —
    * the trained artifact, bounded by construction — but its PLAN
    * embeds m full Lloyd trainings, and every downstream consumer
    * (the m encode fan-outs, the per-query LUT) re-ran all of them per
    * broadcast build (measured: n11's steady-state was dominated by
    * ~8 single-task ~1 s broadcast-future stages = 4 codebooks × 2
    * consumers). Materializing the 32 rows runs each training exactly
    * once and keeps the consumer plans shallow. */
  def pqCodebooks(points: DataFrame, m: Int, dim: Int, k: Int,
      iters: Int): DataFrame = {
    require(m >= 1 && dim % m == 0, s"dim $dim must split into m=$m subspaces")
    val subDim = dim / m
    (0 until m).map { s =>
      val sub = points.select(col("vec_id"),
        slice(col("v"), s * subDim + 1, subDim).as("v"))
      Clustering.lloydCentroids(points.sparkSession, sub, k, iters)
        .select(lit(s).as("sub"), col("cid"), col("cv"))
    }.reduce(_.unionByName(_)).localCheckpoint()
  }

  /** Encode every vector as its per-subspace nearest-centroid id, in
    * LONG form (vec_id, sub, code) — the join-ready layout ADC scores
    * against. m broadcast fan-outs over the point set; no shuffle of
    * the vectors themselves. */
  def pqEncode(points: DataFrame, codebooks: DataFrame, m: Int,
      dim: Int): DataFrame = {
    val subDim = dim / m
    (0 until m).map { s =>
      Clustering.assign(
        points.select(col("vec_id"), slice(col("v"), s * subDim + 1, subDim).as("v")),
        codebooks.filter(col("sub") === s).select(col("cid"), col("cv")))
        .select(col("vec_id"), lit(s).as("sub"), col("cid").as("code"))
    }.reduce(_.unionByName(_))
  }

  /** ADC top-k: for each query, build the m·k lookup table
    * `d(sub, cid) = round(<cv,cv> − 2·<q_sub,cv>, 6)` (rank-equal to
    * ‖q_sub − cv‖², the per-query ‖q_sub‖² constant cancels), then
    * score every encoded vector by the sum of its m looked-up cells.
    * The per-cell rounding pins the doubles; the SUM runs in
    * DECIMAL(18,6) so addition order cannot move a ulp — the cast
    * back to double is exact at these magnitudes. The corpus-side
    * work is one broadcast-LUT join over the skinny codes relation +
    * one (qid, vec_id) aggregation — float vectors are never touched,
    * which is the entire reason PQ wins at scale.
    * Output: (qid, vec_id, adist) — k rows per query, nearest first. */
  /** Per-query ADC lookup table: (qid, sub, cid, d) with
    * `d = round(<cv,cv> − 2·<q_sub,cv>, 6)` — m·k rows per query,
    * broadcastable by construction. */
  def pqLut(codebooks: DataFrame, queries: DataFrame, m: Int,
      dim: Int): DataFrame = {
    val subDim = dim / m
    val dot = graft.functions.DotProduct.dot_product _
    (0 until m).map { s =>
      queries.select(col("vec_id").as("qid"),
          slice(col("v"), s * subDim + 1, subDim).as("qv"))
        .join(codebooks.filter(col("sub") === s), lit(true))
        .select(col("qid"), col("sub"), col("cid"),
          round(dot(col("cv"), col("cv")) - lit(2) * dot(col("qv"), col("cv")), 6)
            .as("d"))
    }.reduce(_.unionByName(_))
  }

  def pqTopK(codes: DataFrame, codebooks: DataFrame, queries: DataFrame,
      m: Int, dim: Int, k: Int): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val lut = pqLut(codebooks, queries, m, dim)
    codes
      .join(broadcast(lut),
        codes("sub") === lut("sub") && codes("code") === lut("cid"))
      .groupBy(col("qid"), col("vec_id"))
      .agg(sum(col("d").cast("decimal(18,6)")).cast("double").as("adist"))
      .withColumn("rn", row_number().over(
        Window.partitionBy(col("qid"))
          .orderBy(col("adist").asc, col("vec_id").asc)))
      .filter(col("rn") <= k)
      .select(col("qid"), col("vec_id"), col("adist"))
  }

  /** IVF+PQ: the production ANN composition — a coarse quantizer
    * routes each query to `nProbe` cells, and ADC scores ONLY the
    * codes living in those cells. At 100 TB this multiplies the two
    * wins: the scan is |probed cells| / |cells| of the corpus, and
    * what it scans is codes, not vectors. Cells here are a
    * pre-assigned column (the [[Similarity.ivfTopK]] contract — a
    * label, a k-means cid, an LSH bucket); codebooks are trained
    * corpus-wide, NOT per-cell residuals (the simpler no-residual
    * IVFPQ variant — exactness of the oracle replay is worth more
    * here than the recall a residual codebook buys).
    * `members`: (vec_id, cell) — cell membership of every encoded
    * vector. `probes`: (qid, cell) — the routing, top-nProbe cells
    * per query. Output as [[pqTopK]]. */
  def ivfPqTopK(codes: DataFrame, codebooks: DataFrame, queries: DataFrame,
      members: DataFrame, probes: DataFrame, m: Int, dim: Int,
      k: Int): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val lut = pqLut(codebooks, queries, m, dim)
      .select(col("qid").as("_lqid"), col("sub").as("_lsub"),
        col("cid").as("_lcid"), col("d"))
    val cands = members.select(col("vec_id"), col("cell"))
      .join(broadcast(probes.select(col("qid"), col("cell").as("_pcell"))),
        col("cell") === col("_pcell") && col("vec_id") =!= col("qid"))
      .select(col("qid"), col("vec_id"))
    cands
      .join(codes, "vec_id")
      .join(broadcast(lut),
        col("qid") === col("_lqid") && col("sub") === col("_lsub") &&
          col("code") === col("_lcid"))
      .groupBy(col("qid"), col("vec_id"))
      .agg(sum(col("d").cast("decimal(18,6)")).cast("double").as("adist"))
      .withColumn("rn", row_number().over(
        Window.partitionBy(col("qid"))
          .orderBy(col("adist").asc, col("vec_id").asc)))
      .filter(col("rn") <= k)
      .select(col("qid"), col("vec_id"), col("adist"))
  }

  /** Per-row: max_abs (the dequant scale numerator), q (array<bigint>
    * in [-127,127]), qdot = exact integer <q,q> (what a quantized
    * scorer computes), err = round-6 max elementwise |x - q*m/127|
    * reconstruction error. */
  def quantize(emb: DataFrame, idCol: String, vecCol: String): DataFrame = {
    val v = col(vecCol).cast("array<double>")
    emb
      .withColumn("max_abs", maxAbs(v))
      .withColumn("q",
        when(col("max_abs") === 0.0, transform(v, _ => lit(0L)))
          .otherwise(transform(v,
            x => greatest(lit(-127L), floor(x * lit(127.0) / col("max_abs")).cast("long")))))
      .withColumn("qdot",
        aggregate(zip_with(col("q"), col("q"), (a, b) => a * b),
          lit(0L), (acc, x) => acc + x))
      .withColumn("err",
        when(col("max_abs") === 0.0, lit(0.0))
          .otherwise(round(array_max(zip_with(v, col("q"),
            (x, q) => abs(x - q * col("max_abs") / lit(127.0)))), 6)))
      .select(col(idCol), col("max_abs"), col("q"), col("qdot"), col("err"))
  }
}
