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
