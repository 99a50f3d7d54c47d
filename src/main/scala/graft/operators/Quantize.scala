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
