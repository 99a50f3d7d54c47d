package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew mitigation for hot keys (SCALING.md). AQE's skew-join split
  * covers moderate skew at runtime; these operators are the explicit
  * form for the degenerate cases AQE can't fix — a single key holding
  * a double-digit percentage of the data.
  *
  * Salts are derived from `hash()` of carrier columns, not `rand()`:
  * deterministic under retries and recomputation (a failed task that
  * re-runs must land rows in the same salt bucket, or shuffle files
  * disagree).
  */
object Skew {

  /** Two-phase salted aggregation for additive aggregates: partial
    * groupBy over (keys, salt) spreads a hot key over `salts` reducers,
    * then a final tiny groupBy over keys merges partials. */
  def saltedSum(df: DataFrame, keys: Seq[String], valueCol: String,
      saltCarrier: String, salts: Int = 16): DataFrame =
    df.withColumn("__salt", pmod(hash(col(saltCarrier)), lit(salts)))
      .groupBy((keys :+ "__salt").map(col): _*)
      .agg(sum(col(valueCol)).as("__partial"), count(lit(1)).as("__n"))
      .groupBy(keys.map(col): _*)
      .agg(sum(col("__partial")).as(s"sum_$valueCol"),
        sum(col("__n")).as("n"))

  /** Salted equi-join: the skewed (big) left side gets a deterministic
    * salt in [0, salts); the right side is replicated `salts` times so
    * every (key, salt) bucket finds its match. Equivalent to the plain
    * inner join, but a hot key's rows spread over `salts` tasks.
    * Replication multiplies the right side — use when right ≪ left but
    * too big (or too skew-prone) to broadcast outright. */
  def saltedJoin(left: DataFrame, right: DataFrame, key: String,
      saltCarrier: String, salts: Int = 16): DataFrame = {
    val saltedLeft = left.withColumn("__salt",
      pmod(hash(col(saltCarrier)), lit(salts)))
    val replicatedRight = right.withColumn("__salt",
      explode(sequence(lit(0), lit(salts - 1))))
    saltedLeft.join(replicatedRight, Seq(key, "__salt")).drop("__salt")
  }
}
