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

  /** HOT/COLD SPLIT join (sk3) — the third skew weapon, for when the
    * right side is too big to broadcast whole AND too big to replicate
    * `salts`× ([[saltedJoin]]'s cost): measure the left side's key
    * histogram, split the keys at `hotThreshold` rows, and run TWO
    * joins — the hot keys' right rows (a tiny relation by definition:
    * few keys are hot) BROADCAST against the hot left partition, the
    * cold majority through the ordinary shuffled equi-join — then
    * union. Every production engine's manual skew recipe (and what
    * AQE's OptimizeSkewedJoin approximates at runtime for sort-merge
    * plans); the explicit form handles the degenerate single-key-owns-
    * double-digit-percent case AQE splits can't fully level.
    *
    * The hot-key set is computed with one map-side-combined count on
    * the LEFT side and must be small (it's broadcast twice — as the
    * split filter and through the hot join); `require`-guarded via
    * `maxHotKeys`. Inner-join semantics; result equals the plain join
    * exactly (spec-pinned), only the physical distribution differs.
    *
    * Scale shape: one count agg over the left (map-side combined, key
    * cardinality rows), two equi-joins each seeing DISJOINT key sets
    * (no row duplicated, no post-union dedup needed), the hot side's
    * shuffle avoided entirely — the hot key never converges on one
    * reducer. */
  def hotColdJoin(left: DataFrame, right: DataFrame, key: String,
      hotThreshold: Long, maxHotKeys: Int = 1000): DataFrame = {
    // null keys never become "hot": an IN list containing null makes
    // every non-matching row evaluate NULL (not false), so `!isHot`
    // would silently DROP the whole cold branch — and inner-join
    // semantics discard null keys anyway, so excluding them here
    // changes nothing about the result
    val counts = left.filter(col(key).isNotNull)
      .groupBy(col(key)).agg(count(lit(1)).as("__n"))
      .filter(col("__n") >= hotThreshold)
      .select(col(key))
    val hotKeys = counts.collect().map(_.get(0))
    require(hotKeys.length <= maxHotKeys,
      s"hotColdJoin: ${hotKeys.length} keys exceed hotThreshold=$hotThreshold " +
        s"(maxHotKeys=$maxHotKeys) — raise the threshold or salt instead")
    if (hotKeys.isEmpty) left.join(right, key)
    else {
      val isHot = col(key).isin(hotKeys: _*)
      val hot = left.filter(isHot)
        .join(broadcast(right.filter(isHot)), key)
      val cold = left.filter(!isHot).join(right.filter(!isHot), key)
      hot.unionByName(cold)
    }
  }
}
