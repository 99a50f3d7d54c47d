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
    * reducer.
    *
    * EAGER at construction: computing the hot-key set runs the left
    * histogram (one map-side-combined count job + a `maxHotKeys`-
    * bounded collect) when this method is CALLED, not when the
    * returned DataFrame is first acted on — a threshold violation
    * therefore aborts before any action, and calling the method twice
    * scans the left input twice. Callers composing several skew
    * decisions over one input should use [[dispatchJoin]], which
    * caches the histogram across its probes. */
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
    // bounded driver materialization (same probe as dispatchJoin): one
    // row past the cap proves the violation — a mis-set threshold on a
    // high-cardinality key must fail with this require, never with a
    // driver-sized collect of the whole key set
    val hotKeys = counts.limit(maxHotKeys + 1).collect().map(_.get(0))
    require(hotKeys.length <= maxHotKeys,
      s"hotColdJoin: more than $maxHotKeys keys exceed hotThreshold=$hotThreshold " +
        s"(maxHotKeys=$maxHotKeys) — raise the threshold or salt instead")
    hotColdJoinWith(left, right, key, hotKeys)
  }

  private[graft] def hotColdJoinWith(left: DataFrame, right: DataFrame,
      key: String, hotKeys: Array[Any]): DataFrame =
    if (hotKeys.isEmpty) left.join(right, key)
    else {
      val isHot = col(key).isin(hotKeys: _*)
      val hot = left.filter(isHot)
        .join(broadcast(right.filter(isHot)), key)
      val cold = left.filter(!isHot).join(right.filter(!isHot), key)
      hot.unionByName(cold)
    }

  /** SKEW DISPATCHER — the an32-report → weapon composition: measure
    * the left side's key histogram ONCE and route the join to the
    * strategy the measured shape justifies (the decision table lives
    * in SCALING.md "Skew routing"):
    *
    *  - `max/mean < skewRatio` → **plain** join: no degenerate skew;
    *    AQE's OptimizeSkewedJoin levels moderate imbalance at runtime
    *    for free, and salting/splitting would only add cost.
    *  - skewed AND ≤ `maxHotKeys` keys above `skewRatio × mean` →
    *    **hot/cold split** ([[hotColdJoin]]): the hot slice of the
    *    right side is tiny by definition, broadcast it; the hot keys
    *    never converge on one reducer and the cold majority pays
    *    nothing extra.
    *  - skewed with MORE hot keys than an IN-list/broadcast can carry
    *    → **salted join** ([[saltedJoin]]): spread every key over
    *    `salts` reducers; costs `salts`× replication of the right
    *    side, the only weapon whose cost is independent of how MANY
    *    keys are hot.
    *
    * Returns (joined DataFrame, decision string) so pipelines can log
    * the routing. EAGER at construction like [[hotColdJoin]]: the
    * histogram job runs when called — it is the price of deciding
    * from measurement instead of guessing, paid once (the histogram
    * is cached across the stats probe and the hot-key enumeration).
    * Inner-join semantics; every route returns the exact same rows
    * (spec-pinned). */
  def dispatchJoin(left: DataFrame, right: DataFrame, key: String,
      saltCarrier: String, skewRatio: Long = 4, maxHotKeys: Int = 1000,
      salts: Int = 16): (DataFrame, String) = {
    require(skewRatio >= 2, s"dispatchJoin: skewRatio must be >= 2, got $skewRatio")
    val counts = left.filter(col(key).isNotNull)
      .groupBy(col(key)).agg(count(lit(1)).as("__n")).cache()
    try {
      val r = counts.agg(sum(col("__n")), count(lit(1)), max(col("__n"))).head()
      if (r.isNullAt(0)) (left.join(right, key), "plain") // empty left
      else {
        val nRows = r.getLong(0)
        val nKeys = r.getLong(1)
        val maxN = r.getLong(2)
        val mean = math.max(1L, nRows / nKeys)
        if (maxN < skewRatio * mean) (left.join(right, key), "plain")
        else {
          val hotThreshold = skewRatio * mean
          // bounded driver materialization: one row past the cap is
          // enough to know the IN-list route is off the table
          val hotKeys = counts.filter(col("__n") >= hotThreshold)
            .select(col(key)).limit(maxHotKeys + 1).collect().map(_.get(0))
          if (hotKeys.length <= maxHotKeys)
            (hotColdJoinWith(left, right, key, hotKeys), "hotcold")
          else (saltedJoin(left, right, key, saltCarrier, salts), "salted")
        }
      }
    } finally counts.unpersist(blocking = false)
  }
}
