package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Dictionary encoding: dense integer codes for an arbitrary-typed key
  * column — the composition that extends the exact bitmap sketch
  * algebra ([[graft.functions.BitmapDistinctExpr]] family) to string /
  * UUID / URL key domains, and the general build-once surrogate-code
  * primitive (feature hashing without collisions, categorical encoders
  * for the training pipeline).
  *
  * Codes are DETERMINISTIC and DENSE in `[0, |distinct|)`: the
  * dictionary is the distinct key set globally ranked by the key's own
  * ordering via [[Ranking.globalRowNumber]] (two-phase range-partition
  * rank — no single-task window), so the same key set always yields
  * the same codes regardless of partitioning. Dense codes are the
  * best case for the bitmap's containers: |keys| bits, zero waste.
  *
  * Scale shape: one distinct (key-hash shuffle sized to the DICTIONARY
  * cardinality, not the fact table), one rank over the distinct set,
  * one equi-join of codes back onto facts — broadcast when the
  * dictionary is small (Catalyst/AQE decides from stats), shuffled
  * hash otherwise. The dictionary is reusable: encode once per key
  * universe, sketch any number of grains.
  */
object Dictionary {

  /** Returns (facts with `codeCol` attached, the dictionary itself as
    * (key, code)). Null keys get no row in the dictionary and are
    * DROPPED from the coded facts (inner join) — matching
    * `count(distinct)`'s null rule downstream.
    *
    * APPEND HAZARD: codes are RANK-assigned over THIS key set — calling
    * `encode` again after new keys arrive renumbers every key that
    * sorts after the earliest new one, silently misaligning any STORED
    * sketch/code table built on the old codes (no require fires; bitmap
    * bits just stop meaning the same keys). Within one build the codes
    * are stable and dense; across batches, extend the dictionary with
    * [[encodeIncremental]], which freezes existing codes. */
  def encode(df: DataFrame, keyCol: String, codeCol: String): (DataFrame, DataFrame) = {
    val dict = Ranking.globalRowNumber(
        df.select(col(keyCol)).filter(col(keyCol).isNotNull).distinct(),
        Seq(col(keyCol)), "__rn")
      .select(col(keyCol), (col("__rn") - 1L).as(codeCol))
    (df.join(dict, keyCol), dict)
  }

  /** APPEND-STABLE dictionary extension — the incremental leg of
    * [[encode]]: every (key, code) pair already in `dict` is FROZEN
    * bit-for-bit, and only keys of `df` ABSENT from `dict` are ranked
    * (among themselves, by the key's own ordering) and appended at
    * `max(existing code) + 1`. Stored sketches built on the old codes
    * stay valid: a bitmap bit keeps meaning the same key forever, so
    * yesterday's sketch table and today's batch-2 sketches merge
    * exactly — the composition the engine's own incremental patterns
    * (u6 CDC upsert, u8 incremental agg, d7 incremental dedup) invite.
    *
    * Codes stay DENSE (`[0, |old| + |new|)`) but the ordering guarantee
    * weakens by design: within the appended block codes follow key
    * order, across blocks they follow ARRIVAL order. Re-running with a
    * batch containing no new keys returns `dict` unchanged.
    *
    * Returns (facts with `codeCol` attached via the EXTENDED dictionary,
    * the extended dictionary). Null keys are dropped as in [[encode]].
    *
    * Scale shape: one distinct over the BATCH (batch-cardinality
    * shuffle), one left-anti join against the dictionary (key shuffle
    * sized by dictionary + batch distinct, or broadcast when the
    * smaller side's stats allow), one global rank over only the NEW
    * keys, one broadcast 1-row max for the code offset, one equi-join
    * of the extended dictionary back onto facts. No action runs at
    * construction — the plan is lazy end-to-end. */
  def encodeIncremental(dict: DataFrame, df: DataFrame, keyCol: String,
      codeCol: String): (DataFrame, DataFrame) = {
    require(dict.columns.contains(keyCol) && dict.columns.contains(codeCol),
      s"encodeIncremental: dictionary must carry ($keyCol, $codeCol), " +
        s"got [${dict.columns.mkString(", ")}]")
    val frozen = dict.select(col(keyCol), col(codeCol).cast("long").as(codeCol))
    val newKeys = df.select(col(keyCol)).filter(col(keyCol).isNotNull).distinct()
      .join(frozen.select(col(keyCol)), Seq(keyCol), "left_anti")
    // next free code as a broadcast 1-row scalar: max + 1 over the
    // dictionary, 0 when it is empty — lazy, never a driver action here
    val base = frozen.agg(
      coalesce(max(col(codeCol)) + lit(1L), lit(0L)).as("__base"))
    val appended = Ranking.globalRowNumber(newKeys, Seq(col(keyCol)), "__rn")
      .crossJoin(broadcast(base))
      .select(col(keyCol), (col("__base") + col("__rn") - 1L).as(codeCol))
    val extended = frozen.unionByName(appended)
    (df.join(extended, keyCol), extended)
  }
}
