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
    * `count(distinct)`'s null rule downstream. */
  def encode(df: DataFrame, keyCol: String, codeCol: String): (DataFrame, DataFrame) = {
    val dict = Ranking.globalRowNumber(
        df.select(col(keyCol)).filter(col(keyCol).isNotNull).distinct(),
        Seq(col(keyCol)), "__rn")
      .select(col(keyCol), (col("__rn") - 1L).as(codeCol))
    (df.join(dict, keyCol), dict)
  }
}
