package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** CDC upsert merge — MERGE INTO as a last-writer-wins snapshot fold.
  * The maintenance operation every continuously-crawled corpus needs:
  * a base snapshot plus a stream of keyed changes (inserts, updates,
  * delete tombstones) collapse to the next snapshot.
  *
  * Semantics: rows carry (key, version, op, payload). Per key the
  * highest version wins; a winning op = 'D' removes the key from the
  * snapshot. The base snapshot is just version-0 'U' rows, so base
  * and changes union into one relation and the whole merge is a
  * single hash shuffle on the key + a per-key window — the minimal
  * plan shape for this operation (Delta/Iceberg MERGE does the same
  * join-shaped shuffle). No driver-side state, no collect; at 100 TB
  * the key shuffle IS the merge, and AQE handles skewed hot keys.
  *
  * Determinism contract: callers must make (key, version) unique —
  * real CDC logs are (the log offset is the version). The tie-break
  * on `op` is defensive only.
  */
object Cdc {

  /** Fold base ∪ changes to the next snapshot. `payload` columns are
    * whatever both frames carry besides key/version/op. */
  def upsert(all: DataFrame, keyCols: Seq[String],
      versionCol: String = "version", opCol: String = "op"): DataFrame = {
    val w = Window.partitionBy(keyCols.map(col): _*)
      .orderBy(col(versionCol).desc, col(opCol).desc)
    all
      .withColumn("_rn", row_number().over(w))
      .filter(col("_rn") === 1 && col(opCol) =!= "D")
      .drop("_rn", opCol)
  }

  /** [[upsert]] minus the delete filter: one winner per key by
    * (version desc, op desc), DELETE rows kept as tombstones. The
    * incremental-merge building block (e14): a folded state must
    * remember "deleted at version v", or an out-of-order redelivered
    * batch carrying an OLDER update would resurrect the key. Filter
    * `op != 'D'` only when publishing the final snapshot. */
  def compact(all: DataFrame, keyCols: Seq[String],
      versionCol: String = "version", opCol: String = "op"): DataFrame = {
    val w = Window.partitionBy(keyCols.map(col): _*)
      .orderBy(col(versionCol).desc, col(opCol).desc)
    all.withColumn("_rn", row_number().over(w))
      .filter(col("_rn") === 1)
      .drop("_rn")
  }

  /** Convenience: stamp a base snapshot as version-0 upserts so it
    * unions with a change log. */
  def asBase(base: DataFrame, versionCol: String = "version", opCol: String = "op"): DataFrame =
    base.withColumn(versionCol, lit(0L)).withColumn(opCol, lit("U"))

  /** MERGE with SCHEMA EVOLUTION (u10) — Delta/Iceberg
    * `mergeSchema`/`autoMerge` semantics on the same upsert fold: the
    * change log may CARRY COLUMNS THE BASE LACKS (a continuously-
    * crawled corpus grows fields — a new scraper version starts
    * emitting a score the old snapshot never had). The union aligns by
    * NAME with missing columns null-filled, so base rows surface the
    * new column as NULL and evolved rows carry their value; everything
    * downstream is the identical single-key-shuffle upsert. The base
    * may NOT drop columns the log lacks silently — a log missing base
    * columns null-fills them on the LOG side, which last-writer-wins
    * would then propagate; callers wanting "unchanged" semantics for
    * absent columns need a read-modify-write log, which is a different
    * contract (documented, not defaulted). */
  def upsertEvolve(base: DataFrame, changes: DataFrame, keyCols: Seq[String],
      versionCol: String = "version", opCol: String = "op"): DataFrame =
    upsert(asBase(base, versionCol, opCol)
      .unionByName(changes, allowMissingColumns = true),
      keyCols, versionCol, opCol)

  /** Incremental aggregate maintenance — the materialized-view delta
    * merge: combine two PARTIAL aggregate relations (the stored MV
    * over the base, the fresh aggregate over a delta batch) into the
    * aggregate of their union without rescanning the base. Works for
    * any algebraic aggregate; measure columns declare their merge
    * function by name prefix — `cnt_*`/`sum_*` re-sum, `min_*`
    * re-mins, `max_*` re-maxes (avg = cnt+sum pair, derived on read).
    *
    * The 100 TB point: the base side is |groups| rows, not |base|
    * rows — maintenance cost is O(|delta| + |groups|), the reason
    * MVs exist. One union + one hash aggregate on the group key;
    * both sides already partition by that key when the MV is stored
    * bucketed, making the merge shuffle-free on the base side. */
  def mergePartialAggs(a: DataFrame, b: DataFrame, keys: Seq[String]): DataFrame = {
    require(a.columns.sorted.sameElements(b.columns.sorted),
      s"partial aggregates must share a schema: ${a.columns.mkString(",")} vs ${b.columns.mkString(",")}")
    val measures = a.columns.filterNot(keys.contains)
    val bad = measures.filterNot(c =>
      c.startsWith("cnt_") || c.startsWith("sum_") ||
        c.startsWith("min_") || c.startsWith("max_"))
    require(bad.isEmpty,
      s"measure columns must be cnt_/sum_/min_/max_-prefixed (algebraic merge): ${bad.mkString(",")}")
    val aggs = measures.map {
      case c if c.startsWith("min_") => min(col(c)).as(c)
      case c if c.startsWith("max_") => max(col(c)).as(c)
      case c => sum(col(c)).as(c)
    }
    a.unionByName(b)
      .groupBy(keys.map(col): _*)
      .agg(aggs.head, aggs.tail: _*)
  }
}
