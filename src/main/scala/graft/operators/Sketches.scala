package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Count-min sketch — sublinear heavy-hitter counting for streams and
  * corpora whose key cardinality dwarfs memory (token frequencies,
  * URL hit counts). d=depth hash rows × w=width counters; an
  * estimate is the min over its d cells, which OVERcounts only
  * (collisions add, never subtract): `exact ≤ est ≤ exact + εN`
  * with ε ≈ e/w.
  *
  * Plan shape at scale: the corpus is reduced to exact per-key
  * partial counts first (one map-side-combined shuffle — the same
  * aggregation any word count needs), and the sketch is built from
  * the COUNTS, so the sketch stage moves d rows per DISTINCT key,
  * not per instance. The finished sketch is ≤ d·w rows — broadcast
  * size by construction — so estimation joins are broadcast joins
  * with zero probe-side shuffle.
  *
  * Hash positions are the md5 idiom shared with `Bloom` and the LSH
  * planes: any engine rebuilds the identical sketch, so estimates
  * are engine-exact (the DuckDB oracle replays them cell for cell).
  */
object Sketches {

  /** Row-j probe position of a key in a width-w sketch. */
  def cmsPosition(key: Column, j: Int, w: Int): Column =
    pmod(conv(substring(md5(concat(lit(s"cms:$j:"), key.cast("string"))), 1, 8), 16, 10)
      .cast("long"), lit(w.toLong))

  /** Build the sketch from per-key counts: (j, pos, cell) rows,
    * at most d·w of them. */
  def cmsBuild(counts: DataFrame, keyCol: String, cntCol: String, d: Int, w: Int): DataFrame = {
    val jp = explode(array((0 until d).map(j =>
      struct(lit(j).as("j"), cmsPosition(col(keyCol), j, w).as("pos"))): _*)).as("jp")
    counts
      .select(col(cntCol).as("_n"), jp)
      .select(col("jp.j").as("j"), col("jp.pos").as("pos"), col("_n"))
      .groupBy("j", "pos")
      .agg(sum(col("_n")).as("cell"))
  }

  /** Point estimates for `keys`: min over the key's d cells. The
    * sketch is broadcast (≤ d·w rows); the only shuffle is the tiny
    * per-key min. The probe is a LEFT join with absent cells read as
    * 0 — the sketch is stored SPARSE (untouched cells have no row),
    * and an inner join would drop empty cells from the min: an unseen
    * key would overestimate (min over its non-empty cells only) or
    * vanish from the output entirely instead of estimating 0. */
  def cmsEstimate(keys: DataFrame, keyCol: String, sketch: DataFrame, d: Int, w: Int): DataFrame = {
    val jp = explode(array((0 until d).map(j =>
      struct(lit(j).as("j"), cmsPosition(col(keyCol), j, w).as("pos"))): _*)).as("jp")
    keys
      .select(col(keyCol), jp)
      .select(col(keyCol), col("jp.j").as("j"), col("jp.pos").as("pos"))
      .join(broadcast(sketch), Seq("j", "pos"), "left")
      .groupBy(keyCol)
      .agg(min(coalesce(col("cell"), lit(0L))).as("est"))
  }
}
