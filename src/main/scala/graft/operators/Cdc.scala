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

  /** Convenience: stamp a base snapshot as version-0 upserts so it
    * unions with a change log. */
  def asBase(base: DataFrame, versionCol: String = "version", opCol: String = "op"): DataFrame =
    base.withColumn(versionCol, lit(0L)).withColumn(opCol, lit("U"))
}
