package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.{col, expr}
import org.apache.spark.sql.types.{LongType, TimestampNTZType, TimestampType}

/** Loaders for the driver-generated testdata tables (TESTDATA.md).
  * One parquet file per table under `\$sfDir/<name>.parquet`.
  */
object Tables {
  val all: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  /** events.parquet's `ts` physical type has drifted across generator
    * versions: TIMESTAMP(NANOS) (rejected by Spark's reader outright —
    * read via the legacy nanos-as-long escape hatch), then
    * timestamp[us] with isAdjustedToUTC=false (read as TIMESTAMP_NTZ,
    * which `unix_micros`/`window`/watermarks all reject). Normalize
    * every variant to a microsecond TimestampType here so downstream
    * operators see one stable type. The NTZ→TIMESTAMP cast is exact:
    * the session time zone is pinned to UTC in Verify/Bench/tests, so
    * the wall-clock micros are reinterpreted 1:1 as UTC instants —
    * identical to what DuckDB's epoch_us sees on the same file.
    */
  def load(spark: SparkSession, sfDir: String, name: String): DataFrame =
    if (name == "events") {
      spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
      val raw = spark.read.parquet(s"$sfDir/events.parquet")
      raw.schema("ts").dataType match {
        case LongType =>
          raw.withColumn("ts", expr("timestamp_micros(ts div 1000)"))
        case TimestampNTZType =>
          raw.withColumn("ts", col("ts").cast(TimestampType))
        case _ => raw
      }
    } else {
      spark.read.parquet(s"$sfDir/$name.parquet")
    }

  /** [[load]] + an immediate round-robin repartition to the session's
    * shuffle parallelism — for queries whose per-row map work
    * (tokenize + window-hash explodes, per-pair vector math) dominates
    * the scan. The testdata tables are ONE parquet file with ONE row
    * group, and a parquet row group is the atomic read unit, so every
    * scan is a single task — and whole-stage codegen fuses all
    * downstream per-row expressions into that stage: the guide-§2.5
    * "unsplittable input" shape, measured as ~2 s of one-core CPU
    * inside t30 while 31 cores idled. The repartition moves the raw
    * column bytes once (cheap — these are the narrow projected
    * columns) so the expensive map work runs at full parallelism.
    * Parallelism comes from spark.sql.shuffle.partitions — never a
    * constant — so the shape adapts to the session. At cluster scale
    * with many-file inputs, keep plain [[load]] for scan-parallel
    * sources; this helper is for inputs that do not split. */
  def loadSpread(spark: SparkSession, sfDir: String, name: String): DataFrame =
    load(spark, sfDir, name).repartition(
      spark.conf.get("spark.sql.shuffle.partitions", "200").toInt)
}
