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
}
