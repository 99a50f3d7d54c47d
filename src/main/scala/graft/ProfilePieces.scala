package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.metrics.source.CodegenMetrics

/** Scratch profiling: attribute ANN query time to janino compilation
  * vs execution. Not part of the gate. */
object ProfilePieces {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def compMs: (Long, Double) = {
      val h = CodegenMetrics.METRIC_COMPILATION_TIME
      (h.getCount, h.getSnapshot.getMean * h.getCount)
    }
    Seq("n5_ann_lsh", "n2_ann_ivf").foreach { name =>
      (1 to 6).foreach { i =>
        val (c0, t0) = compMs
        val w0 = System.nanoTime()
        val n = SparkEntry.queries(name)(spark, sfDir).count()
        val wall = (System.nanoTime() - w0) / 1e9
        val (c1, t1) = compMs
        println(f"$name rep$i: wall=$wall%.2f s, compiles=${c1 - c0}, " +
          f"compileTime~=${(t1 - t0) / 1000.0}%.2f s ($n rows)")
      }
    }
    spark.stop()
  }
}
