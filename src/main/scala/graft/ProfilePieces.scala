package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Scratch profiling: time the sub-plans of the ANN queries to find
  * the variance source. Not part of the gate. */
object ProfilePieces {
  def time(name: String, reps: Int)(f: => Long): Unit =
    (1 to reps).foreach { i =>
      val t0 = System.nanoTime()
      val n = f
      println(f"$name rep$i: ${(System.nanoTime() - t0) / 1e9}%.3f s ($n rows)")
    }

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val aqe = sys.env.getOrElse("SPARK_GRAFT_AQE", "true")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", aqe)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    println("PID " + ProcessHandle.current().pid())

    def emb: DataFrame = Tables.load(spark, sfDir, "embeddings")
    time("posexplode-dblsum", 8) {
      emb.select(col("label"), posexplode(col("embedding").cast("array<double>")).as(Seq("pos", "x")))
        .groupBy("label", "pos").agg(sum("x")).count()
    }
    spark.stop()
  }
}
