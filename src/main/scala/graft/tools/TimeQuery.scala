package graft.tools

import org.apache.spark.sql.SparkSession

/** Ad-hoc timer for individual gate queries: runs each named query
  * `reps` times (after one untimed warm-up) and prints per-rep wall
  * times, so a hot spot in BENCH can be bisected without re-running
  * the whole headline suite.
  *
  * usage: runMain graft.tools.TimeQuery <sfDir> <query>[,<query>...] [reps]
  */
object TimeQuery {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.length > 0) args(0) else "/root/testdata/sf0.1"
    val names =
      if (args.length > 1) args(1).split(",").toSeq
      else Seq("n2_ann_ivf")
    val reps = if (args.length > 2) args(2).toInt else 3
    // SAME session shape as Bench (cpu default, shuffle partitions,
    // codegen cache): a bisection tool that measures under a different
    // parallelism/caching regime than the bench it bisects produces
    // numbers that cannot be compared with the bench's
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.codegen.cache.maxEntries", "10000")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    graft.Tables.load(spark, sfDir, "lineitem").count()
    for (name <- names) {
      val q = graft.SparkEntry.queries(name)
      // noop-sink forcing, as in Bench: count() lets the optimizer
      // prune the operator under test out of the measured plan
      def force(): Unit =
        q(spark, sfDir).write.format("noop").mode("overwrite").save()
      val rows = q(spark, sfDir).count() // untimed warm-up + row count
      force()                            // warm the forced plan too
      val times = (1 to reps).map { _ =>
        val t0 = System.nanoTime()
        force()
        (System.nanoTime() - t0) / 1e9
      }
      println(f"TIMEQ $name rows=$rows " +
        times.map(t => f"$t%.3f").mkString(" "))
    }
    spark.stop()
  }
}
