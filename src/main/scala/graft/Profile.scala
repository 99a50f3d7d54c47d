package graft

import org.apache.spark.sql.SparkSession

/** Ad-hoc profiling entry point: times the named queries (args) on
  * SPARK_GRAFT_SF_DIR with per-run wall times printed, so a hotspot
  * can be chased without running the whole bench. Not part of the
  * gate; Bench remains the reported number. */
object Profile {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.codegen.cache.maxEntries", "10000")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark.sparkContext.addSparkListener(new org.apache.spark.scheduler.SparkListener {
      override def onJobEnd(e: org.apache.spark.scheduler.SparkListenerJobEnd): Unit = ()
      override def onStageCompleted(
          e: org.apache.spark.scheduler.SparkListenerStageCompleted): Unit = {
        val si = e.stageInfo
        val dur = for (a <- si.completionTime; b <- si.submissionTime) yield (a - b) / 1000.0
        if (dur.exists(_ > 0.5))
          println(f"    SLOW stage ${si.stageId} '${si.name.take(60)}' ${dur.get}%.2f s, " +
            f"tasks=${si.numTasks}, gc=${si.taskMetrics.jvmGCTime / 1000.0}%.2f s, " +
            f"run=${si.taskMetrics.executorRunTime / 1000.0}%.2f s, " +
            f"cpu=${si.taskMetrics.executorCpuTime / 1e9}%.2f s, " +
            f"deser=${si.taskMetrics.executorDeserializeTime / 1000.0}%.2f s")
      }
    })
    Tables.load(spark, sfDir, "lineitem").count()
    args.foreach { name =>
      (1 to 6).foreach { i =>
        val t0 = System.nanoTime()
        // noop-sink forcing, as in Bench (guide §1.4): count() lets the
        // optimizer prune the operator under test, so the stage trace
        // would profile a different (smaller) plan than the bench times
        SparkEntry.queries(name)(spark, sfDir)
          .write.format("noop").mode("overwrite").save()
        println(f"$name rep$i: ${(System.nanoTime() - t0) / 1e9}%.3f s")
      }
    }
    spark.stop()
  }
}
