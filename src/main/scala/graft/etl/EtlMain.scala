package graft.etl

import org.apache.spark.sql.SparkSession

/** CLI entry point: the reference's whole pipeline (ingest → clean →
  * star schema → sinks) over a set of scraper JSON-array files.
  *
  *   runMain graft.etl.EtlMain [--compat] <out-dir> <input.json>...
  *
  * Prints per-table row counts; writes CSV + JSONL + INSERT scripts
  * under <out-dir> — the same artifact set as DB/Tables + DB/queries.
  * `--compat` swaps in the reference-parity dimension builders
  * (per-instance keyword rows, sparse monotonic author ids).
  */
object EtlMain {
  def main(args: Array[String]): Unit = {
    val compat = args.contains("--compat")
    val rest = args.filterNot(_ == "--compat")
    require(rest.length >= 2, "usage: EtlMain [--compat] <out-dir> <input.json>...")
    val outDir = rest.head
    val inputs = rest.tail.toSeq
    // reuse an already-active session (EtlMainSpec drives this exact
    // entry point in-JVM) and only own the lifecycle of a session we
    // created ourselves — stopping a caller's session would kill every
    // Spark user sharing the JVM
    val existing = SparkSession.getActiveSession
    val spark = existing.getOrElse(SparkSession.builder()
      .master(sys.env.getOrElse("SPARK_MASTER", "local[4]"))
      .appName("graft-etl")
      .config("spark.sql.shuffle.partitions",
        sys.env.getOrElse("SPARK_GRAFT_CPUS", "4"))
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate())
    // the pipeline's date semantics REQUIRE UTC; on a reused session
    // force it session-scoped for the duration of the run and RESTORE
    // the caller's zone afterwards (leave their log level alone too)
    val callerTz = spark.conf.getOption("spark.sql.session.timeZone")
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    if (existing.isEmpty) spark.sparkContext.setLogLevel("WARN")
    try {

    val merged = Ingest.readMerged(spark, inputs)
    // one materialization serves every downstream action: without the
    // cache, each of the 8 tables' CSV write + INSERT write + count
    // (plus the JSONL sink and the two audit counts) re-runs the full
    // ingest window shuffle and cleaning chain — ~27 recomputations of
    // the corpus scan for one pipeline run
    val clean = Clean(merged).cache()
    val star = StarSchema.build(clean)
    // compat mode must stay referentially consistent: the bridges are
    // rebuilt against the compat dims' ids (the reference's c43/c45
    // name-only fanout joins), not the default dims' dense ids
    // localCheckpoint pins the compat dims' monotonically_increasing
    // ids: without it the dim-table write and the bridge join would
    // re-evaluate the plan and could assign DIFFERENT ids
    val keywordsDim =
      if (compat) StarSchema.keywordsCompat(clean).localCheckpoint()
      else star.keywords
    val authorsDim =
      if (compat) StarSchema.authorsCompat(clean).localCheckpoint()
      else star.authors
    val authorBridge =
      if (compat) StarSchema.authorBridgeCompat(clean, authorsDim)
      else star.authorArticle
    val keywordBridge =
      if (compat) StarSchema.keywordBridgeCompat(clean, keywordsDim)
      else star.keywordArticle

    val tables = Seq(
      "articles" -> star.articles,
      "publishers" -> star.publishers,
      "keywords" -> keywordsDim,
      "topics" -> star.topics,
      "dates" -> star.dates,
      "authors" -> authorsDim,
      "author_article_mapping" -> authorBridge,
      "keywords_articles_mapping" -> keywordBridge)

    println(s"[etl] merged=${merged.count()} clean=${clean.count()}")
    tables.foreach { case (name, df) =>
      Writers.writeCsv(df, s"$outDir/csv/$name", singleFile = true)
      Writers.writeInsertScript(df, name, s"$outDir/sql/$name")
      println(s"[etl] $name=${df.count()}")
    }
    Writers.writeJsonl(clean, s"$outDir/clean_jsonl")
    clean.unpersist()
    } finally {
      existing.foreach { _ =>
        callerTz match {
          case Some(tz) => spark.conf.set("spark.sql.session.timeZone", tz)
          case None => spark.conf.unset("spark.sql.session.timeZone")
        }
      }
      // stop a self-created session even when the pipeline throws:
      // EtlMainSpec drives this entry point in-JVM, where a leaked
      // session would outlive the failed run
      if (existing.isEmpty) spark.stop()
    }
  }
}
