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
    val spark = SparkSession.builder()
      .master(sys.env.getOrElse("SPARK_MASTER", "local[4]"))
      .appName("graft-etl")
      .config("spark.sql.shuffle.partitions",
        sys.env.getOrElse("SPARK_GRAFT_CPUS", "4"))
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val merged = Ingest.readMerged(spark, inputs)
    val clean = Clean(merged)
    val star = StarSchema.build(clean)
    val keywordsDim =
      if (compat) StarSchema.keywordsCompat(clean) else star.keywords
    val authorsDim =
      if (compat) StarSchema.authorsCompat(clean) else star.authors

    val tables = Seq(
      "articles" -> star.articles,
      "publishers" -> star.publishers,
      "keywords" -> keywordsDim,
      "topics" -> star.topics,
      "dates" -> star.dates,
      "authors" -> authorsDim,
      "author_article_mapping" -> star.authorArticle,
      "keywords_articles_mapping" -> star.keywordArticle)

    println(s"[etl] merged=${merged.count()} clean=${clean.count()}")
    tables.foreach { case (name, df) =>
      Writers.writeCsv(df, s"$outDir/csv/$name", singleFile = true)
      Writers.writeInsertScript(df, name, s"$outDir/sql/$name")
      println(s"[etl] $name=${df.count()}")
    }
    Writers.writeJsonl(clean, s"$outDir/clean_jsonl")
    spark.stop()
  }
}
