package graft.etl

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.operators.AsOfJoin

/** Quartile enrichment (SURVEY §2.4 J4, §3.2): the reference resolves
  * each article's journal quartile by scraping SCImago per row and
  * walking `year, year-1, …, year-9` until a match (SD_Upd.py:89-98) —
  * an N+1 network as-of lookup. Here the scrape output is a plain
  * `quartiles(journal, ISSN, year, quartile)` table and the lookup is
  * one distributed as-of join with a 9-year-back tolerance window.
  */
object Quartiles {

  /** Attach (ISSN, quartile, quartile_year) to each article row by the
    * as-of rule: greatest quartile.year <= article year, at most 9 back.
    */
  def enrich(articles: DataFrame, quartiles: DataFrame): DataFrame = {
    val left = articles.withColumn("__year", col("Year").cast("int"))
    val right = quartiles.select(
      col("journal").as("journal_name"),
      col("ISSN").as("q_issn"),
      col("year").as("q_year"),
      col("quartile").as("q_quartile"))
    // tolerance = 9: matches older than 9 years are out of range (the
    // reference's 10-iteration loop). The operator nulls the payload
    // ATOMICALLY on a stale match, so q_year's nullness is exactly the
    // old in_range predicate.
    val joined = AsOfJoin.leftAsOf(
      left.withColumn("journal_name", col("publisher.name")),
      right,
      keys = Seq("journal_name"),
      leftTime = "__year", rightTime = "q_year",
      payloadCols = Seq("q_issn", "q_quartile", "q_year"),
      tieBreaker = "q_year",
      tolerance = Some(9L))
    joined
      .withColumn("publisher", struct(
        when(col("q_year").isNotNull, col("q_issn"))
          .otherwise(col("publisher.ISSN")).as("ISSN"),
        when(col("q_year").isNotNull, col("q_quartile"))
          .otherwise(lit("")).as("Quartile"),
        col("publisher.name").as("name")))
      .drop("__year", "journal_name", "q_issn", "q_quartile", "q_year")
  }
}
