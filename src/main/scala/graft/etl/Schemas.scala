package graft.etl

import org.apache.spark.sql.types._

/** Explicit schemas for the scholarly-article corpus — the reference
  * infers every schema (spark.read.json at DB/ETL.ipynb c5, pandas
  * round-trip at c6/c9); we declare one permissive schema instead
  * (SURVEY §1.4/§1.5) so sentinel strings and int-vs-string drift
  * survive ingest untouched for the cleaning stage to filter exactly
  * as the reference does.
  */
object Schemas {

  /** authors_with_affiliations element
    * (ScienceDirect/ScienceDirect.py:76-147, IEEE/IEEE.py:178-228). */
  val affiliationType: StructType = StructType(Seq(
    StructField("author", StringType),
    StructField("country", StringType),
    StructField("location", StringType),
    StructField("university", StringType)))

  /** publisher struct added by SD_Upd.py:75 / IEEE_Upd.py:78. */
  val publisherType: StructType = StructType(Seq(
    StructField("ISSN", StringType),
    StructField("Quartile", StringType),
    StructField("name", StringType)))

  /** The permissive union schema over all four raw-file variants
    * (FIXTURES.md): SD raw (journal_name), SD upd (publisher),
    * IEEE raw (journal_name + top-level ISSN + locations), IEEE upd
    * (publisher + locations). Day/Year are STRING on purpose: raw
    * files mix ints with sentinel strings like "Day not found"
    * (SURVEY §1.4); JSON ints coerce to their decimal string form.
    */
  val articleSchema: StructType = StructType(Seq(
    StructField("Date", StringType),
    StructField("Day", StringType),
    StructField("Downloads", DoubleType),
    StructField("Month", StringType),
    StructField("Year", StringType),
    StructField("_id", StringType),
    StructField("abstract", StringType),
    StructField("authors", ArrayType(StringType)),
    StructField("authors_with_affiliations", ArrayType(affiliationType)),
    StructField("citations", DoubleType),
    StructField("countries", ArrayType(StringType)),
    StructField("doi", StringType),
    StructField("journal_name", StringType),          // raw variants only
    StructField("ISSN", StringType),                  // IEEE raw only
    StructField("keywords", ArrayType(StringType)),
    StructField("locations", ArrayType(StringType)),  // IEEE only
    StructField("publisher", publisherType),          // upd variants only
    StructField("title", StringType),
    StructField("topic", StringType),
    StructField("type", StringType),
    StructField("website", StringType)))

  /** Typed views of the cleaned core. */
  case class Affiliation(author: String, country: String,
      location: String, university: String)
  case class Publisher(ISSN: String, Quartile: String, name: String)
  case class Article(
      doi: String, title: String, abstractText: String,
      topic: String, website: String,
      Date: String, Day: Option[Int], Month: String, Year: Option[Int],
      citations: Option[Double],
      authors: Seq[String],
      keywords: Seq[String],
      publisher: Option[Publisher])

  /** quartiles lookup table (replaces the per-row SCImago scrape,
    * SD_Upd.py:82): one row per (journal, year). */
  val quartileSchema: StructType = StructType(Seq(
    StructField("journal", StringType),
    StructField("ISSN", StringType),
    StructField("year", IntegerType),
    StructField("quartile", StringType)))
}
