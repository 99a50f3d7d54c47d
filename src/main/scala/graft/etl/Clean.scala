package graft.etl

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StringType

import graft.functions.UnicodeSanitize.unicode_sanitize

/** Cleaning stage — the DB/ETL.ipynb c13–c26 pipeline as one lazy plan
  * of native expressions (no Python UDFs, no driver round-trips;
  * SURVEY §3.3/§4.1).
  *
  * Order mirrors the notebook: publisher null/sentinel filter (P1) →
  * bad-date sentinel removal (P2/U1 as a negated filter, not subtract)
  * → dropna citations (P3) → non-empty array guards (P4) → column
  * drops (P7) → country canonicalization (F9/F10 via broadcast map +
  * HOFs) → email filters (P5/P6, implemented as the evident intent —
  * the reference's array_contains-against-regex-literal is a no-op,
  * SURVEY §7 hazard 2) → unicode repair (F7) → whitelist clean over
  * every string column (F8).
  */
object Clean {

  val emailPattern = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"

  /** ISO-3166-ish alias map for F9/F10 — the pycountry lookup
    * (DB/ETL.ipynb c20) reduced to a broadcastable alias table. Extend
    * freely; unknown values pass through unchanged like the reference's
    * LookupError path. */
  val countryAliases: Map[String, String] = Map(
    "USA" -> "United States", "U.S.A." -> "United States",
    "United States of America" -> "United States",
    "UK" -> "United Kingdom", "U.K." -> "United Kingdom",
    "PRC" -> "China", "P.R. China" -> "China",
    "Republic of Korea" -> "South Korea", "Korea" -> "South Korea",
    "Viet Nam" -> "Vietnam", "Russian Federation" -> "Russia",
    "Deutschland" -> "Germany", "España" -> "Spain")

  private def aliasMapCol: Column =
    map(countryAliases.flatMap { case (k, v) => Seq(lit(k), lit(v)) }.toSeq: _*)

  def canonCountry(c: Column): Column =
    coalesce(element_at(aliasMapCol, c), c)

  /** P1: publisher null/sentinel filter (c13). */
  def filterPublisher(df: DataFrame): DataFrame =
    df.filter(
      col("publisher").isNotNull &&
      col("publisher.ISSN").isNotNull && col("publisher.ISSN") =!= "N/A" &&
      col("publisher.name").isNotNull && col("publisher.name") =!= "" &&
      col("publisher.Quartile").isNotNull && col("publisher.Quartile") =!= "")

  /** P2 + U1-as-filter: drop "<X> not found" sentinel rows (c14) —
    * the negated filter Catalyst would plan for the reference's
    * subtract anyway, without the wide distinct shuffle. NULL-safe to
    * match subtract exactly: a NULL Date/Year/Day/Month makes the
    * reference's `== sentinel` predicate NULL, so the row never lands
    * in the subtracted set and SURVIVES — each negated test therefore
    * coalesces to keep, instead of the bare `!startsWith` whose NULL
    * propagates into a drop. (On the committed corpus no P1 survivor
    * has a NULL date field, so the goldens are unchanged; this is
    * library-operator correctness for rawer inputs.) */
  def filterDateSentinels(df: DataFrame): DataFrame = {
    def keep(c: String, sentinel: String): Column =
      coalesce(!col(c).startsWith(sentinel), lit(true))
    df.filter(
      keep("Date", "Date not") && keep("Year", "Year not") &&
      keep("Day", "Day not") && keep("Month", "Month not"))
  }

  /** P3 + P4: citations dropna (c15) and non-empty arrays (c16/c17). */
  def filterEmptiness(df: DataFrame): DataFrame =
    df.na.drop(Seq("citations"))
      .filter(size(col("authors_with_affiliations")) > 0)
      .filter(size(col("authors")) > 0)

  /** P7: drop the always-null / staging-only columns (c18, c23). */
  def dropDead(df: DataFrame): DataFrame = {
    val dead = Seq("Downloads", "_id").filter(df.columns.contains)
    if (dead.isEmpty) df else df.drop(dead: _*)
  }

  /** F9 + F10: country canonicalization over the plain array and
    * inside the affiliation struct array — broadcast-map HOFs, not the
    * reference's Python UDFs (c20/c21). */
  def canonCountries(df: DataFrame): DataFrame =
    df.withColumn("countries", transform(col("countries"), canonCountry(_)))
      .withColumn("authors_with_affiliations",
        transform(col("authors_with_affiliations"), a => struct(
          a.getField("author").as("author"),
          canonCountry(a.getField("country")).as("country"),
          a.getField("location").as("location"),
          a.getField("university").as("university"))))

  /** P5 + P6: remove email artifacts — drop countries entries that ARE
    * emails, and affiliation entries whose country matches the email
    * pattern (c22).
    *
    * NULL handling differs BY DESIGN between the two branches:
    *  - `countries` is intent semantics (the reference's
    *    array_contains-against-regex-literal is a no-op, SURVEY §7
    *    hazard 2), and a NULL entry is not an email — keep it, so the
    *    predicate coalesces to true on NULL (Spark's array `filter`
    *    HOF drops NULL-predicate elements otherwise);
    *  - the affiliation branch mirrors the reference's REAL HOF
    *    (`filter(x -> x.country not rlike ...)`, c22), whose NULL
    *    predicate drops NULL-country entries — byte parity kept. */
  def filterEmails(df: DataFrame): DataFrame =
    df.withColumn("countries",
        filter(col("countries"), c => coalesce(!c.rlike(emailPattern), lit(true))))
      .withColumn("authors_with_affiliations",
        filter(col("authors_with_affiliations"),
          a => !a.getField("country").rlike(emailPattern)))

  /** F7: mojibake repair on the long-text columns. */
  def sanitizeUnicode(df: DataFrame): DataFrame =
    Seq("abstract", "title").foldLeft(df)((d, c) =>
      d.withColumn(c, unicode_sanitize(col(c))))

  /** F8: schema-driven whitelist clean over every top-level string
    * column (c25) — regexp_replace folded across the schema, exactly
    * the reference's loop but codegen'd. Byte parity with
    * clean_and_encode_string (ETL.ipynb c25): the whitelist keeps all
    * whitespace (the `\s` class), THEN '\n' alone is deleted with no
    * joining space — adjacent words merge, and '\r'/'\t' survive,
    * exactly as the reference's str.replace('\n','') behaves. */
  def cleanStrings(df: DataFrame): DataFrame = {
    val pattern = "[^A-Za-zÀ-ÿ0-9\\s'-]"
    df.schema.fields.collect {
      case f if f.dataType == StringType => f.name
    }.foldLeft(df)((d, c) =>
      d.withColumn(c, regexp_replace(regexp_replace(col(c), pattern, ""), "\\n", "")))
  }

  /** The full c13–c26 cleaning pipeline. */
  def apply(df: DataFrame): DataFrame =
    cleanStrings(sanitizeUnicode(filterEmails(canonCountries(
      dropDead(filterEmptiness(filterDateSentinels(filterPublisher(df))))))))
}
