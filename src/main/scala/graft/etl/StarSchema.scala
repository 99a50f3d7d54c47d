package graft.etl

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Star-schema transform (DB/ETL.ipynb c31–c45): fact `articles`, dims
  * `publishers/keywords/topics/dates/authors`, bridges
  * `author_article_mapping`/`keywords_articles_mapping`.
  *
  * Deliberate deviations from the reference, per SURVEY §7 hazard 2
  * (each is the evident intent; the reference numbers are recorded in
  * BASELINE.md):
  *  - surrogate keys are row_number over the natural key — dense,
  *    deterministic, repartition-stable — not
  *    monotonically_increasing_id (whose partition-dependence produced
  *    AuthorID 51,539,611,706 and made c39's late distinct() a no-op);
  *  - dims are deduped on the natural key BEFORE id assignment
  *    (keywords: 27,317 rows → 7,336 distinct in the reference);
  *  - bridges join on the deduped dim and emit distinct pairs
  *    (author bridge: 42,595 rows vs 34,281 distinct pairs there).
  *
  * Scale note: dims here are orders of magnitude smaller than the fact
  * table, so the global row_number sort is bounded by dim size; fact
  * and bridge builds broadcast the dims — no fact-side shuffle at all.
  */
object StarSchema {

  // dense 0-based ids via the two-phase distributed rank — even the
  // dims that are "small" at this corpus (authors is the one that
  // grows; SURVEY §2) never pass through a single-partition window
  private def withId(df: DataFrame, idCol: String, orderCols: Seq[String]): DataFrame =
    graft.operators.Ranking.globalRowNumber(df, orderCols.map(col), idCol)
      .withColumn(idCol, (col(idCol) - 1).cast("long"))

  /** publishers dim (c31): natural key ISSN. The representative
    * (Name, Quartile) is the lexicographic-min PAIR taken together —
    * `min(struct)`, one map-side-combinable aggregate — never
    * independent min(Name)/min(Quartile), which fabricates
    * combinations no input row carried (the committed corpus has 15
    * ISSNs with more than one (Name, Quartile) spelling). */
  def publishers(clean: DataFrame): DataFrame =
    clean.select(
        col("publisher.ISSN").as("ISSN"),
        struct(
          col("publisher.name").as("Name"),
          col("publisher.Quartile").as("Quartile")).as("nq"))
      .groupBy("ISSN")
      .agg(min("nq").as("nq"))
      .select(col("ISSN"), col("nq.Name").as("Name"), col("nq.Quartile").as("Quartile"))

  /** keywords dim (c33), deduped on the keyword string. */
  def keywords(clean: DataFrame): DataFrame =
    withId(
      clean.select(explode(col("keywords")).as("Keyword"))
        .filter(col("Keyword") =!= "").distinct(),
      "KeywordID", Seq("Keyword"))
      .select("KeywordID", "Keyword")

  /** topics dim (c35). */
  def topics(clean: DataFrame): DataFrame =
    withId(clean.select(col("topic").as("Topic")).distinct(), "TopicID", Seq("Topic"))
      .select("TopicID", "Topic")

  /** dates dim (c37): natural key the display date string — and ONLY
    * it, matching the fact join key in [[articles]]. Deduping on the
    * wider (date, Day, Month, Year) tuple while joining on the string
    * alone would fan the fact table out whenever two rows spell the
    * derived fields differently ("1" vs "01"); the derived fields are
    * aggregated to the min tuple per date string instead (1:1 on the
    * committed corpus, so the golden 661 is unchanged). */
  def dates(clean: DataFrame): DataFrame =
    withId(
      clean.select(
        col("Date").as("PublicationDate"),
        struct(col("Day"), col("Month"), col("Year")).as("dmy"))
        .groupBy("PublicationDate")
        .agg(min("dmy").as("dmy"))
        .select(col("PublicationDate"),
          col("dmy.Day").as("Day"), col("dmy.Month").as("Month"),
          col("dmy.Year").as("Year")),
      "DateID", Seq("PublicationDate"))
      .select("DateID", "PublicationDate", "Day", "Month", "Year")

  /** authors dim (c39): natural key (FullName, Country, University) —
    * deduped BEFORE the id, fixing the 19,967-vs-17,696 drift. */
  def authors(clean: DataFrame): DataFrame =
    withId(
      clean.select(explode(col("authors_with_affiliations")).as("a"))
        .select(
          col("a.author").as("FullName"),
          col("a.country").as("Country"),
          col("a.university").as("University"))
        .distinct(),
      "AuthorID", Seq("FullName", "Country", "University"))
      .select("AuthorID", "FullName", "Country", "University")

  /** articles fact (c41): 3-way left join to tiny dims → broadcast. */
  def articles(clean: DataFrame, topicsDim: DataFrame, datesDim: DataFrame): DataFrame =
    clean
      .join(broadcast(topicsDim), clean("topic") === topicsDim("Topic"), "left")
      .join(broadcast(datesDim), clean("Date") === datesDim("PublicationDate"), "left")
      .select(
        col("doi").as("DOI"),
        col("title").as("Title"),
        col("abstract").as("Abstract"),
        col("citations").as("Citations"),
        col("publisher.ISSN").as("ISSN"),
        col("DateID"),
        col("website").as("Website"),
        col("TopicID"))

  /** author bridge (c43): distinct (DOI, AuthorID) via the natural key. */
  def authorBridge(clean: DataFrame, authorsDim: DataFrame): DataFrame =
    clean.select(col("doi").as("DOI"), explode(col("authors_with_affiliations")).as("a"))
      .select(col("DOI"),
        col("a.author").as("FullName"),
        col("a.country").as("Country"),
        col("a.university").as("University"))
      .distinct()
      .join(broadcast(authorsDim), Seq("FullName", "Country", "University"))
      .select("DOI", "AuthorID")
      .distinct()

  /** keyword bridge (c45). */
  def keywordBridge(clean: DataFrame, keywordsDim: DataFrame): DataFrame =
    clean.select(col("doi").as("DOI"), explode(col("keywords")).as("Keyword"))
      .filter(col("Keyword") =!= "")
      .distinct()
      .join(broadcast(keywordsDim), Seq("Keyword"))
      .select("DOI", "KeywordID")
      .distinct()

  /** The 100 TB path for the ONE dim that grows with the corpus: when
    * the authors dim outgrows broadcast, store BOTH join sides
    * bucketed + sorted on the natural key — the bridge join is then a
    * zero-Exchange sort-merge over co-located buckets (the exact
    * machinery BucketingSpec proves for orders/customer). The bucket
    * write is a one-time layout cost amortized over every downstream
    * bridge build; `buckets` scales with corpus (≈ total size /
    * 256 MB at the real deployment).
    *
    * Returns the co-bucketed join (one row per exploded distinct
    * natural-key pair); [[authorBridgeBucketed]] reduces it to the
    * distinct (DOI, AuthorID) bridge. */
  private val bridgeKey = Seq("FullName", "Country", "University")

  /** The ONE-TIME layout step: write the exploded distinct (DOI,
    * natural-key) pairs and the authors dim as co-bucketed + sorted
    * tables. Run once per corpus version; every downstream
    * [[authorBridgeBucketedJoin]] then joins shuffle-free. Table names
    * are caller-chosen so concurrent pipelines don't clobber each
    * other's layouts. */
  def writeBucketedAuthorTables(clean: DataFrame, authorsDim: DataFrame,
      buckets: Int, pairsTable: String, authorsTable: String): Unit = {
    val pairs = clean
      .select(col("doi").as("DOI"), explode(col("authors_with_affiliations")).as("a"))
      .select(col("DOI"),
        col("a.author").as("FullName"),
        col("a.country").as("Country"),
        col("a.university").as("University"))
      .distinct()
    pairs.write.bucketBy(buckets, bridgeKey.head, bridgeKey.tail: _*)
      .sortBy(bridgeKey.head, bridgeKey.tail: _*)
      .mode("overwrite").saveAsTable(pairsTable)
    authorsDim.write.bucketBy(buckets, bridgeKey.head, bridgeKey.tail: _*)
      .sortBy(bridgeKey.head, bridgeKey.tail: _*)
      .mode("overwrite").saveAsTable(authorsTable)
  }

  /** The repeatable read step: zero-Exchange sort-merge join over the
    * tables [[writeBucketedAuthorTables]] laid out. */
  def authorBridgeBucketedJoin(spark: SparkSession,
      pairsTable: String, authorsTable: String): DataFrame =
    spark.table(pairsTable).join(spark.table(authorsTable), bridgeKey)

  /** Bucketed author bridge: same rows as [[authorBridge]], shuffle
    * only at the final distinct — never on the join. Convenience that
    * runs layout + join in one call; production splits the two. */
  def authorBridgeBucketed(spark: SparkSession, clean: DataFrame,
      authorsDim: DataFrame, buckets: Int = 8,
      pairsTable: String = "graft_bucketed_author_pairs",
      authorsTable: String = "graft_bucketed_authors"): DataFrame = {
    writeBucketedAuthorTables(clean, authorsDim, buckets, pairsTable, authorsTable)
    authorBridgeBucketedJoin(spark, pairsTable, authorsTable)
      .select("DOI", "AuthorID").distinct()
  }

  // ---- CompatMode: byte-faithful reference quirks ------------------
  //
  // The default build fixes the reference's dimension bugs (SURVEY §7
  // hazard 2). These variants reproduce the measured reference
  // behavior instead, for users who need drop-in numeric parity with
  // DB/Tables/*.csv:

  /** keywords dim exactly as c33: one row PER INSTANCE (27,317 rows vs
    * 7,336 distinct strings in the reference), ids assigned by
    * monotonically_increasing_id — partition-dependent, sparse. */
  def keywordsCompat(clean: DataFrame): DataFrame =
    clean.select(explode(col("keywords")).as("Keyword"))
      .withColumn("KeywordID", monotonically_increasing_id())
      .select("KeywordID", "Keyword")

  /** authors dim exactly as c39: id BEFORE distinct — the distinct can
    * never collapse natural-key duplicates (19,967 vs 17,696 in the
    * reference). */
  def authorsCompat(clean: DataFrame): DataFrame =
    clean.select(explode(col("authors_with_affiliations")).as("a"))
      .select(
        col("a.author").as("FullName"),
        col("a.country").as("Country"),
        col("a.university").as("University"))
      .withColumn("AuthorID", monotonically_increasing_id())
      .distinct()
      .select("AuthorID", "FullName", "Country", "University")

  /** author bridge exactly as c43: explode, join on FullName ONLY
    * (not the natural key — same-named authors at different
    * universities all match), against the per-instance compat dim, no
    * pair dedup. Reproduces the reference's 42,595-row bridge shape;
    * ids are consistent with [[authorsCompat]]'s, which the
    * default-mode bridge's dense ids are not. */
  def authorBridgeCompat(clean: DataFrame, authorsCompatDim: DataFrame): DataFrame =
    clean.select(col("doi").as("DOI"),
        explode(col("authors_with_affiliations")).as("a"))
      .select(col("DOI"), col("a.author").as("FullName"))
      .join(authorsCompatDim.select("AuthorID", "FullName"), Seq("FullName"))
      .select("DOI", "AuthorID")

  /** keyword bridge exactly as c45: join on the keyword string against
    * the per-instance compat dim (one dim row per OCCURRENCE), no
    * dedup — every duplicate dim instance fans the bridge out. */
  def keywordBridgeCompat(clean: DataFrame, keywordsCompatDim: DataFrame): DataFrame =
    clean.select(col("doi").as("DOI"), explode(col("keywords")).as("Keyword"))
      .join(keywordsCompatDim, Seq("Keyword"))
      .select("DOI", "KeywordID")

  /** All eight tables in one pass. */
  case class Star(
      articles: DataFrame, publishers: DataFrame, keywords: DataFrame,
      topics: DataFrame, dates: DataFrame, authors: DataFrame,
      authorArticle: DataFrame, keywordArticle: DataFrame)

  def build(clean: DataFrame): Star = {
    val t = topics(clean); val d = dates(clean)
    val k = keywords(clean); val a = authors(clean)
    Star(
      articles = articles(clean, t, d),
      publishers = publishers(clean),
      keywords = k, topics = t, dates = d, authors = a,
      authorArticle = authorBridge(clean, a),
      keywordArticle = keywordBridge(clean, k))
  }
}
