package graft.etl

import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Path}

import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** End-to-end pipeline over FIXTURES.md-shaped files: the four raw-file
  * variants with sentinels, mixed Day/Year types, mojibake, emails in
  * countries, empty arrays and null citations — the reference's mess.
  */
class EtlPipelineSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  def write(dir: Path, name: String, content: String): String = {
    val p = dir.resolve(name)
    Files.write(p, content.getBytes(StandardCharsets.UTF_8))
    p.toString
  }

  lazy val dir: Path = Files.createTempDirectory("graft-fixtures")

  // SD raw: journal_name, no publisher; A2 carries date sentinels
  lazy val sdRaw = write(dir, "sd_raw.json",
    """[
      |{"title": "Alpha Paper", "authors": ["Ann A"], "authors_with_affiliations": [{"author": "Ann A", "university": "Uni X", "country": "France", "location": "Uni X, France"}], "universities": ["Uni X"], "countries": ["France"], "Date": "19 July 2024", "Month": "July", "Day": 19, "Year": 2024, "abstract": "An abstract.", "doi": "https://doi.org/10.1016/a1", "citations": 3, "type": "RESEARCH-ARTICLE", "keywords": ["ai", "ml"], "topic": "AI", "website": "Science Direct", "journal_name": "Journal A"},
      |{"title": "Title not found", "authors": ["Bob B"], "authors_with_affiliations": [{"author": "Bob B", "university": "Uni Y", "country": "Spain", "location": "Uni Y, Spain"}], "universities": ["Uni Y"], "countries": ["Spain"], "Date": "Date not found", "Month": "Month not found", "Day": "Day not found", "Year": "Year not found", "abstract": "Sentinel row.", "doi": "https://doi.org/10.1016/a2", "citations": 1, "type": "RESEARCH-ARTICLE", "keywords": ["iot"], "topic": "IoT", "website": "Science Direct", "journal_name": "Journal S"}
      |]""".stripMargin)

  // SD upd: publisher struct; A1 enriched (dedup must prefer this row),
  // A3 good, A4 has ISSN N/A (P1 drops it)
  lazy val sdUpd = write(dir, "sd_upd.json",
    """[
      |{"title": "Alpha Paper", "authors": ["Ann A"], "authors_with_affiliations": [{"author": "Ann A", "university": "Uni X", "country": "France", "location": "Uni X, France"}], "universities": ["Uni X"], "countries": ["France"], "Date": "19 July 2024", "Month": "July", "Day": 19, "Year": 2024, "abstract": "An abstract.", "doi": "https://doi.org/10.1016/a1", "citations": 3, "type": "RESEARCH-ARTICLE", "keywords": ["ai", "ml"], "topic": "AI", "website": "Science Direct", "publisher": {"name": "Journal A", "ISSN": "11112222", "Quartile": "Q1"}},
      |{"title": "Gamma Study", "authors": ["Cara C", "Dan D"], "authors_with_affiliations": [{"author": "Cara C", "university": "Uni Z", "country": "USA", "location": "Uni Z, USA"}, {"author": "Dan D", "university": "Uni Z", "country": "USA", "location": "Uni Z, USA"}], "universities": ["Uni Z"], "countries": ["USA"], "Date": "2 March 2023", "Month": "March", "Day": 2, "Year": 2023, "abstract": "Gamma text.", "doi": "https://doi.org/10.1016/a3", "citations": 0, "type": "RESEARCH-ARTICLE", "keywords": ["ai"], "topic": "AI", "website": "Science Direct", "publisher": {"name": "Journal G", "ISSN": "33334444", "Quartile": "Q2"}},
      |{"title": "Delta Note", "authors": ["Eve E"], "authors_with_affiliations": [{"author": "Eve E", "university": "Uni W", "country": "UK", "location": "Uni W, UK"}], "universities": ["Uni W"], "countries": ["UK"], "Date": "5 May 2022", "Month": "May", "Day": 5, "Year": 2022, "abstract": "Delta text.", "doi": "https://doi.org/10.1016/a4", "citations": 2, "type": "RESEARCH-ARTICLE", "keywords": ["crypto"], "topic": "Cryptography", "website": "Science Direct", "publisher": {"name": "Journal D", "ISSN": "N/A", "Quartile": "Q3"}}
      |]""".stripMargin)

  // IEEE raw: top-level ISSN + locations, int Day/Year
  lazy val ieeeRaw = write(dir, "ieee_raw.json",
    """[
      |{"title": "Beta Method", "authors": ["Flo F"], "authors_with_affiliations": [{"author": "Flo F", "university": "Inst Q", "country": "PRC", "location": "Inst Q, PRC"}], "universities": ["Inst Q"], "countries": ["PRC"], "locations": ["Inst Q, PRC"], "Date": "1 January 2021", "Month": "January", "Day": 1, "Year": 2021, "abstract": "Beta text.", "doi": "https://doi.org/10.1109/b1", "citations": 7, "type": "RESEARCH-ARTICLE", "keywords": ["big data"], "topic": "Big Data", "website": "IEEE Xplore", "journal_name": "IEEE Trans B", "ISSN": "55556666"}
      |]""".stripMargin)

  // IEEE upd: B1 enriched; B2 null citations; B3 empty authors;
  // B4 mojibake + email artifacts + apostrophes/quotes
  lazy val ieeeUpd = write(dir, "ieee_upd.json",
    """[
      |{"title": "Beta Method", "authors": ["Flo F"], "authors_with_affiliations": [{"author": "Flo F", "university": "Inst Q", "country": "PRC", "location": "Inst Q, PRC"}], "universities": ["Inst Q"], "countries": ["PRC"], "locations": ["Inst Q, PRC"], "Date": "1 January 2021", "Month": "January", "Day": 1, "Year": 2021, "abstract": "Beta text.", "doi": "https://doi.org/10.1109/b1", "citations": 7, "type": "RESEARCH-ARTICLE", "keywords": ["big data"], "topic": "Big Data", "website": "IEEE Xplore", "publisher": {"name": "IEEE Trans B", "ISSN": "55556666", "Quartile": "Q1"}},
      |{"title": "No Citations", "authors": ["Gil G"], "authors_with_affiliations": [{"author": "Gil G", "university": "Inst R", "country": "Japan", "location": "Inst R, Japan"}], "universities": ["Inst R"], "countries": ["Japan"], "locations": [], "Date": "9 June 2020", "Month": "June", "Day": 9, "Year": 2020, "abstract": "x", "doi": "https://doi.org/10.1109/b2", "citations": null, "type": "RESEARCH-ARTICLE", "keywords": ["devops"], "topic": "DevOps", "website": "IEEE Xplore", "publisher": {"name": "IEEE Trans B", "ISSN": "55556666", "Quartile": "Q1"}},
      |{"title": "Empty Authors", "authors": [], "authors_with_affiliations": [], "universities": [], "countries": [], "locations": [], "Date": "9 June 2020", "Month": "June", "Day": 9, "Year": 2020, "abstract": "y", "doi": "https://doi.org/10.1109/b3", "citations": 4, "type": "RESEARCH-ARTICLE", "keywords": ["devops"], "topic": "DevOps", "website": "IEEE Xplore", "publisher": {"name": "IEEE Trans B", "ISSN": "55556666", "Quartile": "Q1"}},
      |{"title": "Hal's \"Grand\" Theory", "authors": ["Hal H"], "authors_with_affiliations": [{"author": "Hal H", "university": "Inst S", "country": "h.h@inst.edu", "location": "x"}, {"author": "Hal H", "university": "Inst S", "country": "Republic of Korea", "location": "Inst S, Korea"}], "universities": ["Inst S"], "countries": ["Republic of Korea", "h.h@inst.edu"], "locations": [], "Date": "20 February 2024", "Month": "February", "Day": 20, "Year": 2024, "abstract": "CafÃ© rÃ©sumÃ© text.", "doi": "https://doi.org/10.1109/b4", "citations": 11, "type": "RESEARCH-ARTICLE", "keywords": ["blockchain", "ai"], "topic": "Blockchain", "website": "IEEE Xplore", "publisher": {"name": "IEEE Trans C", "ISSN": "77778888", "Quartile": "Q2"}}
      |]""".stripMargin)

  lazy val merged = Ingest.readMerged(spark, Seq(sdRaw, sdUpd, ieeeRaw, ieeeUpd))
  lazy val clean = Clean(merged)
  lazy val star = StarSchema.build(clean)

  test("ingest merges the four variants and dedups doi preferring enriched rows") {
    assert(merged.count() === 8) // 10 raw rows, a1 + b1 deduped
    val a1 = merged.filter(merged("doi") === "https://doi.org/10.1016/a1")
      .select("publisher.Quartile").collect()
    assert(a1.map(_.getString(0)).toSeq === Seq("Q1")) // upd row won
    assert(!merged.columns.contains("journal_name"))
  }

  test("cleaning keeps exactly the well-formed rows") {
    val dois = clean.select("doi").collect().map(_.getString(0)).sorted
    // a2 sentinel+unenriched, a4 N/A ISSN, b2 null citations, b3 empty authors drop;
    // doi URLs lose ':/' etc to the F8 whitelist — compare on suffix
    assert(dois.length === 4)
    assert(dois.exists(_.endsWith("a1")) && dois.exists(_.endsWith("a3")) &&
      dois.exists(_.endsWith("b1")) && dois.exists(_.endsWith("b4")))
  }

  test("country canonicalization + email filters applied") {
    val b4 = clean.filter(clean("doi").endsWith("b4")).collect().head
    val countries = b4.getAs[scala.collection.Seq[String]]("countries").toSeq
    assert(countries === Seq("South Korea")) // alias mapped, email removed
    val affs = b4.getAs[scala.collection.Seq[org.apache.spark.sql.Row]]("authors_with_affiliations")
    assert(affs.length === 1) // email-country affiliation removed
    assert(affs.head.getAs[String]("country") === "South Korea")
  }

  test("unicode repair + whitelist clean on text columns") {
    val b4 = clean.filter(clean("doi").endsWith("b4")).collect().head
    assert(b4.getAs[String]("abstract") === "Café résumé text")
    // double quotes stripped by F8, apostrophe kept
    assert(b4.getAs[String]("title") === "Hal's Grand Theory")
  }

  test("cleanStrings deletes newlines with no joining space (reference byte parity)") {
    import spark.implicits._
    // ETL.ipynb c25: whitelist keeps \s, then replace('\n','') merges
    // adjacent words; \r and \t survive untouched
    val got = Clean.cleanStrings(Seq("line one\nline two\t(x)\r!").toDF("s"))
      .collect().head.getString(0)
    assert(got === "line oneline two\tx\r")
  }

  test("star schema: dense deterministic keys, deduped dims, distinct bridges") {
    val authorIds = star.authors.select("AuthorID").collect().map(_.getLong(0)).sorted
    assert(authorIds === authorIds.indices.map(_.toLong).toArray.toSeq) // dense 0..n-1
    // Cara C + Dan D + Ann A + Eve(dropped a4) ... count distinct natural keys
    assert(star.authors.count() === star.authors.dropDuplicates("FullName", "Country", "University").count())
    assert(star.keywords.count() === star.keywords.dropDuplicates("Keyword").count())
    assert(star.authorArticle.count() === star.authorArticle.distinct().count())
    // FK integrity: every fact TopicID resolves
    assert(star.articles.filter(star.articles("TopicID").isNull).count() === 0)
    assert(star.articles.count() === 4)
  }

  test("compat mode reproduces the reference's dimension quirks") {
    // keyword dim keeps one row per instance (the reference's
    // 27,317-vs-7,336 behavior)
    val inst = clean.select(org.apache.spark.sql.functions.explode(
      org.apache.spark.sql.functions.col("keywords"))).count()
    assert(StarSchema.keywordsCompat(clean).count() === inst)
    assert(StarSchema.keywords(clean).count() <= inst)
    // author compat ids are sparse (partition-encoded), not dense
    val maxId = StarSchema.authorsCompat(clean.repartition(4))
      .agg(org.apache.spark.sql.functions.max("AuthorID"))
      .collect().head.getLong(0)
    val n = StarSchema.authorsCompat(clean).count()
    assert(maxId >= n - 1)
  }

  test("star schema keys are stable under repartition") {
    val k1 = star.keywords.collect().map(r => (r.getLong(0), r.getString(1))).toSet
    val k2 = StarSchema.keywords(clean.repartition(7)).collect()
      .map(r => (r.getLong(0), r.getString(1))).toSet
    assert(k1 === k2)
  }

  test("insert generator escaping matches the reference semantics") {
    import spark.implicits._
    val df = Seq(("O'Brien", Some(2.5)), ("Plain", None))
      .toDF("FullName", "Score")
    val stmts = Writers.insertStatements(df, "authors")
      .collect().map(_.getString(0)).sorted
    assert(stmts.contains("INSERT INTO authors (FullName, Score) VALUES ('O''Brien', 2.5);"))
    assert(stmts.contains("INSERT INTO authors (FullName, Score) VALUES ('Plain', NULL);"))
  }

  test("json array file writer round-trips through the ingest reader") {
    val out = dir.resolve("roundtrip.json").toString
    Writers.writeJsonArrayFile(clean.select("doi", "title", "topic"), out)
    val back = spark.read.option("multiLine", true).json(out)
    assert(back.count() === 4)
  }

  test("quartile as-of enrichment: fallback, exact, out-of-range") {
    import spark.implicits._
    val quartiles = Seq(
      ("Journal A", "11112222", 2015, "Q4"),
      ("Journal A", "11112222", 2020, "Q2"),
      ("Journal G", "33334444", 2010, "Q1"))
      .toDF("journal", "ISSN", "year", "quartile")
    val enriched = Quartiles.enrich(clean, quartiles)
    val q = enriched.select(col("doi"), col("publisher.Quartile"))
      .collect().map(r => (r.getString(0), r.getString(1))).toMap
    def byDoi(suffix: String) = q.find(_._1.endsWith(suffix)).get._2
    assert(byDoi("a1") === "Q2")  // 2024 → as-of 2020 (4 back)
    assert(byDoi("a3") === "")    // 2023 vs 2010: 13 back → out of range
    assert(byDoi("b1") === "")    // journal not in lookup
  }

  test("corrupt JSONL lines are quarantined per row, not per file") {
    val p = write(dir, "landing.jsonl",
      """{"title": "Good 1", "doi": "https://doi.org/10.1016/q1", "topic": "AI", "citations": 1}
        |{"title": "Good 2", "doi": "https://doi.org/10.1016/q2", "topic": "IoT", "citations": 2}
        |{"title": "TRUNCATED, no close quote, "doi": !!!
        |{"title": "Good 3", "doi": "https://doi.org/10.1016/q3", "topic": "AI", "citations": 3}""".stripMargin)
    val (good, bad) = Ingest.quarantine(Ingest.readArticlesJsonlSafe(spark, p))
    assert(good.count() === 3)
    assert(good.filter(col("doi").isNull).count() === 0)
    val rows = bad.collect()
    assert(rows.length === 1)
    assert(rows.head.getString(0).contains("TRUNCATED"))
  }

  test("normalize keeps every NULL-doi row (missing key is not a shared key)") {
    // three distinct articles without a doi + one real dup pair
    val p = write(dir, "nodoi.json",
      """[
        |{"title": "NoDoi One", "topic": "AI", "website": "IEEE Xplore", "journal_name": "J1"},
        |{"title": "NoDoi Two", "topic": "AI", "website": "IEEE Xplore", "journal_name": "J1"},
        |{"title": "NoDoi Three", "topic": "IoT", "website": "IEEE Xplore", "journal_name": "J1"},
        |{"title": "Dup", "doi": "https://doi.org/10.1109/z1", "topic": "AI", "website": "IEEE Xplore", "journal_name": "J1"},
        |{"title": "Dup", "doi": "https://doi.org/10.1109/z1", "topic": "AI", "website": "IEEE Xplore", "journal_name": "J2"}
        |]""".stripMargin)
    val norm = Ingest.normalize(Ingest.readArticles(spark, p))
    assert(norm.filter(col("doi").isNull).count() === 3) // all three survive
    assert(norm.count() === 4)                           // dup pair still dedups
  }

  test("normalize routes NULL-doi rows AROUND the window (no single-task skew)") {
    // every null doi hashes to ONE window partition; at scale a 10%
    // doi-less corpus would put 10% of the data on one task just to be
    // kept verbatim. Plan shape: the Window's input subtree must filter
    // to isnotnull(doi), and the null branch must be window-free.
    val p = write(dir, "nodoi_plan.json",
      """[
        |{"title": "NoDoi One", "topic": "AI", "website": "IEEE Xplore", "journal_name": "J1"},
        |{"title": "WithDoi", "doi": "https://doi.org/10.1109/z9", "topic": "AI", "website": "IEEE Xplore", "journal_name": "J1"}
        |]""".stripMargin)
    val norm = Ingest.normalize(Ingest.readArticles(spark, p))
    import org.apache.spark.sql.catalyst.plans.logical.{Window => LWindow}
    val opt = norm.queryExecution.optimizedPlan
    val windows = opt.collect { case w: LWindow => w }
    assert(windows.size === 1, s"expected exactly one window branch:\n$opt")
    assert(windows.head.exists {
      case f: org.apache.spark.sql.catalyst.plans.logical.Filter =>
        f.condition.exists {
          case org.apache.spark.sql.catalyst.expressions.IsNotNull(a) =>
            a.references.map(_.name).toSeq.contains("doi")
          case _ => false
        }
      case _ => false
    }, s"window must consume only doi-not-null rows:\n${windows.head}")
    // and the output is still exactly right
    assert(norm.count() === 2)
    assert(norm.filter(col("doi").isNull).count() === 1)
  }

  test("normalize survivor choice is deterministic across partitionings") {
    // same doi, same preference tier, same website — only the content
    // hash tie-break distinguishes; survivor must not depend on layout
    val p = write(dir, "tie.json",
      """[
        |{"title": "Tie A", "doi": "https://doi.org/10.1109/t1", "topic": "AI", "website": "IEEE Xplore", "journal_name": "J1"},
        |{"title": "Tie B", "doi": "https://doi.org/10.1109/t1", "topic": "AI", "website": "IEEE Xplore", "journal_name": "J1"}
        |]""".stripMargin)
    val raw = Ingest.readArticles(spark, p)
    val t1 = Ingest.normalize(raw).select("title").collect().map(_.getString(0)).toSeq
    val t2 = Ingest.normalize(raw.repartition(7)).select("title").collect().map(_.getString(0)).toSeq
    val t3 = Ingest.normalize(raw.coalesce(1)).select("title").collect().map(_.getString(0)).toSeq
    assert(t1 === t2 && t2 === t3)
  }

  test("date-sentinel filter keeps NULL-field rows (reference subtract parity)") {
    import spark.implicits._
    // subtract removes only rows where a predicate is TRUE; NULL
    // fields make it NULL → row kept (ETL.ipynb c14)
    val df = Seq(
      (Option("5 March 2021"), Option("2021"), Option("5"), Option("March")),
      (Option("5 March 2021"), None, Option("5"), Option("March")),  // null Year: keep
      (None, None, None, None),                                      // all null: keep
      (Option("Date not found"), Option("2021"), Option("5"), Option("March"))) // sentinel: drop
      .toDF("Date", "Year", "Day", "Month")
    assert(Clean.filterDateSentinels(df).count() === 3)
  }

  test("email filter keeps NULL countries entries, drops NULL-country affiliations (c22 parity)") {
    import spark.implicits._
    val df = Seq(1).toDF("i")
      .select(
        org.apache.spark.sql.functions.expr(
          "array('France', cast(null as string), 'a@b.com')").as("countries"),
        org.apache.spark.sql.functions.expr(
          "array(named_struct('author','A','country','France','location','x','university','U')," +
          " named_struct('author','B','country',cast(null as string),'location','x','university','U')," +
          " named_struct('author','C','country','c@d.edu','location','x','university','U'))")
          .as("authors_with_affiliations"))
    val out = Clean.filterEmails(df).collect().head
    // intent branch: null entry is not an email — kept
    assert(out.getAs[scala.collection.Seq[String]]("countries").toSeq === Seq("France", null))
    // reference-parity branch: the c22 HOF's NULL predicate drops B
    val affs = out.getAs[scala.collection.Seq[org.apache.spark.sql.Row]]("authors_with_affiliations")
    assert(affs.map(_.getAs[String]("author")).toSeq === Seq("A"))
  }

  test("publishers dim emits a co-occurring (Name, Quartile) pair, never a fabricated one") {
    import spark.implicits._
    val cleanLike = Seq(("9999", "Internet of Things", "Q1"), ("9999", "IEEE IoT Journal", "Q2"))
      .toDF("i", "n", "q")
      .select(org.apache.spark.sql.functions.struct(
        col("i").as("ISSN"), col("q").as("Quartile"), col("n").as("name")).as("publisher"))
    val row = StarSchema.publishers(cleanLike).collect().head
    // min(struct): lexicographic-min PAIR — independent mins would
    // fabricate ("IEEE IoT Journal", "Q1"), which no input row carried
    assert((row.getAs[String]("Name"), row.getAs[String]("Quartile")) ===
      (("IEEE IoT Journal", "Q2")))
  }

  test("dates dim key equals the fact join key — spelling drift cannot fan the fact out") {
    import spark.implicits._
    val cleanLike = Seq(
      ("1 January 2020", "1", "January", "2020"),
      ("1 January 2020", "01", "January", "2020")) // int-vs-string drift
      .toDF("Date", "Day", "Month", "Year")
    val dim = StarSchema.dates(cleanLike)
    assert(dim.count() === 1) // one row per PublicationDate — join-safe
    assert(dim.select("Day").collect().head.getString(0) === "01") // min tuple, deterministic
  }

  private def col(n: String) = org.apache.spark.sql.functions.col(n)
}
