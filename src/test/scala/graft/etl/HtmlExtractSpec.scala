package graft.etl

import org.apache.spark.sql.Row
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** HtmlExtract — the S4/S5 per-field extractors as expressions. The
  * fixtures mirror the live pages' id/class anatomy (the selectors the
  * reference drives with Selenium); assertions pin the reference's
  * field semantics including failure sentinels and the two different
  * affiliation split rules. */
class HtmlExtractSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private val ieeePage =
    """<html><body>
      |<h1 class="document-title text-2xl-md-lh"> <span>Deep Testing of Engines</span></h1>
      |<div class="authors-accordion-container"><a href="/a/1">Ada Lovelace</a>
      |<p class="author-affiliation">Dept of CS, Univ of X, France View Profile</p></div>
      |<div class="authors-accordion-container"><a href="/a/2">Alan Turing</a>
      |<p class="author-affiliation">Standalone Institute</p></div>
      |<div class="u-pb-1 doc-abstract-pubdate">Date of Publication: 15 March 2021</div>
      |<div xplmathjax>This paper studies engines.</div>
      |<a class="stats-doi" href="https://doi.org/10.1109/TEST.2021.42">10.1109/TEST.2021.42</a>
      |<button class="document-banner-metric"><div class="document-banner-metric-count">
      |17</div></button>
      |<div class="stats-document-abstract-publishedIn">Published in: IEEE Transactions on Testing (Early Access)</div>
      |<li class="doc-keywords-item"><strong>IEEE Keywords</strong>
      |<ul class="List--inline"><li><a href="/k/1">testing</a></li><li><a href="/k/2">engines</a></li></ul></li>
      |<div><strong>Electronic ISSN:</strong> 1558-2868</div>
      |</body></html>""".stripMargin

  private val sdPage =
    """<html><body>
      |<span class="title-text" id="screen-reader-main-title">Continuous Delivery at Scale</span>
      |<div class="author-group">
      |<button class="author"><span class="given-name">Grace</span><span class="surname">Hopper</span><span class="author-ref"><sup>1</sup></span><span class="author-ref"><sup>2</sup></span></button>
      |<button class="author"><span class="given-name">Edsger</span><span class="surname">Dijkstra</span><span class="author-ref"><sup>2</sup></span></button>
      |</div>
      |<dl class="affiliation"><dt><sup>1</sup></dt><dd>Dept of SE, Univ of Y, Netherlands</dd></dl>
      |<dl class="affiliation"><dt><sup>2</sup></dt><dd>PlainInstitute</dd></dl>
      |<p class="u-margin-s-bottom">Received 1 January 2022, Revised 2 February 2022, Accepted 3 March 2022, Available online 30 April 2022, Version of Record 5 May 2022.</p>
      |<div id="abstracts">DevOps pipelines considered helpful.</div>
      |<a class="anchor doi anchor-primary" href="https://doi.org/10.1016/j.jss.2022.99999"><span>doi link</span></a>
      |<header id="citing-articles-header"><h2>Cited by (7)</h2></header>
      |<div class="keywords-section"><div class="keyword">devops</div><div class="keyword">delivery</div></div>
      |<h2 id="publication-title">Journal of Systems and Software</h2>
      |</body></html>""".stripMargin

  private def parse(site: String, page: String): Row =
    HtmlExtract.parsePages(Seq(page).toDF("body"), "body", site).collect().head

  test("ieee: every field extracts with reference semantics") {
    val r = parse("ieee", ieeePage)
    def s(n: String) = r.getAs[String](n)
    assert(s("title") === "Deep Testing of Engines")
    assert(s("abstract") === "This paper studies engines.")
    assert((s("Date"), s("Day"), s("Month"), s("Year")) ===
      (("15 March 2021", "15", "March", "2021")))
    assert(s("doi") === "https://doi.org/10.1109/TEST.2021.42")
    assert(r.getAs[Double]("citations") === 17.0)
    assert(s("journal_name") === "IEEE Transactions on Testing")
    assert(s("ISSN") === "15582868")
    assert(r.getAs[scala.collection.Seq[String]]("keywords").toSeq === Seq("testing", "engines"))
    assert(r.getAs[scala.collection.Seq[String]]("authors").toSeq === Seq("Ada Lovelace", "Alan Turing"))
    // last-", "-split: university = all but last part, country = last;
    // a comma-less affiliation keeps country '' (IEEE.py:199-206)
    val awa = r.getAs[scala.collection.Seq[Row]]("authors_with_affiliations").toSeq
      .map(a => (a.getAs[String]("author"), a.getAs[String]("university"),
        a.getAs[String]("country")))
    assert(awa === Seq(
      ("Ada Lovelace", "Dept of CS, Univ of X", "France"),
      ("Alan Turing", "Standalone Institute", "")))
    assert(r.getAs[scala.collection.Seq[String]]("countries").toSeq === Seq("France", ""))
    assert(s("topic") === "AI" && s("website") === "IEEE Xplore" &&
      s("type") === "RESEARCH-ARTICLE")
  }

  test("ieee: missing fields degrade to the reference's sentinels") {
    val r = parse("ieee", "<html><body><p>nothing here</p></body></html>")
    assert(r.getAs[String]("title") === "Title not found")
    assert(r.getAs[String]("abstract") === "Abstract not found")
    assert(r.getAs[String]("doi") === "DOI not found")
    assert(r.getAs[String]("journal_name") === "Published in not found")
    assert(r.isNullAt(r.fieldIndex("citations"))) // get_total_citations → None
    assert(r.isNullAt(r.fieldIndex("Date")))      // strptime failure → key absent
    assert(r.getAs[scala.collection.Seq[String]]("authors").toSeq === Seq.empty)
    assert(r.getAs[scala.collection.Seq[String]]("keywords").toSeq === Seq.empty)
    assert(r.getAs[String]("ISSN") === "")
  }

  test("sd: every field extracts, including the sup→affiliation mapping") {
    val r = parse("sciencedirect", sdPage)
    def s(n: String) = r.getAs[String](n)
    assert(s("title") === "Continuous Delivery at Scale")
    assert(s("abstract") === "DevOps pipelines considered helpful.")
    // the FOURTH date is "Available online" (ScienceDirect.py:247-252)
    assert((s("Date"), s("Day"), s("Month"), s("Year")) ===
      (("30 April 2022", "30", "April", "2022")))
    assert(s("doi") === "https://doi.org/10.1016/j.jss.2022.99999")
    assert(r.getAs[Double]("citations") === 7.0)
    assert(s("journal_name") === "Journal of Systems and Software")
    assert(r.getAs[scala.collection.Seq[String]]("keywords").toSeq === Seq("devops", "delivery"))
    assert(r.getAs[scala.collection.Seq[String]]("authors").toSeq === Seq("Grace Hopper", "Edsger Dijkstra"))
    // sup mapping: Hopper has sups {1,2} → both affiliations; Dijkstra
    // {2} → only PlainInstitute (comma-less → country "Unknown",
    // ScienceDirect.py:115-126)
    val awa = r.getAs[scala.collection.Seq[Row]]("authors_with_affiliations").toSeq
      .map(a => (a.getAs[String]("author"), a.getAs[String]("university"),
        a.getAs[String]("country")))
    assert(awa === Seq(
      ("Grace Hopper", "Dept of SE, Univ of Y", "Netherlands"),
      ("Grace Hopper", "PlainInstitute", "Unknown"),
      ("Edsger Dijkstra", "PlainInstitute", "Unknown")))
    // page-level lists dedup preserving order (ScienceDirect.py:194-231)
    assert(r.getAs[scala.collection.Seq[String]]("universities").toSeq ===
      Seq("Dept of SE, Univ of Y", "PlainInstitute"))
    assert(r.getAs[scala.collection.Seq[String]]("countries").toSeq === Seq("Netherlands", "Unknown"))
    assert(s("topic") === "DevOps" && s("website") === "Science Direct")
  }

  test("sd: failures degrade to the reference's sentinels (strings and 0)") {
    val r = parse("sciencedirect", "<html><body>empty</body></html>")
    assert(r.getAs[String]("title") === "")    // extract_titles catches → ""
    assert(r.getAs[String]("abstract") === "")
    assert(r.getAs[String]("doi") === "")
    assert(r.getAs[String]("journal_name") === "")
    assert(r.getAs[Double]("citations") === 0.0) // SD defaults 0, not null
    assert((r.getAs[String]("Date"), r.getAs[String]("Day"),
      r.getAs[String]("Month"), r.getAs[String]("Year")) ===
      (("Date not found", "Day not found", "Month not found", "Year not found")))
    assert(r.getAs[scala.collection.Seq[String]]("authors").toSeq === Seq.empty)
  }

  test("sd: mismatched given/surname counts yield no authors (the reference guard)") {
    val page = """<span class="given-name">A</span><span class="given-name">B</span>
                 |<span class="surname">X</span>""".stripMargin
    val r = parse("sciencedirect", page)
    assert(r.getAs[scala.collection.Seq[String]]("authors").toSeq === Seq.empty)
  }

  test("ieee: nested inline markup contributes its text (Selenium .text semantics)") {
    // the r8 review's gap: Selenium's .text returns the full subtree
    // text, so a title with <i>/<sub>, a MathJax span inside the
    // abstract, or a linked journal name must not truncate the field
    val page =
      """<html><body>
        |<h1 class="document-title"> <span>Deep <i>Testing</i> of <sub>k</sub>-Engines</span></h1>
        |<div xplmathjax>We bound <span class="MathJax">O(n log n)</span> regret.</div>
        |<div class="stats-document-abstract-publishedIn">Published in: <a href="/j">IEEE Letters</a> (Early Access)</div>
        |<div class="authors-accordion-container"><a href="/a"><span>Ada</span> Lovelace</a>
        |<p class="author-affiliation">Dept <b>of CS</b>, France View Profile</p></div>
        |</body></html>""".stripMargin
    val r = parse("ieee", page)
    assert(r.getAs[String]("title") === "Deep Testing of k-Engines")
    assert(r.getAs[String]("abstract") === "We bound O(n log n) regret.")
    assert(r.getAs[String]("journal_name") === "IEEE Letters")
    assert(r.getAs[scala.collection.Seq[String]]("authors").toSeq === Seq("Ada Lovelace"))
    val awa = r.getAs[scala.collection.Seq[Row]]("authors_with_affiliations").toSeq
      .map(a => (a.getAs[String]("university"), a.getAs[String]("country")))
    assert(awa === Seq(("Dept of CS", "France")))
  }

  test("sd: nested markup in title/abstract/keywords/dd contributes text") {
    val page =
      """<html><body>
        |<span class="title-text" id="screen-reader-main-title">CD at <em>Scale</em></span>
        |<div id="abstracts">Pipelines <span class="math">O(1)</span> helpful.</div>
        |<dl class="affiliation"><dt><sup>1</sup></dt><dd>Dept of SE, <span>Univ of Y</span>, Netherlands</dd></dl>
        |<button class="author"><span class="given-name">Grace <b>B.</b></span><span class="surname">Hopper</span><span class="author-ref"><sup>1</sup></span></button>
        |<div class="keyword"><span>devops</span></div>
        |<h2 id="publication-title">Journal of <i>Systems</i></h2>
        |</body></html>""".stripMargin
    val r = parse("sciencedirect", page)
    assert(r.getAs[String]("title") === "CD at Scale")
    assert(r.getAs[String]("abstract") === "Pipelines O(1) helpful.")
    assert(r.getAs[scala.collection.Seq[String]]("keywords").toSeq === Seq("devops"))
    assert(r.getAs[String]("journal_name") === "Journal of Systems")
    assert(r.getAs[scala.collection.Seq[String]]("authors").toSeq === Seq("Grace B. Hopper"))
    val awa = r.getAs[scala.collection.Seq[Row]]("authors_with_affiliations").toSeq
      .map(a => (a.getAs[String]("author"), a.getAs[String]("university"),
        a.getAs[String]("country")))
    assert(awa === Seq(("Grace B. Hopper", "Dept of SE, Univ of Y", "Netherlands")))
  }

  test("extracted fields are ingest-compatible with the article schema") {
    // the parsed relation must slot into the merged-article pipeline:
    // every column it emits exists in Schemas.articleSchema with a
    // compatible type family (arrays stay arrays, strings strings)
    val parsed = HtmlExtract.parsePages(Seq(ieeePage).toDF("body"), "body", "ieee")
    val ref = Schemas.articleSchema.fields.map(f => f.name -> f.dataType).toMap
    parsed.schema.fields.filterNot(f => Set("universities").contains(f.name))
      .foreach { f =>
        assert(ref.contains(f.name), s"field ${f.name} not in articleSchema")
        assert(ref(f.name).typeName === f.dataType.typeName ||
          (ref(f.name).typeName == "array" && f.dataType.typeName == "array"),
          s"field ${f.name}: ${f.dataType} vs schema ${ref(f.name)}")
      }
  }

  test("rendered-text parity: <br>/block boundaries separate, inline tags glue") {
    // Selenium .text renders a line break at <br> and block edges but
    // NOTHING at inline tags: 'regret.<br>We' must not glue into
    // 'regret.We', while 'x<i>y</i>z' really renders as 'xyz'
    val page = ieeePage.replace("This paper studies engines.",
      "We study regret.<br>We show x<i>y</i>z bounds.<p>New block.</p>")
    val r = parse("ieee", page)
    assert(r.getAs[String]("abstract") ===
      "We study regret. We show xyz bounds. New block.")
    // the MIT<br>Cambridge affiliation case: the ', ' split must see
    // separated tokens, not 'MITCambridge'
    val page2 = ieeePage.replace(
      "Dept of CS, Univ of X, France View Profile",
      "MIT<br>Cambridge, USA View Profile")
    val awa = parse("ieee", page2)
      .getAs[scala.collection.Seq[Row]]("authors_with_affiliations").toSeq
      .map(a => (a.getAs[String]("university"), a.getAs[String]("country")))
    assert(awa.head === (("MIT Cambridge", "USA")))
    // table cells and <hr> are rendered boundaries too: adjacent
    // </td><td> must not glue cell contents
    val page3 = ieeePage.replace("This paper studies engines.",
      "<table><tr><td>Dept of CS</td><td>France</td></tr></table><hr>End.")
    assert(parse("ieee", page3).getAs[String]("abstract") ===
      "Dept of CS France End.")
  }

  test("unknown site profile fails loudly") {
    val e = intercept[IllegalArgumentException](
      HtmlExtract.parsePages(Seq("x").toDF("body"), "body", "arxiv"))
    assert(e.getMessage.contains("unknown site profile"))
  }
}
