package graft.etl

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** HTML-to-article field extraction (the S4/S5 INNARDS — the last
  * unmodeled piece behind the [[Fetch]] seam): the reference walks a
  * live DOM with per-field Selenium selectors
  * (IEEE/IEEE.py:264-358, ScienceDirect/ScienceDirect.py:290-395);
  * here each selector becomes a `regexp_extract`/`regexp_extract_all`
  * expression over the fetched page STRING — pure codegen'd column
  * work, no UDF, embarrassingly parallel over however many billion
  * pages the fetch stage landed.
  *
  * The anatomy each profile targets is the live page's own ids and
  * classes (`document-title`, `xplmathjax`, `doc-abstract-pubdate`,
  * `screen-reader-main-title`, `abstracts`, `u-margin-s-bottom`, …),
  * in a server-rendered form; a JS-rendered page goes through the
  * fetcher's browser first and lands as rendered HTML. Field
  * semantics replicate the reference, including its failure sentinels
  * ("Title not found", "DOI not found", citations null vs 0) and its
  * two DIFFERENT affiliation split rules: IEEE splits
  * `university, country` at the LAST `", "` with country '' when
  * absent (IEEE.py:199-206); ScienceDirect matches
  * `(.+?),\s*([^,]+)$` with country "Unknown" when unparseable
  * (ScienceDirect.py:115-126).
  *
  * Text fields capture the element's SUBTREE (non-greedy to the
  * closing tag, inner markup stripped) — the Selenium `.text`
  * approximation, so a title with `<i>`, a MathJax `<span>` inside an
  * abstract, or a `<dd>` with a nested span contribute their text
  * instead of truncating the field at the first nested tag. Residual
  * precondition (a regex cannot count nesting): a nested SAME-NAME
  * tag still ends the capture at its first close — on the live pages
  * the targeted leaf-ish fields close before any same-name child.
  */
object HtmlExtract {

  private def ex(html: Column, pattern: String): Column =
    regexp_extract(html, pattern, 1)

  private def exAll(html: Column, pattern: String, group: Int = 1): Column =
    regexp_extract_all(html, lit(pattern), lit(group))

  /** Inner text of a captured subtree, approximating Selenium
    * `.text`'s RENDERED-text semantics: `<br>` and block-EDGE tags
    * (opening or closing `p`/`div`/`li`/…)
    * become a separator (the browser renders a line break there —
    * stripping them to "" would glue 'regret.<br>We' into 'regret.We'
    * and corrupt downstream ', ' affiliation splits), remaining
    * (inline) markup is stripped with no separator (`x<i>y</i>` really
    * renders as "xy"), then whitespace runs collapse to one space and
    * the ends trim — `.text`'s own whitespace normalization. */
  private def innerText(c: Column): Column =
    trim(regexp_replace(regexp_replace(regexp_replace(c,
      """(?i)<(?:br|hr|/?(?:p|div|li|tr|td|th|h[1-6]|dd|dt|ul|ol|table|section|article|blockquote))\b[^>]*>""",
      " "), "<[^>]+>", ""), """\s+""", " "))

  /** Subtree-text capture — see the object scaladoc. `group` > 1 when
    * the pattern backreferences its own tag name (`</\1>`). */
  private def exText(html: Column, pattern: String, group: Int = 1): Column =
    innerText(regexp_extract(html, pattern, group))

  /** exAll + per-element subtree-text normalization. */
  private def exAllText(html: Column, pattern: String, group: Int = 1): Column =
    transform(exAll(html, pattern, group), innerText _)

  /** regexp_extract returns "" on no-match; map that to the
    * reference's per-field failure sentinel. */
  private def orSentinel(c: Column, sentinel: String): Column =
    when(length(trim(c)) > 0, trim(c)).otherwise(lit(sentinel))

  // ---- IEEE Xplore profile (IEEE/IEEE.py:264-358) -------------------

  /** Parse one IEEE article page into the merged-article fields.
    * Returns a struct; `parseIeee` splats it over a page relation. */
  def ieeeArticle(html: Column): Column = {
    // h1.document-title span (IEEE.py:171-175); subtree text — a
    // title with inline <i>/<sub> keeps its full wording
    val title = orSentinel(
      exText(html, """(?s)<h1[^>]*class="[^"]*document-title[^"]*"[^>]*>[^<]*<span[^>]*>(.*?)</span>"""),
      "Title not found")
    // div[@xplmathjax] (IEEE.py:310-313); subtree text — the
    // xplmathjax class exists BECAUSE abstracts carry MathJax spans
    val abstractC = orSentinel(
      exText(html, """(?s)<div[^>]*xplmathjax[^>]*>(.*?)</div>"""),
      "Abstract not found")
    // doc-abstract-pubdate text after ":" (IEEE.py:299-307), then
    // strptime("%d %B %Y") → Date/Day/Month/Year only when the shape
    // matches (failure leaves the keys absent → null here)
    val dateRaw = trim(ex(html,
      """<div[^>]*doc-abstract-pubdate[^>]*>[^:<]*:([^<]+)</div>"""))
    val dayS = regexp_extract(dateRaw, """^([0-9]{1,2}) ([A-Za-z]+) ([0-9]{4})$""", 1)
    val monthS = regexp_extract(dateRaw, """^([0-9]{1,2}) ([A-Za-z]+) ([0-9]{4})$""", 2)
    val yearS = regexp_extract(dateRaw, """^([0-9]{1,2}) ([A-Za-z]+) ([0-9]{4})$""", 3)
    val dateOk = length(dayS) > 0
    // a.href containing doi.org, the FULL URL (IEEE.py:320-325)
    val doi = orSentinel(
      ex(html, """<a[^>]*href="(https?://doi\.org/[^"]+)""""), "DOI not found")
    // document-banner-metric-count int; None on failure (IEEE.py:233-242)
    val citeS = ex(html, """(?s)<div[^>]*document-banner-metric-count[^>]*>[ \t\r\n]*([0-9]+)""")
    val citations = when(length(citeS) > 0, citeS.cast("double"))
    // stats-document-abstract-publishedIn minus "Published in:",
    // "Early Access", and parens (IEEE.py:333-343); subtree text —
    // live pages link the journal name inside this div
    val journalRaw = exText(html,
      """(?s)<div[^>]*stats-document-abstract-publishedIn[^>]*>(.*?)</div>""")
    val journal = orSentinel(
      regexp_replace(regexp_replace(regexp_replace(journalRaw,
        "Published in:", ""), "Early Access", ""), """[()]""", ""),
      "Published in not found")
    // IEEE Keywords section → ul.List--inline li a (IEEE.py:144-165)
    val kwSection = ex(html, """(?s)<strong>IEEE Keywords</strong>(.*?)</ul>""")
    val keywords = exAllText(kwSection, """(?s)<a[^>]*>(.*?)</a>""")
    // authors-accordion-container blocks: <a>name</a> + the affiliation
    // line (the container's second text line minus "View Profile",
    // IEEE.py:178-228); university = all-but-last ", " part, country =
    // last, '' when no comma (IEEE.py:199-206)
    val containers = exAll(html,
      """(?s)<div class="authors-accordion-container">(.*?)</div>""")
    val awa = transform(containers, x => {
      val name = exText(x, """(?s)<a[^>]*>(.*?)</a>""")
      val aff = trim(regexp_replace(
        exText(x, """(?s)<p class="author-affiliation">(.*?)</p>"""),
        "View Profile", ""))
      val parts = split(aff, ", ")
      val many = size(parts) >= 2
      struct(
        name.as("author"),
        when(many, trim(element_at(parts, -1))).otherwise(lit("")).as("country"),
        aff.as("location"),
        when(many, array_join(slice(parts, lit(1), size(parts) - 1), ", "))
          .otherwise(aff).as("university"))
    })
    // Electronic ISSN text after ":", dashes removed (IEEE.py extract_issn)
    val issn = regexp_replace(
      trim(ex(html, """<strong>Electronic ISSN:</strong>([^<]+)""")), "-", "")
    struct(
      when(dateOk, dateRaw).as("Date"),
      when(dateOk, dayS).as("Day"),
      when(dateOk, monthS).as("Month"),
      when(dateOk, yearS).as("Year"),
      abstractC.as("abstract"),
      transform(awa, _.getField("author")).as("authors"),
      awa.as("authors_with_affiliations"),
      citations.as("citations"),
      transform(awa, _.getField("country")).as("countries"),
      doi.as("doi"),
      journal.as("journal_name"),
      issn.as("ISSN"),
      keywords.as("keywords"),
      transform(awa, _.getField("location")).as("locations"),
      title.as("title"),
      lit("AI").as("topic"),
      lit("RESEARCH-ARTICLE").as("type"),
      lit("IEEE Xplore").as("website"),
      transform(awa, _.getField("university")).as("universities"))
  }

  // ---- ScienceDirect profile (ScienceDirect.py:290-395) -------------

  /** Parse one ScienceDirect article page. Field failures replicate
    * the reference: title/abstract/doi degrade to "" (their extractors
    * catch internally), dates to the four "... not found" sentinel
    * STRINGS, citations to 0. */
  def sdArticle(html: Column): Column = {
    // #screen-reader-main-title (ScienceDirect.py:51-57); subtree
    // text to the element's OWN closing tag (backreferenced), so a
    // nested <em>/<math> span contributes its text
    val title = exText(html,
      """(?s)<([a-z0-9]+)[^>]*id="screen-reader-main-title"[^>]*>(.*?)</\1>""",
      group = 2)
    // #abstracts (ScienceDirect.py:158-164) — same subtree rule; a
    // nested same-name child (div in div) still truncates, see the
    // object scaladoc
    val abstractC = exText(html,
      """(?s)<([a-z0-9]+)[^>]*id="abstracts"[^>]*>(.*?)</\1>""", group = 2)
    // given-name/surname pairs, zipped only when counts agree
    // (ScienceDirect.py:59-74)
    val gn = exAllText(html, """(?s)<span class="given-name">(.*?)</span>""")
    val sn = exAllText(html, """(?s)<span class="surname">(.*?)</span>""")
    val authors = when(size(gn) === size(sn),
      zip_with(gn, sn, (g, s) => concat(g, lit(" "), s)))
      .otherwise(array().cast("array<string>"))
    // affiliations: dl.affiliation with <sup>n</sup> + <dd>text</dd>;
    // (.+?),\s*([^,]+)$ split, country "Unknown" when unparseable
    // (ScienceDirect.py:102-126, 194-231)
    val affs = transform(
      exAll(html, """(?s)<dl class="affiliation">(.*?)</dl>"""),
      x => {
        val sup = regexp_extract(x, """<sup>([^<]+)</sup>""", 1)
        val dd = exText(x, """(?s)<dd>(.*?)</dd>""")
        val uni = regexp_extract(dd, """(.+),[ \t]*([^,]+)$""", 1)
        val ctry = regexp_extract(dd, """(.+),[ \t]*([^,]+)$""", 2)
        val ok = length(uni) > 0
        struct(sup.as("sup"),
          when(ok, trim(uni)).otherwise(dd).as("university"),
          when(ok, trim(ctry)).otherwise(lit("Unknown")).as("country"))
      })
    // author buttons carry their affiliation superscripts; an author
    // pairs with every affiliation whose sup appears in their list,
    // deduped globally by (author, university, country) keeping first
    // occurrence — exactly authors_processed (ScienceDirect.py:76-147)
    val buttons = exAll(html, """(?s)<button class="author">(.*?)</button>""")
    val awa = array_distinct(filter(
      flatten(transform(buttons, b => {
        val g = exText(b, """(?s)<span class="given-name">(.*?)</span>""")
        val s = exText(b, """(?s)<span class="surname">(.*?)</span>""")
        val name = when(length(g) > 0 && length(s) > 0,
          concat(g, lit(" "), s)).otherwise(lit("Name not found"))
        val sups = regexp_extract_all(b, lit("""<sup>([^<]+)</sup>"""), lit(1))
        transform(affs, f => struct(
          name.as("author"),
          f.getField("country").as("country"),
          concat(f.getField("university"), lit(", "), f.getField("country"))
            .as("location"),
          f.getField("university").as("university"),
          array_contains(sups, f.getField("sup")).as("ok")))
      })),
      x => x.getField("ok")))
    val awaClean = transform(awa, x => struct(
      x.getField("author").as("author"), x.getField("country").as("country"),
      x.getField("location").as("location"),
      x.getField("university").as("university")))
    // page-level location lists, order-preserving dedup
    // (ScienceDirect.py:194-231)
    val universities = array_distinct(transform(affs, _.getField("university")))
    val countries = array_distinct(transform(affs, _.getField("country")))
    // "Available online" = the FOURTH d-Month-yyyy date in
    // p.u-margin-s-bottom (ScienceDirect.py:239-257); sentinels on miss
    val para = ex(html, """(?s)<p class="u-margin-s-bottom">(.*?)</p>""")
    val dates = exAll(para, """([0-9]{1,2} [A-Za-z]+ [0-9]{4})""")
    val dateOk = size(dates) >= 4
    val d4 = element_at(dates, 4)
    // a.anchor.doi href (ScienceDirect.py:174-186)
    val doi = trim(ex(html, """<a[^>]*class="anchor doi[^"]*"[^>]*href="([^"]+)""""))
    // "Cited by (N)" header; 0 on failure (ScienceDirect.py:273-287)
    val citeS = ex(html,
      """(?s)<header[^>]*id="citing-articles-header"[^>]*>[^<]*<h2[^>]*>[^(<]*\(([0-9]+)\)""")
    val citations = when(length(citeS) > 0, citeS.cast("double")).otherwise(lit(0.0))
    // .keyword elements (ScienceDirect.py:166-172) — live keyword
    // divs wrap their text in a nested span
    val keywords = exAllText(html,
      """(?s)<([a-z0-9]+)[^>]*class="keyword"[^>]*>(.*?)</\1>""", group = 2)
    // #publication-title (ScienceDirect.py:259-270); "" on miss
    val journal = exText(html,
      """(?s)<([a-z0-9]+)[^>]*id="publication-title"[^>]*>(.*?)</\1>""",
      group = 2)
    struct(
      when(dateOk, d4).otherwise(lit("Date not found")).as("Date"),
      when(dateOk, regexp_extract(d4, """^([0-9]{1,2})""", 1))
        .otherwise(lit("Day not found")).as("Day"),
      when(dateOk, regexp_extract(d4, """ ([A-Za-z]+) """, 1))
        .otherwise(lit("Month not found")).as("Month"),
      when(dateOk, regexp_extract(d4, """([0-9]{4})$""", 1))
        .otherwise(lit("Year not found")).as("Year"),
      abstractC.as("abstract"),
      authors.as("authors"),
      awaClean.as("authors_with_affiliations"),
      citations.as("citations"),
      countries.as("countries"),
      doi.as("doi"),
      journal.as("journal_name"),
      keywords.as("keywords"),
      title.as("title"),
      lit("DevOps").as("topic"),
      lit("RESEARCH-ARTICLE").as("type"),
      lit("Science Direct").as("website"),
      universities.as("universities"))
  }

  /** Splat a profile over a fetched-page relation, keeping `keep`
    * passthrough columns (url, attempts, …). */
  def parsePages(pages: DataFrame, htmlCol: String, site: String,
      keep: Seq[String] = Seq.empty): DataFrame = {
    val article = site match {
      case "ieee" => ieeeArticle(col(htmlCol))
      case "sciencedirect" => sdArticle(col(htmlCol))
      case other => throw new IllegalArgumentException(
        s"unknown site profile: $other (ieee | sciencedirect)")
    }
    pages.select(keep.map(col) :+ article.as("article"): _*).select(
      keep.map(col) :+ col("article.*"): _*)
  }
}
