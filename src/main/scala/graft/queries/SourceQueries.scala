package graft.queries

import java.nio.file.Files

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.Tables

/** Source operators (SURVEY §2.1): the engine's readers exercised as
  * round-trips — parquet → format → explicit-schema read back — so the
  * oracle (reading the original parquet) checks the reader end-to-end.
  */
object SourceQueries {

  type Q = (SparkSession, String) => DataFrame

  /** Staging dirs: one ROOT per query prefix, deleted at JVM exit, with
    * a FRESH subdir per invocation inside it. The per-invocation subdir
    * keeps an earlier invocation's still-held lazy result valid (an
    * overwrite into a shared dir would delete the part files under it
    * mid-scan); the shutdown-hooked root bounds accumulation to one JVM
    * lifetime — repeated Bench/Verify runs no longer leak staging data
    * across processes. Results lazily read these dirs, so eager
    * per-run deletion (the e-query pattern) is not an option here. */
  private val tmpRoots = new java.util.concurrent.ConcurrentHashMap[String, String]()
  private val tmpSeq = new java.util.concurrent.atomic.AtomicLong(0L)
  private def tmp(prefix: String): String = {
    val root = tmpRoots.computeIfAbsent(prefix, { p =>
      val d = Files.createTempDirectory(p)
      sys.addShutdownHook(graft.etl.Writers.deleteRecursively(d.toFile))
      d.toString
    })
    val sub = s"$root/run${tmpSeq.incrementAndGet()}"
    new java.io.File(sub).mkdirs()
    sub
  }

  /** S1: JSON read with explicit schema (the merged-articles reader,
    * DB/ETL.ipynb c5 — but schema-first, never inferred). */
  val s1JsonRead: Q = (s, dir) => {
    import s.implicits._
    val out = tmp("graft-s1") + "/docs"
    Tables.load(s, dir, "documents").write.mode("overwrite").json(out)
    val schema = StructType(Seq(
      StructField("doc_id", LongType), StructField("text", StringType),
      StructField("lang", StringType), StructField("source", StringType),
      StructField("n_chars", LongType)))
    s.read.schema(schema).json(out)
      .select($"doc_id", $"lang", $"n_chars")
      .orderBy($"doc_id")
  }

  val s1JsonReadSql: String =
    "SELECT doc_id, lang, n_chars FROM documents ORDER BY doc_id"

  /** S7: CSV read with header + explicit schema (the star-table reader,
    * DB/iqueries generator.py:97). */
  val s7CsvRead: Q = (s, dir) => {
    import s.implicits._
    val out = tmp("graft-s7") + "/nation"
    Tables.load(s, dir, "nation").write.mode("overwrite")
      .option("header", true).csv(out)
    val schema = StructType(Seq(
      StructField("n_nationkey", IntegerType),
      StructField("n_name", StringType),
      StructField("n_regionkey", IntegerType)))
    s.read.option("header", true).schema(schema).csv(out)
      .orderBy($"n_nationkey")
  }

  val s7CsvReadSql: String =
    "SELECT n_nationkey, n_name, n_regionkey FROM nation ORDER BY n_nationkey"

  /** S9: ORC read — the other columnar format a 100 TB lake speaks;
    * same push-down/pruning machinery as parquet in Spark. Exercised
    * as a write→read round-trip checked against the parquet oracle. */
  val s9OrcRead: Q = (s, dir) => {
    import s.implicits._
    val out = tmp("graft-s9") + "/docs"
    Tables.load(s, dir, "documents").write.mode("overwrite").orc(out)
    s.read.orc(out)
      .select($"doc_id", $"source", $"n_chars")
      .orderBy($"doc_id")
  }

  val s9OrcReadSql: String =
    "SELECT doc_id, source, n_chars FROM documents ORDER BY doc_id"

  /** S14: Hive-partitioned layout + partition-pruned read — the
    * complement to s12's z-order (intra-file skipping): directory-
    * level pruning, the first and cheapest scan reducer at 100 TB.
    * Orders are written `partitionBy(o_year)`; the year-filtered read
    * back must touch ONLY that year's directory — the plan carries
    * the predicate as a PartitionFilter, not a data Filter
    * (SourcePruneSpec pins this on the executed plan). The oracle is
    * the plain filtered aggregate: pruning must be invisible to
    * results. */
  val s14PartitionPrune: Q = (s, dir) => {
    import s.implicits._
    val out = tmp("graft-s14") + "/orders_by_year"
    Tables.load(s, dir, "orders")
      .withColumn("o_year", year($"o_orderdate"))
      .write.mode("overwrite").partitionBy("o_year").parquet(out)
    val dec = "decimal(18,4)"
    s.read.parquet(out)
      .filter($"o_year" === 1997)
      .groupBy(month($"o_orderdate").as("o_month"))
      .agg(count(lit(1)).as("n_orders"),
        round(sum($"o_totalprice".cast(dec)), 2).cast("double").as("total_price"))
      .orderBy($"o_month")
  }

  val s14PartitionPruneSql: String =
    """SELECT month(o_orderdate) AS o_month, count(*) AS n_orders,
      |  CAST(round(sum(CAST(o_totalprice AS DECIMAL(18,4))), 2) AS DOUBLE) AS total_price
      |FROM orders WHERE year(o_orderdate) = 1997
      |GROUP BY 1 ORDER BY 1""".stripMargin

  /** S15: dynamic partition overwrite — the idempotent-backfill
    * primitive of a partitioned lake: re-running one day/year's
    * pipeline replaces exactly that partition and leaves every other
    * file untouched (static overwrite mode would TRUNCATE the whole
    * table first — the classic lost-data failure). Here the 1997
    * partition is rewritten with doubled prices (×2 is exact in IEEE
    * doubles — the backfill transform can't introduce float drift)
    * via the per-write `partitionOverwriteMode=dynamic` option (no
    * session-level conf mutation), then the WHOLE table is read back
    * and aggregated per year: 1997 must show the new values, every
    * other year the originals. */
  val s15DynamicOverwrite: Q = (s, dir) => {
    import s.implicits._
    val out = tmp("graft-s15") + "/orders_by_year"
    val base = Tables.load(s, dir, "orders")
      .withColumn("o_year", year($"o_orderdate"))
    base.write.mode("overwrite").partitionBy("o_year").parquet(out)
    base.filter($"o_year" === 1997)
      .withColumn("o_totalprice", $"o_totalprice" * 2)
      .write.mode("overwrite")
      .option("partitionOverwriteMode", "dynamic")
      .partitionBy("o_year").parquet(out)
    val dec = "decimal(18,4)"
    s.read.parquet(out)
      .groupBy($"o_year".cast("long").as("o_year"))
      .agg(count(lit(1)).as("n_orders"),
        round(sum($"o_totalprice".cast(dec)), 2).cast("double").as("total_price"))
      .orderBy($"o_year")
  }

  val s15DynamicOverwriteSql: String =
    """SELECT CAST(year(o_orderdate) AS BIGINT) AS o_year, count(*) AS n_orders,
      |  CAST(round(sum(CAST(CASE WHEN year(o_orderdate) = 1997
      |                           THEN o_totalprice * 2
      |                           ELSE o_totalprice END AS DECIMAL(18,4))), 2)
      |    AS DOUBLE) AS total_price
      |FROM orders GROUP BY 1 ORDER BY 1""".stripMargin

  /** S16: small-file compaction — the operational fix for the
    * many-tiny-files problem every streaming/incremental landing zone
    * develops (NameNode/listing pressure, per-file task overhead at
    * 100 TB). A fragmented write (round-robin repartition(16) — every
    * partition non-empty, so exactly 16 files) is compacted by a
    * rewrite to 2 files; file counts are observed from the data path
    * itself via input_file_name(), and the content-preservation check
    * (row count + key sum) rides in the same output row. */
  val s16Compaction: Q = (s, dir) => {
    import s.implicits._
    val base = tmp("graft-s16")
    val frag = s"$base/frag"
    val comp = s"$base/compact"
    val docs = Tables.load(s, dir, "documents").select($"doc_id", $"text")
    docs.repartition(16).write.mode("overwrite").parquet(frag)
    val before = s.read.parquet(frag)
    before.repartition(2).write.mode("overwrite").parquet(comp)
    val after = s.read.parquet(comp)
    val nb = before.select(input_file_name().as("f")).distinct().count()
    val na = after.select(input_file_name().as("f")).distinct().count()
    after.agg(count(lit(1)).as("n_rows"), sum($"doc_id").as("sum_ids"))
      .select(lit(nb).as("files_before"), lit(na).as("files_after"),
        $"n_rows", $"sum_ids")
  }

  val s16CompactionSql: String =
    """SELECT 16::BIGINT AS files_before, 2::BIGINT AS files_after,
      |  count(*) AS n_rows, CAST(sum(doc_id) AS BIGINT) AS sum_ids
      |FROM documents""".stripMargin

  /** S17: malformed-record accounting — the PERMISSIVE read path every
    * production ingest needs: a landing file where every 13th line is
    * truncated/invalid JSON must not kill the job (FAILFAST) or vanish
    * silently (DROPMALFORMED); bad lines surface in the corrupt-record
    * column, good lines parse, and the quarantine ratio is an explicit
    * output the pipeline can alert on. The corrupt lines are planted
    * deterministically, so the oracle recomputes all three counters
    * from the source table directly. */
  val s17CorruptRecords: Q = (s, dir) => {
    import s.implicits._
    val out = tmp("graft-s17") + "/jsonl"
    Tables.load(s, dir, "documents").select($"doc_id", $"n_chars")
      .select(
        when($"doc_id" % 13 === 0,
          concat(lit("{\"doc_id\":"), $"doc_id", lit(",\"n_chars\":oops")))
          .otherwise(to_json(struct($"doc_id", $"n_chars"))).as("value"))
      .write.mode("overwrite").text(out)
    val schema = StructType(Seq(
      StructField("doc_id", LongType), StructField("n_chars", LongType),
      StructField("_bad", StringType)))
    s.read.schema(schema)
      .option("mode", "PERMISSIVE")
      .option("columnNameOfCorruptRecord", "_bad")
      .json(out)
      .agg(
        sum(when($"_bad".isNull, 1L).otherwise(0L)).as("n_good"),
        sum(when($"_bad".isNotNull, 1L).otherwise(0L)).as("n_bad"),
        sum(when($"_bad".isNull, $"n_chars")).as("sum_chars"))
  }

  val s17CorruptRecordsSql: String =
    """SELECT
      |  CAST(sum(CASE WHEN doc_id % 13 <> 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_good,
      |  CAST(sum(CASE WHEN doc_id % 13 = 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_bad,
      |  CAST(sum(CASE WHEN doc_id % 13 <> 0 THEN n_chars END) AS BIGINT) AS sum_chars
      |FROM documents""".stripMargin

  /** S10: plain-text line source — the rawest landing format a corpus
    * pipeline ingests (one document per line). Write → `spark.read
    * .text` round-trip; line order is filesystem-dependent, so the
    * check is the multiset of lines (groupBy count), which any
    * line-preserving reader must reproduce. CR/LF are translated to
    * spaces BEFORE the write: a text containing a newline would
    * otherwise round-trip as two lines and silently diverge from the
    * oracle — one-doc-per-line is the format's contract, enforced
    * here rather than assumed of the data (the oracle applies the
    * same translation). */
  val s10TextRead: Q = (s, dir) => {
    import s.implicits._
    val out = tmp("graft-s10") + "/txt"
    Tables.load(s, dir, "documents")
      .select(regexp_replace($"text", "[\\r\\n]", " ").as("text"))
      .write.mode("overwrite").text(out)
    s.read.text(out)
      .groupBy($"value").agg(count(lit(1)).as("n"))
      .orderBy($"value")
  }

  val s10TextReadSql: String =
    """SELECT regexp_replace(text, '[\r\n]', ' ', 'g') AS value, count(*) AS n
      |FROM documents GROUP BY 1 ORDER BY 1""".stripMargin

  /** S11: schema-evolution read — two parquet drops with DIFFERENT
    * column sets (an old crawl without n_chars, a new one without
    * source: the landing-dir reality the reference's four raw/upd
    * variants exhibit) read as ONE relation via `mergeSchema`. The
    * merged schema is the union of columns; rows carry null for the
    * columns their file lacks — exactly the unionByName(allowMissing)
    * semantics, but at the SOURCE, with no per-variant read code. */
  val s11MergeSchema: Q = (s, dir) => {
    import s.implicits._
    val base = tmp("graft-s11")
    val aDir = s"$base/a"
    val bDir = s"$base/b"
    val docs = Tables.load(s, dir, "documents")
    docs.filter($"doc_id" % 2 === 0).select($"doc_id", $"source")
      .write.mode("overwrite").parquet(aDir)
    docs.filter($"doc_id" % 2 === 1).select($"doc_id", $"n_chars")
      .write.mode("overwrite").parquet(bDir)
    s.read.option("mergeSchema", "true").parquet(aDir, bDir)
      .select($"doc_id", $"source", $"n_chars")
      .orderBy($"doc_id")
  }

  val s11MergeSchemaSql: String =
    """SELECT doc_id, source, CAST(NULL AS BIGINT) AS n_chars
      |FROM documents WHERE doc_id % 2 = 0
      |UNION ALL
      |SELECT doc_id, CAST(NULL AS VARCHAR), n_chars
      |FROM documents WHERE doc_id % 2 = 1
      |ORDER BY doc_id""".stripMargin

  /** S2/K3: the MongoDB staging path as a file round-trip — write the
    * documents table as a mongoimport-ready canonical-extended-JSON
    * export (K3, `insert_many` payload: DB/MongoDB.py:36-41), read it
    * back through the wrapper-unwrapping reader (S2, the notebook's
    * export read: DB/ETL.ipynb c4-c5), and emit the typed columns.
    * The synthetic `fetched` timestamp lands before 1970 for low
    * doc_ids, so the `$date` epoch-millis wrapper is exercised on
    * negative values too. Oracle = the same values computed straight
    * from parquet: any wrapper the codec mangled would hash-mismatch. */
  val s13MongoExtjson: Q = (s, dir) => {
    import s.implicits._
    val out = tmp("graft-s13") + "/mongo"
    val docs = Tables.load(s, dir, "documents")
      .select($"doc_id", $"text", $"lang", $"source", $"n_chars",
        timestamp_millis((($"doc_id" * 86400000L) % 4102444800000L)
          - 3155760000000L).as("fetched"))
    graft.etl.MongoStage.writeExtJsonl(docs, "doc_id", out)
    val schema = StructType(Seq(
      StructField("_id", StringType), StructField("doc_id", LongType),
      StructField("text", StringType), StructField("lang", StringType),
      StructField("source", StringType), StructField("n_chars", LongType),
      StructField("fetched", TimestampType)))
    graft.etl.MongoStage.readExtJsonl(s, out, schema)
      .select($"_id".as("oid"), $"doc_id", $"text", $"lang", $"source",
        $"n_chars", unix_millis($"fetched").as("fetched_ms"))
      .orderBy($"doc_id")
  }

  val s13MongoExtjsonSql: String =
    """SELECT substr(md5(CAST(doc_id AS VARCHAR)), 1, 24) AS oid,
      |       doc_id, text, lang, source, n_chars,
      |       (doc_id * 86400000) % 4102444800000 - 3155760000000 AS fetched_ms
      |FROM documents ORDER BY doc_id""".stripMargin

  /** S20: XML read — the scholarly-corpus landing format PubMed-style
    * dumps arrive in, through Spark 4's NATIVE xml datasource (no
    * external package). Same round-trip discipline as s9/ORC: write
    * with a rowTag, read back with the EXPLICIT schema (never
    * inference), hash against the parquet oracle — entity escaping of
    * text content must be invisible to the round trip. */
  val s20XmlRead: Q = (s, dir) => {
    import s.implicits._
    val out = tmp("graft-s20") + "/docs"
    // XML 1.0 cannot carry most control characters AT ALL (the writer
    // throws on 0x0B etc. — reproduced; the adversarial fixture plants
    // exactly that byte) — translate them to spaces BEFORE the write,
    // the same format-contract enforcement s10 applies to CR/LF; the
    // oracle applies the identical translation
    Tables.load(s, dir, "documents")
      .select($"doc_id",
        regexp_replace($"text",
          "[\\x00-\\x08\\x0B\\x0C\\x0E-\\x1F]", " ").as("text"),
        $"lang", $"source", $"n_chars")
      .write.mode("overwrite").option("rowTag", "doc").format("xml").save(out)
    val schema = StructType(Seq(
      StructField("doc_id", LongType), StructField("text", StringType),
      StructField("lang", StringType), StructField("source", StringType),
      StructField("n_chars", LongType)))
    s.read.schema(schema).option("rowTag", "doc")
      // default true SILENTLY trims surrounding whitespace on read —
      // the round trip would no longer be invisible
      .option("ignoreSurroundingSpaces", false)
      .format("xml").load(out)
      .orderBy($"doc_id")
  }

  val s20XmlReadSql: String =
    """SELECT doc_id,
      |  regexp_replace(text, '[\x00-\x08\x0B\x0C\x0E-\x1F]', ' ', 'g') AS text,
      |  lang, source, n_chars
      |FROM documents ORDER BY doc_id""".stripMargin

  /** S18: HTML-to-article extraction through the gate
    * (graft.etl.HtmlExtract — the S4/S5 per-field extractors as
    * codegen'd regex expressions). Pages are SYNTHESIZED from the
    * documents table with the IEEE anatomy the extractor targets
    * (document-title, authors-accordion-container, xplmathjax,
    * doc-abstract-pubdate, publishedIn, IEEE Keywords, Electronic
    * ISSN), then parsed back. The oracle is GROUND TRUTH, not regex
    * parity: it computes every expected field directly from the base
    * columns, so any extraction bug — a wrong capture group, a broken
    * affiliation split, a date that doesn't round-trip — hash-fails. */
  val s18HtmlExtract: Q = (s, dir) => {
    import s.implicits._
    val months = Seq("January", "February", "March", "April", "May", "June",
      "July", "August", "September", "October", "November", "December")
    val d = Tables.load(s, dir, "documents").select($"doc_id")
    val mn = element_at(
      array(months.map(lit): _*), (pmod($"doc_id", lit(12L)) + 1).cast("int"))
    val html = concat(
      lit("""<html><body><h1 class="document-title"> <span>Doc """),
      $"doc_id", lit("</span></h1>"),
      lit("""<div class="authors-accordion-container"><a href="/x">A"""),
      $"doc_id",
      lit("""</a><p class="author-affiliation">Dept """), pmod($"doc_id", lit(7L)),
      lit(", Uni "), pmod($"doc_id", lit(13L)),
      lit(", Country"), pmod($"doc_id", lit(5L)), lit("</p></div>"),
      lit("""<div class="authors-accordion-container"><a href="/x">B"""),
      $"doc_id",
      lit("""</a><p class="author-affiliation">Inst """), pmod($"doc_id", lit(3L)),
      lit("</p></div>"),
      lit("""<div class="doc-abstract-pubdate">Date of Publication: """),
      pmod($"doc_id", lit(28L)) + 1, lit(" "), mn, lit(" "),
      pmod($"doc_id", lit(8L)) + 2015, lit("</div>"),
      lit("""<div xplmathjax>We study topic """), pmod($"doc_id", lit(97L)),
      lit("</div>"),
      lit("""<a href="https://doi.org/10.5555/"""), $"doc_id", lit("\">link</a>"),
      lit("""<div class="document-banner-metric-count">"""),
      pmod($"doc_id", lit(100L)), lit("</div>"),
      lit("""<div class="stats-document-abstract-publishedIn">Published in: Journal """),
      pmod($"doc_id", lit(5L)), lit(" (Early Access)</div>"),
      lit("""<strong>IEEE Keywords</strong><ul><li><a href="/k">kw"""),
      pmod($"doc_id", lit(11L)),
      lit("""</a></li><li><a href="/k">kw"""), pmod($"doc_id", lit(13L)),
      lit("</a></li></ul>"),
      lit("""<div><strong>Electronic ISSN:</strong> 1234-"""),
      lpad(pmod($"doc_id", lit(10000L)).cast("string"), 4, "0"), lit("</div>"),
      lit("</body></html>"))
    graft.etl.HtmlExtract
      .parsePages(d.withColumn("html", html), "html", "ieee", keep = Seq("doc_id"))
      .select($"doc_id", $"title", $"abstract",
        $"Date".as("pub_date"), $"Day".as("pub_day"),
        $"Month".as("pub_month"), $"Year".as("pub_year"),
        $"doi", $"citations", $"journal_name", $"ISSN".as("issn"),
        array_join($"keywords", "|").as("keywords"),
        array_join($"authors", "|").as("authors"),
        array_join($"universities", "|").as("universities"),
        array_join($"countries", "|").as("countries"))
      .orderBy($"doc_id")
  }

  val s18HtmlExtractSql: String =
    """WITH m AS (
      |  SELECT doc_id,
      |    ['January','February','March','April','May','June','July','August',
      |     'September','October','November','December'][(doc_id % 12) + 1] AS mn
      |  FROM documents)
      |SELECT doc_id,
      |  'Doc ' || doc_id AS title,
      |  'We study topic ' || (doc_id % 97) AS abstract,
      |  (doc_id % 28 + 1) || ' ' || mn || ' ' || (2015 + doc_id % 8) AS pub_date,
      |  CAST(doc_id % 28 + 1 AS VARCHAR) AS pub_day,
      |  mn AS pub_month,
      |  CAST(2015 + doc_id % 8 AS VARCHAR) AS pub_year,
      |  'https://doi.org/10.5555/' || doc_id AS doi,
      |  CAST(doc_id % 100 AS DOUBLE) AS citations,
      |  'Journal ' || (doc_id % 5) AS journal_name,
      |  '1234' || lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0') AS issn,
      |  'kw' || (doc_id % 11) || '|kw' || (doc_id % 13) AS keywords,
      |  'A' || doc_id || '|B' || doc_id AS authors,
      |  'Dept ' || (doc_id % 7) || ', Uni ' || (doc_id % 13) || '|Inst ' || (doc_id % 3)
      |    AS universities,
      |  'Country' || (doc_id % 5) || '|' AS countries
      |FROM m ORDER BY doc_id""".stripMargin

  /** S19: the ScienceDirect profile through the gate — the harder
    * extraction path (superscript→affiliation mapping, author zip,
    * fourth-date rule, "Unknown"-country split), same ground-truth
    * oracle discipline as s18. Each page carries two authors (sups
    * {1} and {1,2}) over two affiliations (one comma-split, one
    * comma-less), so the mapping, the global dedup, and both split
    * outcomes are exercised on every row. */
  val s19HtmlExtractSd: Q = (s, dir) => {
    import s.implicits._
    val months = Seq("January", "February", "March", "April", "May", "June",
      "July", "August", "September", "October", "November", "December")
    val d = Tables.load(s, dir, "documents").select($"doc_id")
    val mn = element_at(
      array(months.map(lit): _*), (pmod($"doc_id", lit(12L)) + 1).cast("int"))
    val html = concat(
      lit("""<html><body><span class="title-text" id="screen-reader-main-title">Doc """),
      $"doc_id", lit("</span>"),
      lit("""<div class="author-group">"""),
      lit("""<button class="author"><span class="given-name">Ga"""), $"doc_id",
      lit("""</span><span class="surname">Sa"""), $"doc_id",
      lit("""</span><span class="author-ref"><sup>1</sup></span></button>"""),
      lit("""<button class="author"><span class="given-name">Gb"""), $"doc_id",
      lit("""</span><span class="surname">Sb"""), $"doc_id",
      lit("""</span><span class="author-ref"><sup>1</sup></span><span class="author-ref"><sup>2</sup></span></button>"""),
      lit("</div>"),
      lit("""<dl class="affiliation"><dt><sup>1</sup></dt><dd>Lab """),
      pmod($"doc_id", lit(7L)), lit(", Land"), pmod($"doc_id", lit(5L)),
      lit("</dd></dl>"),
      lit("""<dl class="affiliation"><dt><sup>2</sup></dt><dd>Solo</dd></dl>"""),
      lit("""<p class="u-margin-s-bottom">Received 1 January 2020, Revised 2 February 2020, Accepted 3 March 2020, Available online """),
      pmod($"doc_id", lit(28L)) + 1, lit(" "), mn, lit(" "),
      pmod($"doc_id", lit(6L)) + 2016, lit(".</p>"),
      lit("""<div id="abstracts">Topic """), pmod($"doc_id", lit(89L)), lit("</div>"),
      lit("""<a class="anchor doi anchor-primary" href="https://doi.org/10.1016/"""),
      $"doc_id", lit("\">d</a>"),
      lit("""<header id="citing-articles-header"><h2>Cited by ("""),
      pmod($"doc_id", lit(50L)), lit(")</h2></header>"),
      lit("""<div class="keyword">kw"""), pmod($"doc_id", lit(9L)), lit("</div>"),
      lit("""<div class="keyword">kw"""), pmod($"doc_id", lit(17L)), lit("</div>"),
      lit("""<h2 id="publication-title">Journal """), pmod($"doc_id", lit(4L)),
      lit("</h2></body></html>"))
    graft.etl.HtmlExtract
      .parsePages(d.withColumn("html", html), "html", "sciencedirect",
        keep = Seq("doc_id"))
      .select($"doc_id", $"title", $"abstract",
        $"Date".as("pub_date"), $"Day".as("pub_day"),
        $"Month".as("pub_month"), $"Year".as("pub_year"),
        $"doi", $"citations", $"journal_name",
        array_join($"keywords", "|").as("keywords"),
        array_join($"authors", "|").as("authors"),
        array_join(transform($"authors_with_affiliations",
          x => concat_ws("~", x.getField("author"), x.getField("university"),
            x.getField("country"))), "|").as("awa"),
        array_join($"universities", "|").as("universities"),
        array_join($"countries", "|").as("countries"))
      .orderBy($"doc_id")
  }

  val s19HtmlExtractSdSql: String =
    """WITH m AS (
      |  SELECT doc_id,
      |    ['January','February','March','April','May','June','July','August',
      |     'September','October','November','December'][(doc_id % 12) + 1] AS mn,
      |    'Lab ' || (doc_id % 7) AS uni, 'Land' || (doc_id % 5) AS ctry,
      |    'Ga' || doc_id || ' Sa' || doc_id AS a1,
      |    'Gb' || doc_id || ' Sb' || doc_id AS a2
      |  FROM documents)
      |SELECT doc_id,
      |  'Doc ' || doc_id AS title,
      |  'Topic ' || (doc_id % 89) AS abstract,
      |  (doc_id % 28 + 1) || ' ' || mn || ' ' || (2016 + doc_id % 6) AS pub_date,
      |  CAST(doc_id % 28 + 1 AS VARCHAR) AS pub_day,
      |  mn AS pub_month,
      |  CAST(2016 + doc_id % 6 AS VARCHAR) AS pub_year,
      |  'https://doi.org/10.1016/' || doc_id AS doi,
      |  CAST(doc_id % 50 AS DOUBLE) AS citations,
      |  'Journal ' || (doc_id % 4) AS journal_name,
      |  'kw' || (doc_id % 9) || '|kw' || (doc_id % 17) AS keywords,
      |  a1 || '|' || a2 AS authors,
      |  a1 || '~' || uni || '~' || ctry || '|' ||
      |    a2 || '~' || uni || '~' || ctry || '|' ||
      |    a2 || '~Solo~Unknown' AS awa,
      |  uni || '|Solo' AS universities,
      |  ctry || '|Unknown' AS countries
      |FROM m ORDER BY doc_id""".stripMargin

  /** A1: the count-audit operator (ref: before/after cleaning counts,
    * DB/ETL.ipynb c13/c27) as one relation of named counts. */
  val a1CountAudit: Q = (s, dir) => {
    import s.implicits._
    val o = Tables.load(s, dir, "orders")
    o.select(
        count(lit(1)).as("total"),
        count(when($"o_orderstatus" === "F", 1)).as("finished"),
        count(when($"o_totalprice" > 100000.0, 1)).as("big"))
      .select(expr("stack(3, 'total', total, 'finished', finished, 'big', big) AS (step, n)"))
      .orderBy($"step")
  }

  val a1CountAuditSql: String =
    """SELECT 'big' AS step, count(*) FILTER (o_totalprice > 100000.0) AS n FROM orders
      |UNION ALL
      |SELECT 'finished', count(*) FILTER (o_orderstatus = 'F') FROM orders
      |UNION ALL
      |SELECT 'total', count(*) FROM orders
      |ORDER BY step""".stripMargin

  /** S21: `binaryFile` source — the reader a multimodal lake actually
    * starts from: opaque media files on disk, not binary columns
    * already inside parquet. Stages one deterministic PNG per sampled
    * doc (executor-side writes, no driver collect), reads the
    * directory back through Spark's binaryFile format (pathGlobFilter
    * pushed into the file index), and runs the m3 header decode over
    * the `content` column. The id rides in the FILENAME and is parsed
    * back out — the provenance path a real media crawl uses. Oracle:
    * m3's byte-window arithmetic over the same sampled docs. */
  val s21BinaryFiles: Q = (s, dir) => {
    import s.implicits._
    import graft.operators.Multimodal
    val stage = tmp("graft-s21")
    Tables.load(s, dir, "documents")
      .filter($"doc_id" % 50 === 0)
      .select($"doc_id", coalesce($"text", lit("")).as("text"))
      .as[(Long, String)]
      .foreachPartition { (it: Iterator[(Long, String)]) =>
        it.foreach { case (id, text) =>
          val w = (id % 3000 + 16).toInt
          val h = (id % 2000 + 16).toInt
          Files.write(java.nio.file.Paths.get(stage, s"img_$id.png"),
            Multimodal.pngBytes(w, h, text.getBytes("UTF-8")))
        }
      }
    val media = s.read.format("binaryFile").option("pathGlobFilter", "*.png")
      .load(stage)
      .select(
        regexp_extract($"path", "img_([0-9]+)\\.png", 1).cast("long").as("media_id"),
        lit("image/png").as("kind"), $"content".as("payload"))
      .as[Multimodal.MediaRow]
    Multimodal.decodeHeaders(media)
      .select($"media_id", $"kind", $"n_bytes".cast("long").as("n_bytes"),
        $"width".cast("long").as("width"), $"height".cast("long").as("height"))
      .orderBy($"media_id")
  }

  val s21BinaryFilesSql: String =
    """SELECT doc_id AS media_id, 'image/png' AS kind,
      |  CAST(33 + octet_length(coalesce(text, '')::BLOB) AS BIGINT) AS n_bytes,
      |  CAST(doc_id % 3000 + 16 AS BIGINT) AS width,
      |  CAST(doc_id % 2000 + 16 AS BIGINT) AS height
      |FROM documents WHERE doc_id % 50 = 0 ORDER BY media_id""".stripMargin

  val defs: Map[String, Q] = Map(
    "s1_json_read"  -> s1JsonRead,
    "s7_csv_read"   -> s7CsvRead,
    "s9_orc_read"   -> s9OrcRead,
    "s14_partition_prune" -> s14PartitionPrune,
    "s15_dynamic_overwrite" -> s15DynamicOverwrite,
    "s16_compaction" -> s16Compaction,
    "s17_corrupt_records" -> s17CorruptRecords,
    "s10_text_read" -> s10TextRead,
    "s11_merge_schema" -> s11MergeSchema,
    "s13_mongo_extjson" -> s13MongoExtjson,
    "s18_html_extract" -> s18HtmlExtract,
    "s19_html_extract_sd" -> s19HtmlExtractSd,
    "s20_xml_read" -> s20XmlRead,
    "s21_binary_files" -> s21BinaryFiles,
    "a1_count_audit" -> a1CountAudit,
  )

  val oracle: Map[String, String] = Map(
    "s1_json_read"  -> s1JsonReadSql,
    "s7_csv_read"   -> s7CsvReadSql,
    "s9_orc_read"   -> s9OrcReadSql,
    "s14_partition_prune" -> s14PartitionPruneSql,
    "s15_dynamic_overwrite" -> s15DynamicOverwriteSql,
    "s16_compaction" -> s16CompactionSql,
    "s17_corrupt_records" -> s17CorruptRecordsSql,
    "s10_text_read" -> s10TextReadSql,
    "s11_merge_schema" -> s11MergeSchemaSql,
    "s13_mongo_extjson" -> s13MongoExtjsonSql,
    "s18_html_extract" -> s18HtmlExtractSql,
    "s19_html_extract_sd" -> s19HtmlExtractSdSql,
    "s20_xml_read" -> s20XmlReadSql,
    "s21_binary_files" -> s21BinaryFilesSql,
    "a1_count_audit" -> a1CountAuditSql,
  )
}
