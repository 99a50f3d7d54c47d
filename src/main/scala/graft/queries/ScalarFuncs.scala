package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables
import graft.functions.UnicodeSanitize.unicode_sanitize

/** Scalar string/regex/date functions (SURVEY §2.7) — the reference's
  * per-row Python extractors re-expressed as codegen'd column
  * expressions. Inputs are synthesized from testdata columns so each
  * cleansing semantic is exercised against the DuckDB oracle.
  */
object ScalarFuncs {

  type Q = (SparkSession, String) => DataFrame

  /** F1: affiliation split `(.+?),[ \t\n\x0b\f\r]*([^,]+)$` → (university, country),
    * unparseable → (full text, "Unknown")
    * (ScienceDirect/ScienceDirect.py:115-125). */
  val f1AffiliationSplit: Q = (s, dir) => {
    import s.implicits._
    val pat = "(.+?),\\s*([^,]+)$"
    Tables.load(s, dir, "supplier")
      .join(Tables.load(s, dir, "nation"), $"s_nationkey" === $"n_nationkey")
      .withColumn("aff",
        when($"s_suppkey" % 7 === 0, $"s_name") // unparseable path: no comma
          .otherwise(concat($"s_name", lit(", "), $"n_name")))
      .select(
        $"s_suppkey",
        $"aff",
        when(regexp_extract($"aff", pat, 2) === "", $"aff")
          .otherwise(regexp_extract($"aff", pat, 1)).as("university"),
        when(regexp_extract($"aff", pat, 2) === "", lit("Unknown"))
          .otherwise(regexp_extract($"aff", pat, 2)).as("country"))
      .orderBy($"s_suppkey")
  }

  val f1AffiliationSplitSql: String =
    """WITH a AS (
      |  SELECT s_suppkey,
      |    CASE WHEN s_suppkey % 7 = 0 THEN s_name
      |         ELSE s_name || ', ' || n_name END AS aff
      |  FROM supplier JOIN nation ON s_nationkey = n_nationkey)
      |SELECT s_suppkey, aff,
      |  CASE WHEN regexp_extract(aff, '(.+?),[ \t\n\x0b\f\r]*([^,]+)$', 2) = '' THEN aff
      |       ELSE regexp_extract(aff, '(.+?),[ \t\n\x0b\f\r]*([^,]+)$', 1) END AS university,
      |  CASE WHEN regexp_extract(aff, '(.+?),[ \t\n\x0b\f\r]*([^,]+)$', 2) = '' THEN 'Unknown'
      |       ELSE regexp_extract(aff, '(.+?),[ \t\n\x0b\f\r]*([^,]+)$', 2) END AS country
      |FROM a ORDER BY s_suppkey""".stripMargin

  /** F2: split on ", ", last part = country, rest rejoined = university;
    * strip "View Profile" (IEEE/IEEE.py:199-208). */
  val f2SplitLast: Q = (s, dir) => {
    import s.implicits._
    Tables.load(s, dir, "customer")
      .join(Tables.load(s, dir, "nation"), $"c_nationkey" === $"n_nationkey")
      .withColumn("aff",
        concat($"c_name", lit("View Profile"), lit(", Dept, "), $"n_name"))
      .withColumn("aff", regexp_replace($"aff", "View Profile", ""))
      .withColumn("parts", split($"aff", ", "))
      .select(
        $"c_custkey",
        element_at($"parts", -1).as("country"),
        array_join(slice($"parts", lit(1), size($"parts") - 1), ", ").as("university"))
      .orderBy($"c_custkey")
  }

  val f2SplitLastSql: String =
    """WITH a AS (
      |  SELECT c_custkey,
      |    string_split(regexp_replace(c_name || 'View Profile' || ', Dept, ' || n_name,
      |                                'View Profile', ''), ', ') AS parts
      |  FROM customer JOIN nation ON c_nationkey = n_nationkey)
      |SELECT c_custkey,
      |  parts[-1] AS country,
      |  array_to_string(parts[1:len(parts)-1], ', ') AS university
      |FROM a ORDER BY c_custkey""".stripMargin

  /** F3: regexp_extract_all + take the Nth match (the "4th date on the
    * page" trick, ScienceDirect/ScienceDirect.py:239-257). */
  val f3ExtractNth: Q = (s, dir) => {
    import s.implicits._
    Tables.load(s, dir, "orders")
      .withColumn("blob",
        concat(lit("a "), $"o_orderkey", lit(" b "), $"o_custkey",
          lit(" c "), $"o_orderkey" + $"o_custkey"))
      .select(
        $"o_orderkey",
        element_at(regexp_extract_all($"blob", lit("\\d+"), lit(0)), 2)
          .cast("long").as("second_number"))
      .orderBy($"o_orderkey")
  }

  val f3ExtractNthSql: String =
    """SELECT o_orderkey,
      |  CAST(regexp_extract_all('a ' || o_orderkey || ' b ' || o_custkey ||
      |                          ' c ' || (o_orderkey + o_custkey), '\d+')[2] AS BIGINT)
      |    AS second_number
      |FROM orders ORDER BY o_orderkey""".stripMargin

  /** F5: journal-name cleanup — strip "Published in:" prefix, trailing
    * parenthetical, collapse whitespace (IEEE/IEEE.py:331-337). */
  val f5Cleanup: Q = (s, dir) => {
    import s.implicits._
    Tables.load(s, dir, "part")
      .withColumn("raw", concat(lit("Published in: "), $"p_type", lit(" (Early Access)")))
      .select(
        $"p_partkey",
        trim(regexp_replace(regexp_replace($"raw", "^Published in: ", ""),
          "\\s*\\([^)]*\\)$", "")).as("journal"))
      .orderBy($"p_partkey")
  }

  val f5CleanupSql: String =
    """SELECT p_partkey,
      |  trim(regexp_replace(regexp_replace('Published in: ' || p_type || ' (Early Access)',
      |       '^Published in: ', '', 'g'), '[ \t\n\x0b\f\r]*\([^)]*\)$', '', 'g')) AS journal
      |FROM part ORDER BY p_partkey""".stripMargin

  /** F6: ISSN normalize — text after ':', trimmed, '-' removed
    * (IEEE/IEEE.py:74,88-91). */
  val f6IssnNormalize: Q = (s, dir) => {
    import s.implicits._
    Tables.load(s, dir, "part")
      .withColumn("raw", concat(lit("ISSN: "), $"p_size", lit("-"), $"p_partkey" % 10000))
      .select(
        $"p_partkey",
        regexp_replace(trim(substring_index($"raw", ":", -1)), "-", "").as("issn"))
      .orderBy($"p_partkey")
  }

  val f6IssnNormalizeSql: String =
    """SELECT p_partkey,
      |  regexp_replace(trim(split_part('ISSN: ' || p_size || '-' || (p_partkey % 10000),
      |                                 ':', -1)), '-', '', 'g') AS issn
      |FROM part ORDER BY p_partkey""".stripMargin

  /** F7: unicode/mojibake repair via the custom Catalyst expression.
    * Mojibake is manufactured in-plan (UTF-8 bytes re-read as Latin-1);
    * the oracle is the *original* accented text — so the query passes
    * only if the expression truly inverts the corruption. */
  val f7UnicodeSanitize: Q = (s, dir) => {
    import s.implicits._
    Tables.load(s, dir, "documents")
      .withColumn("accented", regexp_replace($"text", "a", "à"))
      .withColumn("mojibake", decode(encode($"accented", "UTF-8"), "ISO-8859-1"))
      .select($"doc_id", unicode_sanitize($"mojibake").as("repaired"))
      .orderBy($"doc_id")
  }

  val f7UnicodeSanitizeSql: String =
    """SELECT doc_id, regexp_replace(text, 'a', 'à', 'g') AS repaired
      |FROM documents ORDER BY doc_id""".stripMargin

  /** F8: character-whitelist clean applied to every string column
    * (DB/ETL.ipynb c25) — junk injected then stripped. */
  val f8WhitelistClean: Q = (s, dir) => {
    import s.implicits._
    val clean = (c: org.apache.spark.sql.Column) =>
      regexp_replace(c, "[^A-Za-zÀ-ÿ0-9\\s'-]", "")
    Tables.load(s, dir, "documents")
      .withColumn("noisy", concat(lit("«"), $"text", lit("»!@#")))
      .select($"doc_id", clean($"noisy").as("cleaned"), clean($"source").as("src"))
      .orderBy($"doc_id")
  }

  val f8WhitelistCleanSql: String =
    """SELECT doc_id,
      |  regexp_replace('«' || text || '»!@#', '[^A-Za-zÀ-ÿ0-9 \t\n\x0b\f\r''-]', '', 'g') AS cleaned,
      |  regexp_replace(source, '[^A-Za-zÀ-ÿ0-9 \t\n\x0b\f\r''-]', '', 'g') AS src
      |FROM documents ORDER BY doc_id""".stripMargin

  /** F11: SQL-literal encoding — NULL for missing, numbers verbatim,
    * strings quoted with '' escaping (DB/iqueries generator.py:24-45). */
  val f11SqlLiteral: Q = (s, dir) => {
    import s.implicits._
    Tables.load(s, dir, "customer")
      .withColumn("nm", regexp_replace($"c_name", "#", "'"))
      .withColumn("bal", when($"c_custkey" % 11 === 0, lit(null)).otherwise($"c_acctbal"))
      .select(
        $"c_custkey",
        concat(lit("INSERT INTO customers VALUES ("),
          $"c_custkey", lit(", "),
          concat(lit("'"), regexp_replace($"nm", "'", "''"), lit("'")), lit(", "),
          when($"bal".isNull, lit("NULL")).otherwise($"bal".cast("string")),
          lit(");")).as("stmt"))
      .orderBy($"c_custkey")
  }

  val f11SqlLiteralSql: String =
    """SELECT c_custkey,
      |  'INSERT INTO customers VALUES (' || c_custkey || ', ' ||
      |  '''' || replace(replace(c_name, '#', ''''), '''', '''''') || '''' || ', ' ||
      |  CASE WHEN c_custkey % 11 = 0 THEN 'NULL'
      |       ELSE CAST(c_acctbal AS VARCHAR) END || ');' AS stmt
      |FROM customer ORDER BY c_custkey""".stripMargin

  /** F12+F13: full-name assembly (concat_ws) + distinct-array dedup
    * (ScienceDirect.py:64-67, :86,:133-140). */
  val f12ConcatDistinct: Q = (s, dir) => {
    import s.implicits._
    Tables.load(s, dir, "documents")
      .select(
        $"doc_id",
        concat_ws(" ", $"source", $"lang").as("full_name"),
        size(array_distinct(split($"text", " "))).as("n_distinct_words"))
      .orderBy($"doc_id")
  }

  val f12ConcatDistinctSql: String =
    """SELECT doc_id,
      |  concat_ws(' ', source, lang) AS full_name,
      |  len(list_distinct(string_split(text, ' '))) AS n_distinct_words
      |FROM documents ORDER BY doc_id""".stripMargin

  /** A5: citation-count parse "Cited by (7)" → 7
    * (ScienceDirect/ScienceDirect.py:272-286). */
  val a5CitationParse: Q = (s, dir) => {
    import s.implicits._
    Tables.load(s, dir, "lineitem")
      .withColumn("cited", concat(lit("Cited by ("), $"l_linenumber", lit(")")))
      .groupBy($"l_returnflag")
      .agg(sum(regexp_extract($"cited", "\\((\\d+)\\)", 1).cast("long")).as("total_citations"))
      .orderBy($"l_returnflag")
  }

  val a5CitationParseSql: String =
    """SELECT l_returnflag,
      |  CAST(sum(CAST(regexp_extract('Cited by (' || l_linenumber || ')', '\((\d+)\)', 1) AS BIGINT)) AS BIGINT)
      |    AS total_citations
      |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin

  private def canonCaseSql(x: String): String =
    "CASE " + graft.etl.Clean.countryAliases.toSeq.sortBy(_._1)
      .map { case (k, v) => s"WHEN $x = '$k' THEN '$v'" }.mkString(" ") +
      s" ELSE $x END"

  /** F9: country canonicalization over an array via broadcast alias map
    * + transform HOF — the replacement for the reference's pycountry
    * Python UDF (DB/ETL.ipynb c20). */
  val f9CountryCanon: Q = (s, dir) => {
    import s.implicits._
    Tables.load(s, dir, "customer")
      .join(Tables.load(s, dir, "nation"), $"c_nationkey" === $"n_nationkey")
      .withColumn("countries", array($"n_name", lit("USA"), lit("Republic of Korea")))
      .select($"c_custkey",
        array_join(transform($"countries", graft.etl.Clean.canonCountry(_)), "|").as("canon"))
      .orderBy($"c_custkey")
  }

  val f9CountryCanonSql: String =
    s"""SELECT c_custkey,
       |  array_to_string(list_transform([n_name, 'USA', 'Republic of Korea'],
       |                                 x -> ${canonCaseSql("x")}), '|') AS canon
       |FROM customer JOIN nation ON c_nationkey = n_nationkey
       |ORDER BY c_custkey""".stripMargin

  /** F10: the same canonicalization INSIDE an array<struct>, preserving
    * the 4-field struct (the reference's second UDF, c21) — verified by
    * exploding the transformed structs back to scalars. */
  val f10StructCanon: Q = (s, dir) => {
    import s.implicits._
    Tables.load(s, dir, "customer")
      .join(Tables.load(s, dir, "nation"), $"c_nationkey" === $"n_nationkey")
      .withColumn("affs", array(struct(
        $"c_name".as("author"), lit("PRC").as("country"),
        lit("loc").as("location"), $"n_name".as("university"))))
      .withColumn("affs", transform($"affs", a => struct(
        a.getField("author").as("author"),
        graft.etl.Clean.canonCountry(a.getField("country")).as("country"),
        a.getField("location").as("location"),
        a.getField("university").as("university"))))
      .select($"c_custkey", explode($"affs").as("a"))
      .select($"c_custkey", $"a.author", $"a.country", $"a.university")
      .orderBy($"c_custkey")
  }

  val f10StructCanonSql: String =
    """SELECT c_custkey, c_name AS author, 'China' AS country, n_name AS university
      |FROM customer JOIN nation ON c_nationkey = n_nationkey
      |ORDER BY c_custkey""".stripMargin

  /** F14: JSON scalar functions — serialize a struct per row
    * (`to_json`) and extract fields back out (`get_json_object`) —
    * the in-row JSON surface a semi-structured pipeline needs beyond
    * the file-level readers (S1). Each engine round-trips through its
    * OWN serializer, so only the extracted VALUES are compared (JSON
    * text formatting is engine-specific and never hashed). */
  val f14JsonExtract: Q = (s, dir) => {
    import s.implicits._
    Tables.load(s, dir, "documents")
      .select($"doc_id",
        to_json(struct($"lang", $"source", $"n_chars")).as("j"))
      .select($"doc_id",
        get_json_object($"j", "$.lang").as("lang"),
        get_json_object($"j", "$.n_chars").cast("long").as("n_chars"))
      .orderBy($"doc_id")
  }

  val f14JsonExtractSql: String =
    """WITH j AS (
      |  SELECT doc_id,
      |    to_json(struct_pack(lang := lang, source := source,
      |                        n_chars := n_chars)) AS j
      |  FROM documents)
      |SELECT doc_id,
      |  json_extract_string(j, '$.lang') AS lang,
      |  CAST(json_extract_string(j, '$.n_chars') AS BIGINT) AS n_chars
      |FROM j ORDER BY doc_id""".stripMargin

  val defs: Map[String, Q] = Map(
    "f9_country_canon"  -> f9CountryCanon,
    "f10_struct_canon"  -> f10StructCanon,
    "f1_affiliation_split" -> f1AffiliationSplit,
    "f2_split_last"        -> f2SplitLast,
    "f3_extract_nth"       -> f3ExtractNth,
    "f5_cleanup"           -> f5Cleanup,
    "f6_issn_normalize"    -> f6IssnNormalize,
    "f7_unicode_sanitize"  -> f7UnicodeSanitize,
    "f8_whitelist_clean"   -> f8WhitelistClean,
    "f11_sql_literal"      -> f11SqlLiteral,
    "f12_concat_distinct"  -> f12ConcatDistinct,
    "f14_json_extract"     -> f14JsonExtract,
    "a5_citation_parse"    -> a5CitationParse,
  )

  val oracle: Map[String, String] = Map(
    "f9_country_canon"  -> f9CountryCanonSql,
    "f10_struct_canon"  -> f10StructCanonSql,
    "f1_affiliation_split" -> f1AffiliationSplitSql,
    "f2_split_last"        -> f2SplitLastSql,
    "f3_extract_nth"       -> f3ExtractNthSql,
    "f5_cleanup"           -> f5CleanupSql,
    "f6_issn_normalize"    -> f6IssnNormalizeSql,
    "f7_unicode_sanitize"  -> f7UnicodeSanitizeSql,
    "f8_whitelist_clean"   -> f8WhitelistCleanSql,
    "f11_sql_literal"      -> f11SqlLiteralSql,
    "f12_concat_distinct"  -> f12ConcatDistinctSql,
    "f14_json_extract"     -> f14JsonExtractSql,
    "a5_citation_parse"    -> a5CitationParseSql,
  )
}
