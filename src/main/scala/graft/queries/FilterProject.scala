package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

import graft.Tables

/** Projection / filter / predicate operators (SURVEY §2.3) over the
  * testdata tables. The json `props` column stands in for the
  * reference's nested structs (publisher.*); `split(text)` arrays stand
  * in for its keywords/authors arrays.
  */
object FilterProject {

  type Q = (SparkSession, String) => DataFrame

  /** P1: nested-field null/sentinel predicate — the publisher
    * null-filter (DB/ETL.ipynb c13) shape over a nested (json) field. */
  val p1NestedFilter: Q = (s, dir) => {
    import s.implicits._
    Tables.load(s, dir, "events")
      .withColumn("k", get_json_object($"props", "$.k"))
      .filter($"k".isNotNull && $"k" =!= "" && $"k" =!= "69")
      .select($"event_id", $"k")
      .orderBy($"event_id")
  }

  val p1NestedFilterSql: String =
    """SELECT event_id, json_extract_string(props, '$.k') AS k
      |FROM events
      |WHERE json_extract_string(props, '$.k') IS NOT NULL
      |  AND json_extract_string(props, '$.k') <> ''
      |  AND json_extract_string(props, '$.k') <> '69'
      |ORDER BY event_id""".stripMargin

  /** P3: na.drop on a nullable column (ref: dropna on citations,
    * DB/ETL.ipynb c15). The null is manufactured (testdata has none)
    * then dropped through the same API the ref uses. */
  val p3DropNa: Q = (s, dir) => {
    import s.implicits._
    Tables.load(s, dir, "events")
      .withColumn("v", when($"value" >= 5.0, $"value"))
      .na.drop(Seq("v"))
      .select($"event_id", $"v")
      .orderBy($"event_id")
  }

  val p3DropNaSql: String =
    """SELECT event_id, value AS v FROM events
      |WHERE value >= 5.0
      |ORDER BY event_id""".stripMargin

  /** P4: array-size predicate (ref: size(authors) > 0, c16/c17). */
  val p4ArraySize: Q = (s, dir) => {
    import s.implicits._
    Tables.load(s, dir, "documents")
      .withColumn("words", split($"text", " "))
      .filter(size($"words") > 40)
      .select($"doc_id", size($"words").as("n_words"))
      .orderBy($"doc_id")
  }

  val p4ArraySizeSql: String =
    """SELECT doc_id, len(string_split(text, ' ')) AS n_words
      |FROM documents
      |WHERE len(string_split(text, ' ')) > 40
      |ORDER BY doc_id""".stripMargin

  /** P5: array-membership predicate (ref: array_contains on countries,
    * c22 — implemented as the evident intent, see SURVEY §7 hazard 2). */
  val p5ArrayContains: Q = (s, dir) => {
    import s.implicits._
    Tables.load(s, dir, "documents")
      .withColumn("words", split($"text", " "))
      .filter(array_contains($"words", "spark") && !array_contains($"words", "window"))
      .select($"doc_id")
      .orderBy($"doc_id")
  }

  val p5ArrayContainsSql: String =
    """SELECT doc_id FROM documents
      |WHERE list_contains(string_split(text, ' '), 'spark')
      |  AND NOT list_contains(string_split(text, ' '), 'window')
      |ORDER BY doc_id""".stripMargin

  /** P6: higher-order array filter (ref: filter(authors_with_affiliations,
    * x -> x.country not rlike email), c22). */
  val p6HofFilter: Q = (s, dir) => {
    import s.implicits._
    Tables.load(s, dir, "documents")
      .withColumn("words", split($"text", " "))
      .select($"doc_id",
        array_join(filter($"words", w => w.rlike("^s")), " ").as("s_words"))
      .orderBy($"doc_id")
  }

  val p6HofFilterSql: String =
    """SELECT doc_id,
      |  coalesce(array_to_string(list_filter(string_split(text, ' '),
      |                           w -> regexp_matches(w, '^s')), ' '), '') AS s_words
      |FROM documents
      |ORDER BY doc_id""".stripMargin

  /** P7+P8: column drop + projection with nested access and alias
    * (ref: drop Downloads/_id c18/c23; select publisher.ISSN alias c31). */
  val p8ProjectAlias: Q = (s, dir) => {
    import s.implicits._
    Tables.load(s, dir, "events")
      .drop("props", "ts")
      .select(
        $"event_id".as("id"),
        upper($"event_type").as("etype"),
        $"user_id", $"value")
      .orderBy($"id")
  }

  val p8ProjectAliasSql: String =
    """SELECT event_id AS id, upper(event_type) AS etype, user_id, value
      |FROM events
      |ORDER BY id""".stripMargin

  /** P10: dedup-at-ingest keeping the first row per key (ref: visited-URL
    * set, ScienceDirect.py:552-563 → dropDuplicates("doi")); expressed
    * deterministically as row_number()=1 by arrival order. */
  val p10DedupIngest: Q = (s, dir) => {
    import s.implicits._
    Tables.load(s, dir, "events")
      .withColumn("rn", row_number().over(
        Window.partitionBy($"user_id", $"event_type").orderBy($"event_id")))
      .filter($"rn" === 1)
      .select($"user_id", $"event_type", $"event_id".as("first_event"))
      .orderBy($"user_id", $"event_type")
  }

  val p10DedupIngestSql: String =
    """SELECT user_id, event_type, event_id AS first_event
      |FROM events
      |QUALIFY row_number() OVER (PARTITION BY user_id, event_type ORDER BY event_id) = 1
      |ORDER BY user_id, event_type""".stripMargin

  val defs: Map[String, Q] = Map(
    "p1_nested_filter"  -> p1NestedFilter,
    "p3_dropna"         -> p3DropNa,
    "p4_array_size"     -> p4ArraySize,
    "p5_array_contains" -> p5ArrayContains,
    "p6_hof_filter"     -> p6HofFilter,
    "p8_project_alias"  -> p8ProjectAlias,
    "p10_dedup_ingest"  -> p10DedupIngest,
  )

  val oracle: Map[String, String] = Map(
    "p1_nested_filter"  -> p1NestedFilterSql,
    "p3_dropna"         -> p3DropNaSql,
    "p4_array_size"     -> p4ArraySizeSql,
    "p5_array_contains" -> p5ArrayContainsSql,
    "p6_hof_filter"     -> p6HofFilterSql,
    "p8_project_alias"  -> p8ProjectAliasSql,
    "p10_dedup_ingest"  -> p10DedupIngestSql,
  )
}
