package graft.etl

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** MongoDB staging equivalence (SURVEY §2.1 S2 / §2.2 K3) — as FILES.
  *
  * The reference stages scraper output through MongoDB Atlas:
  * `insert_many` of the parsed JSON (DB/MongoDB.py:36-41) and a
  * re-export of `collection.find()` via `json.dump(default=str)`
  * (DB/ETL.ipynb c4) that the Spark stage then reads. The network
  * round-trip adds no transformation beyond Mongo's own document
  * encoding, so the engine-side equivalent is the FORMAT, not the
  * wire: MongoDB extended JSON (the `mongoexport` / `mongoimport`
  * document-per-line format with `{"$oid"}` / `{"$date"}` /
  * `{"$numberLong"}` wrappers).
  *
  *  - [[writeExtJsonl]] = K3: renders rows as canonical extended JSON,
  *    one document per line — a payload `mongoimport` (or any driver's
  *    `insert_many`) accepts verbatim. Distributed text write; no
  *    driver collect.
  *  - [[readExtJsonl]] = S2: reads such an export back with an explicit
  *    schema, unwrapping canonical (`{"$date":{"$numberLong":"ms"}}`)
  *    and relaxed (`{"$date":"ISO-8601"}`) forms. The notebook's
  *    `default=str` export is the degenerate case of this — every
  *    wrapper already flattened to a plain string — and is covered by
  *    [[Ingest.readArticles]].
  *
  * Unwrapping is a codegen'd `regexp_replace` chain, NOT a UDF. It is
  * safe against wrapper-shaped text inside document string values: a
  * JSON encoder escapes the quotes (`{\"$oid\"...`), so the patterns —
  * which require an unescaped `"` after `{` — cannot match inside any
  * well-formed string literal (spec-pinned in MongoStageSpec).
  *
  * 100 TB posture: both directions are single-pass narrow maps over
  * the lines — no shuffle, no inference pre-pass (explicit schema),
  * and the text source splits by file, so a terabyte landing dir of
  * exports parallelizes across executors like any other line format.
  */
object MongoStage {

  /** Deterministic ObjectId-shaped surrogate: 24 hex chars derived
    * from a key column. Mongo's own `_id` generation is time+random;
    * a re-runnable pipeline needs the same document to get the same
    * id on every run (same argument as the A3 surrogate keys). */
  def objectId(key: Column): Column =
    substring(md5(key.cast(StringType)), 1, 24)

  /** One row -> one canonical-extended-JSON document string.
    * `_id` gets the `{"$oid"}` wrapper from [[objectId]] over
    * `idFrom`; timestamps become `{"$date":{"$numberLong":"<ms>"}}`;
    * long/int/double become their `{"$numberX":"..."}` wrappers
    * (numeric wrappers quote the value, per the BSON spec); strings,
    * booleans and arrays pass through as plain JSON. Null fields are
    * omitted, matching a Mongo document with the field absent.
    * Wrappers apply to TOP-LEVEL fields only — values inside nested
    * structs/arrays are rendered as plain JSON (numbers unquoted,
    * timestamps ISO), which `mongoimport` still accepts; widen the
    * field mapping here if a nested field ever needs its exact BSON
    * type pinned.
    *
    * PRECISION CONTRACT: BSON dates are epoch-MILLIS, so `$date` via
    * `unix_millis` truncates sub-millisecond precision — a Spark
    * TimestampType value with `micros % 1000 != 0` round-trips
    * through [[writeExtJsonl]]/[[readExtJsonl]] floored to the
    * millisecond. This is Mongo's own ceiling, not a lossy choice
    * here (the reference stages through real BSON and pays the same
    * truncation); pre-round timestamps or carry an extra micros
    * column if exactness below 1 ms matters. Pinned by
    * MongoStageSpec. */
  def toExtJson(df: DataFrame, idFrom: String): Column = {
    def wrap(inner: Column, tag: String): Column = struct(inner.as(tag))
    // the generated `_id` REPLACES any source `_id` column — emitting
    // both would produce a duplicate JSON key (last-wins in most
    // parsers, silently losing the ObjectId)
    val fields = df.schema.fields.filter(_.name != "_id").map { f =>
      val c = col(f.name)
      val wrapped = f.dataType match {
        case TimestampType =>
          wrap(wrap(unix_millis(c).cast(StringType), "$numberLong"), "$date")
        case LongType    => wrap(c.cast(StringType), "$numberLong")
        case IntegerType => wrap(c.cast(StringType), "$numberInt")
        case DoubleType  => wrap(c.cast(StringType), "$numberDouble")
        case _           => c
      }
      when(c.isNotNull, wrapped).as(f.name)
    }
    // NULL idFrom → omit `_id` entirely (mongoimport then assigns one),
    // never `"_id":{}` — md5(NULL) is NULL and ignoreNullFields would
    // render the wrapper as an empty document, which mongoimport rejects
    val idField = when(col(idFrom).isNotNull,
      wrap(objectId(col(idFrom)), "$oid")).as("_id")
    to_json(struct(idField +: fields.toSeq: _*))
  }

  /** K3: write `df` as a mongoimport-ready document-per-line export. */
  def writeExtJsonl(df: DataFrame, idFrom: String, path: String): Unit =
    df.select(toExtJson(df, idFrom).as("value"))
      .write.mode("overwrite").text(path)

  /** Rewrite extended-JSON wrappers to plain JSON scalars. Inner
    * wrappers first so `{"$date":{"$numberLong":"ms"}}` reduces in two
    * steps; the relaxed ISO `$date` keeps its quotes for the cast in
    * [[readExtJsonl]]. */
  def normalizeExtJson(line: Column): Column = {
    val steps: Seq[(String, String)] = Seq(
      ("""\{\s*"\$oid"\s*:\s*("[0-9a-fA-F]{24}")\s*\}""", "$1"),
      ("""\{\s*"\$numberLong"\s*:\s*"(-?\d+)"\s*\}""", "$1"),
      ("""\{\s*"\$numberInt"\s*:\s*"(-?\d+)"\s*\}""", "$1"),
      // exponent sign ("1.5E-10") and the BSON non-finite tokens —
      // bare NaN/Infinity parse because Spark's JSON reader defaults
      // allowNonNumericNumbers=true
      ("""\{\s*"\$numberDouble"\s*:\s*"(NaN|-?Infinity|-?[0-9][0-9.eE+\-]*)"\s*\}""", "$1"),
      ("""\{\s*"\$numberDecimal"\s*:\s*"(-?[0-9][0-9.eE+\-]*)"\s*\}""", "$1"),
      ("""\{\s*"\$date"\s*:\s*(-?\d+)\s*\}""", "$1"),
      ("""\{\s*"\$date"\s*:\s*("[^"]+")\s*\}""", "$1"))
    steps.foldLeft(line) { case (c, (pat, rep)) => regexp_replace(c, pat, rep) }
  }

  /** S2: read a document-per-line extended-JSON export with an explicit
    * target schema. TimestampType fields accept both canonical
    * epoch-millis and relaxed ISO-8601 `$date` payloads: parsed as
    * string, then branched on shape (an `rlike` digit guard, because
    * ANSI mode makes a blind numeric cast THROW on the ISO form —
    * try_cast on the ISO branch keeps a malformed date a null row,
    * not a dead job). */
  def readExtJsonl(spark: SparkSession, path: String,
                   schema: StructType): DataFrame = {
    val tsFields = schema.fields.filter(_.dataType == TimestampType).map(_.name)
    val parseSchema = StructType(schema.fields.map { f =>
      if (f.dataType == TimestampType) f.copy(dataType = StringType) else f
    })
    val parsed = spark.read.text(path)
      .select(from_json(normalizeExtJson(col("value")), parseSchema).as("d"))
      .select("d.*")
    tsFields.foldLeft(parsed) { (df, name) =>
      // try_cast on BOTH branches: the rlike digit guard admits
      // strings beyond Long range (e.g. 20 digits), where a plain
      // cast throws under ANSI — the exact dead-job failure this
      // method's contract rules out
      df.withColumn(name, when(col(name).rlike("^-?\\d+$"),
          timestamp_millis(expr(s"try_cast(`$name` AS BIGINT)")))
        .otherwise(expr(s"try_cast(`$name` AS TIMESTAMP)")))
    }
  }
}
