package graft.etl

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

/** Distributed-fetch seam (SURVEY S4/S5 structural equivalent).
  *
  * The reference's extract stage is a SEQUENTIAL driver loop: paginate
  * a search, collect article URLs, skip ones already visited, open
  * each in a tab, scrape, and append the parsed article to the landing
  * JSON — with per-article error recovery so one broken page skips one
  * article, never the run (ScienceDirect/ScienceDirect.py:492-592,
  * IEEE/IEEE.py:439-489). At 100 TB the same behavior must be a
  * DISTRIBUTED map: the URL list is a Dataset partitioned across
  * executors, the fetcher (browser/HTTP client — expensive to build)
  * is created once per partition via `mapPartitions`, and failures
  * become a per-row error column instead of a dead job.
  *
  * Network I/O itself is out of scope in this environment, so the
  * fetcher is an INJECTABLE trait — production supplies an HTTP/
  * headless-browser implementation; tests supply a deterministic mock.
  * Nothing else changes: the partitioning, retry, quarantine, and
  * downstream parse are the real, tested pipeline.
  *
  * Scale notes:
  *  - `repartition(parallelism)` spreads URLs evenly; parallelism is
  *    the politeness knob (concurrent connections = partitions), the
  *    distributed analogue of the reference's one-tab-at-a-time loop.
  *  - visited-URL dedup is a `distinct` BEFORE the fetch — the
  *    reference's `visited_links` set (ScienceDirect.py:552-560),
  *    shuffled once over the (tiny relative to bodies) URL relation.
  *  - bounded in-partition retry replaces the reference's
  *    skip-and-log; attempts are recorded so the landing data is
  *    auditable.
  *  - the output lands as (url, body, error, attempts): fetch results
  *    are data, not side effects. Parsing to articles is a separate
  *    stage ([[parseArticles]]) so a parse bug never re-fetches.
  */
object Fetch {

  /** Injectable fetch function. Built ONCE per partition inside
    * `mapPartitions` — implementations carry their expensive client
    * in `open()`, mirroring the reference's single shared WebDriver. */
  trait Fetcher extends Serializable {
    /** Called once per partition before any fetch; returns a handle
      * closed after the partition drains. */
    def open(): AutoCloseable
    /** Right(body) or Left(error message). MUST NOT throw for a bad
      * page — a thrown error kills the task and re-fetches the whole
      * partition, the exact failure mode the reference's per-article
      * try/except avoids. */
    def fetch(handle: AutoCloseable, url: String): Either[String, String]
  }

  /** One fetched page: body XOR error, with the attempt count. */
  case class Fetched(url: String, body: Option[String],
      error: Option[String], attempts: Int)

  /** Fetch every distinct URL with bounded retries.
    *
    * @param parallelism number of concurrent fetch partitions (the
    *        politeness/throughput knob)
    * @param maxAttempts in-partition retries per URL before the row
    *        is quarantined with its last error
    */
  def fetchAll(urls: Dataset[String], fetcher: Fetcher,
      parallelism: Int, maxAttempts: Int = 3): Dataset[Fetched] = {
    require(parallelism > 0, s"parallelism must be positive, got $parallelism")
    require(maxAttempts > 0, s"maxAttempts must be positive, got $maxAttempts")
    import urls.sparkSession.implicits._
    urls.distinct()            // the reference's visited-URL set
      .repartition(parallelism)
      .mapPartitions { it =>
        // per-partition init seam: the real browser/client opens HERE.
        // Closed via task-completion listener, not on iterator drain —
        // a downstream limit/take stops consuming early and would
        // otherwise leak the handle.
        val handle = fetcher.open()
        Option(org.apache.spark.TaskContext.get())
          .foreach(_.addTaskCompletionListener[Unit](_ => handle.close()))
        it.map { url =>
          var attempt = 0
          var result: Either[String, String] = Left("not attempted")
          while (attempt < maxAttempts && result.isLeft) {
            attempt += 1
            result =
              try fetcher.fetch(handle, url)
              catch { case e: Exception => Left(s"${e.getClass.getSimpleName}: ${e.getMessage}") }
          }
          Fetched(url, result.toOption, result.left.toOption, attempt)
        }
      }
  }

  /** (parsed articles, quarantined rows). Successful bodies parse
    * against the explicit article schema (never inference — S1's
    * contract); fetch errors and unparseable bodies quarantine WITH
    * their url and error so the retry queue is a select, not a log
    * grep. A body is unparseable when every schema field comes back
    * null — from_json's permissive mode yields an all-null struct for
    * well-formed-but-wrong JSON, and a null struct for malformed. */
  def parseArticles(fetched: Dataset[Fetched]): (DataFrame, DataFrame) = {
    val parsed = fetched.toDF()
      .withColumn("article",
        when(col("body").isNotNull, from_json(col("body"), Schemas.articleSchema)))
    val fieldCols = Schemas.articleSchema.fieldNames.map(f => col(s"article.`$f`"))
    val parseable = col("article").isNotNull &&
      fieldCols.map(_.isNotNull).reduce(_ || _)
    val good = parsed.filter(parseable).select(col("article.*"))
    val bad = parsed.filter(!coalesce(parseable, lit(false)))
      .select(col("url"),
        coalesce(col("error"), lit("unparseable body")).as("error"),
        col("attempts"), col("body"))
    (good, bad)
  }

  /** End-to-end extract: fetch → parse → land as JSONL ready for
    * [[Ingest.readArticlesJsonl]]; quarantine lands beside it. The
    * distributed form of the reference's save_to_json append loop
    * (IEEE/IEEE.py:469-470). */
  def extract(urls: Dataset[String], fetcher: Fetcher,
      landingDir: String, parallelism: Int, maxAttempts: Int = 3): Unit = {
    val (good, bad) = parseArticles(fetchAll(urls, fetcher, parallelism, maxAttempts))
    good.write.mode("overwrite").json(s"$landingDir/articles")
    bad.write.mode("overwrite").json(s"$landingDir/quarantine")
  }
}
