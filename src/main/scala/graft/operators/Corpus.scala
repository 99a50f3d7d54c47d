package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Corpus-curation operators a large-scale training-data pipeline
  * needs beyond dedup: PII redaction, repetition-quality signals
  * (the Gopher-style filters), and domain-mix rebalancing. All
  * arithmetic is integer (basis points) or identical-double on both
  * engines, so every operator is oracle-exact.
  */
object Corpus {

  // ---- PII redaction ------------------------------------------------

  /** ASCII-only patterns, valid and identical under both Java regex
    * (Spark) and RE2 (DuckDB): no \b (Unicode-vs-ASCII divergence —
    * see TextFunctions), no lookarounds (RE2 lacks them). */
  val emailPattern = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
  val phonePattern = "[0-9]{3}-[0-9]{4}"

  /** Redact emails then phone-shaped digit runs from `textCol`,
    * appending match counts. Counting happens on the ORIGINAL text
    * (a redacted email can't hide a phone it contained — the phone
    * pass runs on the email-redacted string, but its count is from
    * the source). Pure per-row expressions: embarrassingly parallel,
    * no shuffle, stays in whole-stage codegen. */
  def redactPii(df: DataFrame, textCol: String): DataFrame = {
    val t = col(textCol)
    df.withColumn("n_emails",
        size(regexp_extract_all(t, lit(emailPattern), lit(0))).cast("long"))
      .withColumn("n_phones",
        size(regexp_extract_all(t, lit(phonePattern), lit(0))).cast("long"))
      .withColumn("redacted",
        regexp_replace(regexp_replace(t, emailPattern, "<EMAIL>"),
          phonePattern, "<PHONE>"))
  }

  // ---- credit-card detection with Luhn validation -------------------

  /** Dashed 16-digit payment-card candidate (4-4-4-4 grouping — the
    * canonical display form). ASCII-only, lookaround-free: Java regex
    * and RE2 agree on every match (the emailPattern discipline). */
  val cardPattern = "[0-9]{4}-[0-9]{4}-[0-9]{4}-[0-9]{4}"

  /** Luhn (mod-10) checksum validity of a dashed 16-digit candidate.
    * With the check digit rightmost, every second digit from the right
    * is doubled (digits > 9 drop 9) — for a 16-digit number that is
    * the odd 1-based positions from the LEFT. Pure integer expression
    * arithmetic over `sequence`/`transform`/`aggregate`: no UDF, stays
    * per-row, and replays verbatim in any engine with list lambdas.
    * This is what separates PII *detection* from t10's pattern
    * matching: a random 16-digit string passes the regex but fails the
    * checksum 90% of the time, so validating cuts false redactions an
    * order of magnitude at corpus scale. */
  def luhnValid(card: Column): Column = {
    val ds = regexp_replace(card, "-", "")
    val terms = transform(sequence(lit(1), lit(16)), i => {
      val d = ascii(ds.substr(i, lit(1))) - lit(48)
      val dbl = d * 2
      when(i % 2 === 1, when(dbl > 9, dbl - 9).otherwise(dbl)).otherwise(d)
    })
    aggregate(terms, lit(0), (a, x) => a + x) % 10 === 0
  }

  /** Detect and redact Luhn-VALID card numbers from `textCol`,
    * appending candidate and valid counts. Only validated numbers are
    * replaced — checksum-failing lookalikes (order ids, serials) stay,
    * which is the operational point: over-redaction destroys training
    * text. Replacement is an `aggregate` fold of literal `replace`
    * over the validated list (no second regex pass, no lookarounds).
    * Per-row expressions only: embarrassingly parallel, no shuffle. */
  def redactCards(df: DataFrame, textCol: String): DataFrame = {
    val t = col(textCol)
    val cands = regexp_extract_all(t, lit(cardPattern), lit(0))
    val valid = filter(cands, c => luhnValid(c))
    df.withColumn("n_card_candidates", size(cands).cast("long"))
      .withColumn("n_cards_valid", size(valid).cast("long"))
      .withColumn("redacted",
        aggregate(valid, t, (acc, c) => replace(acc, c, lit("<CARD>"))))
  }

  // ---- repetition signals (Gopher-style quality filters) -----------

  /** Per-document word-repetition statistics over a whitespace-token
    * stream: duplicate-token fraction and most-frequent-bigram
    * fraction, both in integer basis points (never a rounded float
    * quotient — engine round() modes diverge at ties, integer floor
    * division cannot). Shape: per-row word stats + one bigram explode
    * with a two-level per-doc argmax aggregation, merged by an
    * equi-join on doc_id: linear in corpus tokens, partitioned by
    * doc_id — the 100 TB form (reworked r13, see the body comment).
    *
    * Output per doc: n_words, n_distinct, dup_bp (fraction of tokens
    * that repeat an earlier token, = (n-distinct)/n), top_bigram (the
    * lexicographically-first most frequent adjacent pair), top_n, and
    * top_bp (= top_n/(n_words-1)); docs with < 2 words yield no row.
    */
  def repetitionStats(docs: DataFrame, idCol: String, textCol: String): DataFrame = {
    // r13 rework: n_words / n_distinct are pure per-row array
    // expressions (size / array_distinct — no explode, no countDistinct
    // Expand, fused into the scan); bigrams come from a per-row
    // adjacent-pair transform of the SAME filtered token array (the
    // hashedLinearScores construction — the old posexplode + per-doc
    // lead() window paid a corpus-wide shuffle+sort just to pair
    // neighbours), and the most-frequent bigram is a (doc, bigram)
    // count + per-doc min(struct(−cnt, bigram)) argmax aggregate (ties
    // = lexicographically first; no row_number window — the second
    // exchange moves one row per doc).
    val wf = filter(split(col(textCol), " "), x => x =!= "")
    val base = docs.select(col(idCol).as("doc_id"), wf.as("w"))
      .select(col("doc_id"), size(col("w")).cast("long").as("n_words"),
        size(array_distinct(col("w"))).cast("long").as("n_distinct"),
        col("w"))

    val wordStats = base.select(col("doc_id"), col("n_words"), col("n_distinct"))

    val topBigram = base
      .filter(col("n_words") >= 2)
      .select(col("doc_id"), explode(expr(
        "transform(sequence(0, size(w) - 2), i -> concat(w[i], ' ', w[i + 1]))"))
        .as("bigram"))
      .groupBy("doc_id", "bigram").agg(count(lit(1)).as("cnt"))
      .groupBy(col("doc_id"))
      .agg(min(struct((-col("cnt")).as("nc"), col("bigram").as("bg"))).as("m"))
      .select(col("doc_id"), col("m.bg").as("top_bigram"), (-col("m.nc")).as("top_n"))

    // `div` = exact integer division (Spark `/` on longs is DOUBLE
    // division — a rounded-quotient hazard the oracle can't replay)
    wordStats.join(topBigram, Seq("doc_id"))
      .filter(col("n_words") >= 2)
      .select(col("doc_id"), col("n_words"), col("n_distinct"),
        expr("((n_words - n_distinct) * 10000) div n_words").as("dup_bp"),
        col("top_bigram"), col("top_n"),
        expr("(top_n * 10000) div (n_words - 1)").as("top_bp"))
  }

  // ---- Gopher quality rules ----------------------------------------

  /** The full Gopher document-quality rule set (Rae et al. 2021,
    * §A.1.1 — the published filter battery MassiveText/Gopher applied
    * before training, and the de-facto baseline every later corpus
    * pipeline cites): word count in [50, 100000]; mean word length in
    * [3, 10]; symbol-to-word ratio ('#' and '...' hits) < 0.1; < 90%
    * of lines bullet-initial; < 30% of lines ellipsis-final; ≥ 80% of
    * words containing an alphabetic character; ≥ 2 of the 8 canonical
    * stopwords present. t2's qualityScore is a scalar HEURISTIC; this
    * is the named, citable RULE GATE with per-rule attribution — the
    * difference between "score 0.7" and "dropped by the bullet rule",
    * which is what a curation audit needs.
    *
    * Every ratio test is integer cross-multiplication (10·sym <
    * n_words, not sym/n_words < 0.1): no division, no rounding mode,
    * oracle-exact. One per-row expression pass — no explode, no
    * shuffle; at 100 TB this is a map-only stage fused into the scan.
    * Words split on spaces AND newlines; line metrics split on
    * newlines only, empty segments dropped from both. */
  def gopherRules(docs: DataFrame, textCol: String): DataFrame = {
    val t = col(textCol)
    val words = filter(split(t, "[ \n]+"), w => w =!= "")
    val lines = filter(split(t, "\n"), l => l =!= "")
    val stop = array(Seq("the", "be", "to", "of", "and", "that", "have", "with")
      .map(lit): _*)
    docs
      .withColumn("n_words", size(words).cast("long"))
      .withColumn("n_lines", size(lines).cast("long"))
      .withColumn("sum_len",
        aggregate(transform(words, w => length(w).cast("long")), lit(0L), (a, x) => a + x))
      .withColumn("sym_hits",
        (size(regexp_extract_all(t, lit("#"), lit(0))) +
         size(regexp_extract_all(t, lit("\\.\\.\\."), lit(0)))).cast("long"))
      .withColumn("bullet_lines",
        size(filter(lines, l => l.startsWith("- ") || l.startsWith("* "))).cast("long"))
      .withColumn("ellipsis_lines",
        size(filter(lines, l => l.endsWith("..."))).cast("long"))
      .withColumn("alpha_words",
        size(filter(words, w => w.rlike("[A-Za-z]"))).cast("long"))
      .withColumn("stop_hits",
        size(array_intersect(array_distinct(words), stop)).cast("long"))
      .withColumn("r_count", col("n_words") >= 50 && col("n_words") <= 100000)
      .withColumn("r_mean_len",
        lit(3) * col("n_words") <= col("sum_len") &&
          col("sum_len") <= lit(10) * col("n_words"))
      .withColumn("r_symbol", lit(10) * col("sym_hits") < col("n_words"))
      .withColumn("r_bullet", lit(10) * col("bullet_lines") < lit(9) * col("n_lines"))
      .withColumn("r_ellipsis", lit(10) * col("ellipsis_lines") < lit(3) * col("n_lines"))
      .withColumn("r_alpha", lit(5) * col("alpha_words") >= lit(4) * col("n_words"))
      .withColumn("r_stop", col("stop_hits") >= 2)
      .withColumn("keep",
        col("r_count") && col("r_mean_len") && col("r_symbol") && col("r_bullet") &&
          col("r_ellipsis") && col("r_alpha") && col("r_stop"))
  }

  /** The full Gopher REPETITION battery (Rae et al. 2021, Table A1 —
    * the per-document repetition signals MassiveText filtered on,
    * complementing [[gopherRules]]' document-quality gate and
    * [[repetitionStats]]' word/bigram pair): duplicate-line fraction
    * and duplicate-line CHARACTER fraction; the character share of the
    * most frequent {2,3,4}-gram; and the character share covered by
    * duplicated {5,10}-grams. All fractions are integer basis points
    * (floor division — never a rounded float quotient), so every value
    * replays exactly on any engine.
    *
    * Definitions (pinned here because published implementations vary):
    * words split on spaces AND newlines, lines on newlines, empty
    * segments dropped. `dup_line_bp` = lines beyond the first
    * occurrence of their content / lines; `dup_line_char_bp` the same
    * with line character lengths. `top{n}gram_bp` = (count of the most
    * frequent word n-gram, ties to the lexicographically first) × its
    * character length (separator spaces excluded) / total word
    * characters, capped at 10000 (overlapping occurrences can exceed
    * the doc — the Dolma-style count×len form). `dup{n}gram_bp` = the
    * character share of word POSITIONS covered by any n-gram occurring
    * ≥ 2 times within the document — a covered-position UNION (the t30
    * discipline), so overlaps never double-count and the value is a
    * true fraction. Docs with no lines/words emit zeros.
    *
    * Scale shape: the line metrics are pure per-row array expressions
    * (map-only, fused into the scan). Each gram family is one
    * corpus-linear explode + a (doc, gram)-keyed map-side-combined
    * count — duplicate detection is WITHIN-document, so every shuffle
    * key carries the doc id and hot grams cannot concentrate; the
    * covered-position union fans out HITS only (≤n× of duplicated
    * windows). Five doc-keyed left joins assemble the result — no
    * corpus-sized unpartitioned window, no driver materialization. */
  def gopherRepetition(docs: DataFrame, idCol: String, textCol: String): DataFrame = {
    val t = coalesce(col(textCol), lit(""))
    val base = docs.select(col(idCol).as("doc_id"),
        filter(split(t, "\n"), l => l =!= "").as("lines"),
        filter(split(t, "[ \n]+"), x => x =!= "").as("w"))
      .withColumn("n_lines", size(col("lines")).cast("long"))
      .withColumn("n_words", size(col("w")).cast("long"))
      .withColumn("total_chars", aggregate(
        transform(col("w"), x => length(x).cast("long")), lit(0L), (a, x) => a + x))
      .withColumn("line_chars", aggregate(
        transform(col("lines"), l => length(l).cast("long")), lit(0L), (a, x) => a + x))
      .withColumn("dls", array_distinct(col("lines")))
      .withColumn("distinct_line_chars", aggregate(
        transform(col("dls"), l => length(l).cast("long")), lit(0L), (a, x) => a + x))
      // base feeds the five gram branches AND the final assembly: one
      // tokenization, one materialization (the exactSpans convention)
      .localCheckpoint()

    // word n-grams with 1-based positions over the pre-tokenized w —
    // the wordNgrams guard inlined (sub-n docs yield an empty array,
    // which explode simply drops)
    def grams(n: Int) = base
      .select(col("doc_id"), col("total_chars"), posexplode(
        when(size(col("w")) >= n,
          transform(sequence(lit(0), size(col("w")) - n),
            i => array_join(slice(col("w"), i + lit(1), lit(n)), " ")))
          .otherwise(array().cast("array<string>"))).as(Seq("p0", "gram")))
      .select(col("doc_id"), col("total_chars"),
        (col("p0") + 1).cast("long").as("pos"), col("gram"))

    // most frequent n-gram per doc (ties lexicographic) → char share.
    // r13 rework: the per-doc argmax is a second AGGREGATE —
    // min(struct(−cnt, gram)) is exactly (cnt desc, gram asc) — not a
    // row_number window: the (doc, gram) counts partial-aggregate
    // map-side and the second exchange moves one row per doc, where
    // the window form re-shuffled and per-doc SORTED the full count
    // relation to rank it.
    def topShare(n: Int) = grams(n)
      .groupBy(col("doc_id"), col("total_chars"), col("gram"))
      .agg(count(lit(1)).as("cnt"))
      .groupBy(col("doc_id"), col("total_chars"))
      .agg(min(struct((-col("cnt")).as("nc"), col("gram"))).as("m"))
      .select(col("doc_id"), least(lit(10000L), expr(
        s"((-m.nc) * (length(m.gram) - ${n - 1}) * 10000) div total_chars"))
        .as(s"top${n}gram_bp"))

    // char share of positions covered by in-doc duplicated n-grams:
    // duplicate test = COUNT OVER the (doc, gram-hash) window (ONE
    // shuffle of the gram relation — the r13 t20/t28 rework; the old
    // groupBy + join-back shuffled it twice), hits-only ≤n× fan-out,
    // covered-position union, char weights looked up in the doc's own
    // word array
    def dupShare(n: Int) = {
      val wp = grams(n).select(col("doc_id"), col("pos"), md5(col("gram")).as("h"))
      wp.withColumn("cnt",
          count(lit(1)).over(Window.partitionBy(col("doc_id"), col("h"))))
        .filter(col("cnt") >= 2)
        .select(col("doc_id"), explode(expr(s"sequence(pos, pos + ${n - 1})")).as("p"))
        .distinct()
        .groupBy(col("doc_id")).agg(collect_set(col("p")).as(s"cov$n"))
    }

    Seq(topShare(2), topShare(3), topShare(4), dupShare(5), dupShare(10))
      .foldLeft(base)((acc, d) => acc.join(d, Seq("doc_id"), "left"))
      .select(col("doc_id"), col("n_words"), col("n_lines"),
        when(col("n_lines") > 0, expr(
          "((n_lines - size(dls)) * 10000) div n_lines")).otherwise(0L)
          .cast("long").as("dup_line_bp"),
        when(col("line_chars") > 0, expr(
          "((line_chars - distinct_line_chars) * 10000) div line_chars")).otherwise(0L)
          .cast("long").as("dup_line_char_bp"),
        coalesce(col("top2gram_bp"), lit(0L)).as("top2gram_bp"),
        coalesce(col("top3gram_bp"), lit(0L)).as("top3gram_bp"),
        coalesce(col("top4gram_bp"), lit(0L)).as("top4gram_bp"),
        when(col("cov5").isNull, lit(0L)).otherwise(expr(
          "aggregate(cov5, CAST(0 AS BIGINT), (a, p) -> a + length(element_at(w, CAST(p AS INT)))) " +
            "* 10000 div total_chars")).as("dup5gram_bp"),
        when(col("cov10").isNull, lit(0L)).otherwise(expr(
          "aggregate(cov10, CAST(0 AS BIGINT), (a, p) -> a + length(element_at(w, CAST(p AS INT)))) " +
            "* 10000 div total_chars")).as("dup10gram_bp"))
  }

  // ---- benchmark decontamination -----------------------------------

  /** All word n-grams of `textCol` as an array<string> column
    * (space-joined windows over the non-empty whitespace tokens).
    * Guarded: fewer than n words yields an empty array — Spark's
    * `sequence(0, -1)` would DESCEND, not return empty. */
  def wordNgrams(textCol: Column, n: Int): Column = {
    val w = filter(split(textCol, " "), x => x =!= "")
    when(size(w) >= n,
      transform(sequence(lit(0), size(w) - n),
        i => array_join(slice(w, i + lit(1), lit(n)), " ")))
      .otherwise(array().cast("array<string>"))
  }

  /** Benchmark decontamination — the training-corpus op that removes
    * eval leakage: a document is contaminated if it shares ANY word
    * n-gram with any benchmark item. Returns one row per contaminated
    * doc: (doc_id, n_hits, sample_ngram = lexicographically-first
    * matching n-gram).
    *
    * Scale shape: the benchmark side is small by definition (eval sets
    * are thousands of items, the corpus is billions of docs) — its
    * distinct n-grams broadcast, so the corpus side is one map-side
    * explode + broadcast semi-ish join + per-doc agg: a single pass,
    * no corpus-sized shuffle beyond the per-doc count. */
  def decontaminate(docs: DataFrame, bench: DataFrame, idCol: String,
      textCol: String, n: Int = 8): DataFrame = {
    val benchNgrams = bench
      .select(explode(wordNgrams(col(textCol), n)).as("ngram")).distinct()
    val docNgrams = docs
      .select(col(idCol).as("doc_id"),
        explode(wordNgrams(col(textCol), n)).as("ngram"))
    docNgrams.join(broadcast(benchNgrams), "ngram")
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_hits"), min(col("ngram")).as("sample_ngram"))
  }

  /** N-gram NOVELTY score (t39) — the corpus-diversity audit: per
    * document, the share of its word n-grams that occur NOWHERE else
    * in the corpus (corpus-wide occurrence count exactly 1). Low
    * novelty = the doc is assembled from text the corpus already has
    * (boilerplate mosaics, template pages, near-dups below d2's
    * threshold); corpus-mean novelty falling over ingestion batches is
    * the canonical "we're scraping the same web twice" signal. The
    * measurement complement to the REMOVAL ops: t13/t30 cut known
    * contamination, d1–d14 cut duplicates, t39 tells you how much
    * TRULY new text a batch added.
    *
    * Scale shape (r13 rework — one corpus-sized shuffle, down from
    * three): a count-1 gram occurs in exactly ONE document, so its
    * owner rides the gram-keyed count aggregate as `min(doc_id)` and
    * the corpus-sized join back to the instance relation (plus the
    * materialization it required) disappears — per-doc novel counts
    * come from a second, novel-grams-sized aggregate over the count
    * relation itself. `n_ngrams` is pure per-row arithmetic
    * (`max(0, n_words − n + 1)` — [[wordNgrams]]' window count)
    * fused into the scan, never an explode. Docs with fewer than n
    * words emit (0, 0, 0) — no grams, nothing to judge. Integer basis
    * points, floor division.
    *
    * Output: (doc_id, n_ngrams, n_novel, novelty_bp). */
  def ngramNovelty(docs: DataFrame, idCol: String, textCol: String,
      n: Int = 8): DataFrame = {
    val w = filter(split(coalesce(col(textCol), lit("")), " "), x => x =!= "")
    val base = docs.select(col(idCol).as("doc_id"),
      when(size(w) >= n, (size(w) - (n - 1)).cast("long")).otherwise(0L)
        .as("n_ngrams"))
    val novel = docs
      .select(col(idCol).as("doc_id"),
        explode(wordNgrams(coalesce(col(textCol), lit("")), n)).as("g"))
      .select(col("doc_id"), md5(col("g")).as("h"))
      .groupBy(col("h"))
      .agg(count(lit(1)).as("c"), min(col("doc_id")).as("doc_id"))
      .filter(col("c") === 1)
      .groupBy(col("doc_id")).agg(count(lit(1)).as("n_novel"))
    base.join(novel, Seq("doc_id"), "left")
      .select(col("doc_id"), col("n_ngrams"),
        coalesce(col("n_novel"), lit(0L)).as("n_novel"),
        when(col("n_ngrams") > 0,
          expr("(coalesce(n_novel, CAST(0 AS BIGINT)) * 10000) div n_ngrams"))
          .otherwise(0L).cast("long").as("novelty_bp"))
  }

  // ---- URL canonicalization (provenance-level dedup) ----------------

  /** Canonical form of an absolute http(s) URL — the provenance-dedup
    * key a web corpus groups by before content dedup (the same page
    * crawled as `HTTP://WWW.Site.com:80/a/?utm_source=x&b=2&a=1` and
    * `http://site.com/a?a=1&b=2` must collide). Rules, applied as one
    * codegen'd per-row expression chain (no UDF, no shuffle):
    * lowercase scheme and host; strip the scheme's default port
    * (`:80` / `:443`) and a leading `www.`; drop the fragment;
    * collapse an empty path to `/` and trailing slashes off a
    * non-root path; drop `utm_*` tracking parameters and sort the
    * survivors byte-lexicographically. Non-URL strings (no
    * `scheme://`) pass through unchanged, so the function is safe to
    * apply to a mixed column. ASCII-only, lookaround-free patterns —
    * Java regex and RE2 agree (the t15/emailPattern discipline). */
  def normalizeUrl(url: Column): Column = {
    val scheme = lower(regexp_extract(url, "^([A-Za-z][A-Za-z0-9+.-]*)://", 1))
    val hostport = lower(regexp_extract(url, "^[A-Za-z][A-Za-z0-9+.-]*://([^/?#]*)", 1))
    val noPort = when(scheme === "http", regexp_replace(hostport, ":80$", ""))
      .when(scheme === "https", regexp_replace(hostport, ":443$", ""))
      .otherwise(hostport)
    val host = regexp_replace(noPort, "^www\\.", "")
    val trimmedPath = regexp_replace(
      regexp_extract(url, "^[A-Za-z][A-Za-z0-9+.-]*://[^/?#]*([^?#]*)", 1),
      "/+$", "")
    val path = when(trimmedPath === "", lit("/")).otherwise(trimmedPath)
    // `^[^#?]*` anchors the '?' BEFORE any '#': a '?' inside the
    // fragment is fragment text, not a query marker
    val q = regexp_extract(url, "^[^#?]*[?]([^#]*)", 1)
    val kept = array_sort(filter(split(q, "&"),
      p => p =!= "" && !p.startsWith("utm_")))
    val qs = array_join(kept, "&")
    when(scheme === "", url).otherwise(
      concat(scheme, lit("://"), host, path,
        when(qs === "", lit("")).otherwise(concat(lit("?"), qs))))
  }

  // ---- domain-mix rebalancing --------------------------------------

  /** Rebalance a corpus to target per-domain mixture weights: given an
    * integer weight per source row (`weightCol`, e.g. derived from a
    * mixture spec), sample source s at rate
    * `keep_bp(s) = min(10000, floor(T*w_s/W) * 10000 / n_s)` where
    * T = floor(total/2) is the target corpus size and W the weight
    * total — i.e. each domain lands at its mixture share of T, capped
    * at what it actually has. The keep decision is a deterministic
    * salted md5 bucket of the row id, so the sample is engine- and
    * run-stable, and re-running on a grown corpus keeps a superset
    * semantics per bucket (same id -> same bucket).
    *
    * Scale shape: one small groupBy(source) count (|sources| rows; the
    * over-() windows run on that tiny frame, never the corpus), one
    * broadcast join back, then a per-row hash filter — a single
    * full-data pass with no corpus-sized shuffle.
    */
  def domainMix(docs: DataFrame, idCol: String, sourceCol: String,
      weightCol: Column): DataFrame = {
    // `bucket` (the row's salted md5 keep-bucket) is a DOCUMENTED
    // output column, not a leak: it is the audit trail that makes
    // every keep/drop decision explainable and re-checkable (the t12
    // gate pins it against the oracle). Guard the name up front — a
    // pre-existing `bucket` column would be silently overwritten.
    require(!docs.columns.contains("bucket"),
      "domainMix emits an audit column named 'bucket'; rename the input's bucket column")
    val counts = docs.groupBy(col(sourceCol).as("src"))
      .agg(count(lit(1)).as("n_s"))
      .withColumn("w_s", weightCol)
    val all = Window.partitionBy()
    val rates = counts
      .withColumn("t_total", expr("sum(n_s) over () div 2"))
      .withColumn("w_total", sum(col("w_s")).over(all))
      .withColumn("target_n", expr("(t_total * w_s) div w_total"))
      .withColumn("keep_bp", least(lit(10000L), expr("(target_n * 10000) div n_s")))
      .select(col("src"), col("keep_bp"))
    docs
      .withColumn("bucket",
        pmod(conv(substring(md5(concat(lit("mix:"), col(idCol).cast("string"))), 1, 10),
          16, 10).cast("long"), lit(10000L)))
      .join(broadcast(rates), col(sourceCol) === col("src"))
      .filter(col("bucket") < col("keep_bp"))
      .drop("src", "keep_bp")
  }

  // ---- weighted sampling -------------------------------------------

  /** Deterministic weighted sampling without replacement — the
    * Efraimidis–Spirakis A-ES scheme ("Weighted random sampling with
    * a reservoir", IPL 2006): each row draws a uniform u from a
    * salted md5 of its id and ranks by the key ln(u)/w (the monotone
    * log form of u^(1/w)); the top-m keys ARE a weighted sample
    * without replacement. The curation use: sample a training subset
    * where a document's inclusion odds follow its quality/length
    * weight, reproducibly — same id ⇒ same draw on any engine, any
    * partitioning, any corpus size.
    *
    * Determinism contract: u is the exact dyadic rational
    * (bucket+1)/2^24 from a 24-bit md5 prefix, so ln(u)/w is the same
    * IEEE double everywhere; the key is rounded to 6 decimals with
    * (key, id) ordering so a last-ulp log divergence cannot flip the
    * selection. Weights must be ≥ 1.
    *
    * Scale shape: one per-row expression pass + a global top-m —
    * Spark plans TakeOrderedAndProject (per-partition heaps, merge m
    * rows on the driver), never a full sort/shuffle of the corpus.
    * Output: (id, weight, key) — the m selected rows, best first. */
  def weightedSample(docs: DataFrame, idCol: String, weightCol: Column,
      m: Int, salt: String = "ws"): DataFrame = {
    val u = (pmod(conv(substring(md5(concat(lit(salt + ":"),
        col(idCol).cast("string"))), 1, 6), 16, 10).cast("long"),
        lit(1L << 24)) + 1).cast("double") / lit((1L << 24).toDouble)
    docs
      .select(col(idCol), weightCol.cast("double").as("weight"),
        (round(log(u) / weightCol.cast("double"), 6) + lit(0.0)).as("key"))
      .orderBy(col("key").desc, col(idCol).asc)
      .limit(m)
  }

  // ---- statistical LM quality scoring ------------------------------

  /** Corpus-trained bigram language-model scores — the classic
    * perplexity-style quality signal (a cheap stand-in for the
    * "score with a small LM, drop the tail" curation step, e.g.
    * CCNet's LM filter): train add-one-smoothed bigram statistics on
    * the corpus itself, then score every document by its mean log2
    * bigram probability. Low scores = improbable word sequences
    * (boilerplate, mojibake, shuffled text); unusually high scores =
    * degenerate repetition.
    *
    * p(w2|w1) = (c(w1 w2) + 1) / (c(w1 ·) + V), V = |vocabulary|.
    *
    * Determinism contract: counts are exact int64; each bigram's
    * log2 is rounded to 6 decimals and summed as DECIMAL(18,6) so
    * addition order cannot move a ulp on any engine; the mean is the
    * rounded DECIMAL sum over the exact bigram count.
    *
    * Scale shape: one explode over corpus tokens, two map-side-
    * combined count aggregations (bigram, unigram-prefix), one join
    * back on the bigram key and one on the prefix key — every stage
    * hash-partitioned on bounded keys, the vocabulary scalar crosses
    * as a 1-row broadcast. No corpus-sized window, no driver
    * materialization. At 100 TB the count relations are themselves
    * distributed — nothing assumes they fit anywhere.
    *
    * Output: (doc_id, n_bigrams, avg_log2p), docs with ≥ 2 words. */
  def bigramLmScores(docs: DataFrame, idCol: String, textCol: String): DataFrame = {
    // the bigram relation feeds three consumers (itself, c2, c1);
    // materialize it once instead of re-running the split+explode per
    // consumer (measured 5.4 s → materialized form at sf0.1,
    // SCALING.md). Corpus-linear rows; the cluster-scale equivalent
    // is persisting the tokenized relation.
    val bg = docs.select(col(idCol).as("doc_id"),
        explode(wordNgrams(col(textCol), 2)).as("bigram"))
      .withColumn("w1", element_at(split(col("bigram"), " "), 1))
      .localCheckpoint()
    val c2 = bg.groupBy("w1", "bigram").agg(count(lit(1)).as("c2"))
    // c1(w1) = Σ c2 over that prefix — derived from the vocab-sized
    // count relation, NOT by re-aggregating the corpus-sized instance
    // relation a second time
    val c1 = c2.groupBy("w1").agg(sum(col("c2")).as("c1"))
    val vocab = docs
      .select(explode(filter(split(col(textCol), " "), x => x =!= "")).as("w"))
      .agg(count_distinct(col("w")).as("v"))
    // per-bigram log-probability scored ONCE on the vocab-sized
    // relation, then joined to the instances (AQE broadcasts it when
    // it fits; key-partitioned hash join when it doesn't)
    val scored = c2.join(c1, "w1")
      .crossJoin(broadcast(vocab))
      .select(col("bigram"),
        round(log2((col("c2") + 1).cast("double") / (col("c1") + col("v"))), 6)
          .cast("decimal(18,6)").as("logp"))
    bg.join(scored, "bigram")
      .groupBy("doc_id")
      // the DECIMAL sum is exact (order-free); it converts to double
      // losslessly at this magnitude (micro-units < 2^53), so the
      // final division + round is one identical IEEE op per engine —
      // never a decimal division, whose result scale is engine-defined
      .agg(count(lit(1)).as("n_bigrams"),
        (round(sum(col("logp")).cast("double") / count(lit(1)), 6) + lit(0.0))
          .as("avg_log2p"))
  }

  // ---- repeated-substring span detection ---------------------------

  /** Repeated-substring spans — SUB-document dedup, the signal doc-
    * level dedup (d1/d2) cannot see: runs of k consecutive words that
    * occur ≥ 2 times anywhere in the corpus (license headers,
    * boilerplate navigation, quoted chunks). The windowed-fingerprint
    * formulation of suffix-array substring dedup (Lee et al.,
    * "Deduplicating Training Data Makes Language Models Better",
    * ACL 2022): every k-word window is fingerprinted, fingerprints
    * seen ≥ 2× mark their windows, and each document's marked window
    * positions are merged into maximal spans with a per-doc
    * gaps-and-islands pass.
    *
    * Scale shape (r13 rework): one window explode (corpus-linear),
    * then the duplicate test is a COUNT OVER the fingerprint-keyed
    * window — one shuffle of the window relation, where the previous
    * groupBy + semi-join-back shape shuffled it twice and had to
    * materialize it (two consumers). A hot fingerprint (corpus-wide
    * boilerplate) groups on one reducer either way — the t22
    * keeper-window discipline. The span merge stays partitioned BY
    * doc_id — no corpus-sized unpartitioned window, no driver
    * materialization. All arithmetic is integer positions; md5
    * fingerprints group identically on any engine.
    *
    * Output: (doc_id, span_start, span_end, n_windows) — 1-based
    * inclusive word indexes of each maximal repeated span, ordered. */
  def repeatedSpans(docs: DataFrame, idCol: String, textCol: String,
      k: Int = 10): DataFrame = {
    val wp = docs
      .select(col(idCol).as("doc_id"), split(col(textCol), " ").as("w"))
      .filter(size(col("w")) >= k)
      .select(col("doc_id"), explode(expr(
        s"transform(sequence(1, size(w) - ${k - 1}), " +
          s"i -> struct(CAST(i AS BIGINT) AS pos, md5(concat_ws(' ', slice(w, i, $k))) AS h))"))
        .as("x"))
      .select(col("doc_id"), col("x.pos").as("pos"), col("x.h").as("h"))
    val hits = wp
      .withColumn("nh", count(lit(1)).over(Window.partitionBy(col("h"))))
      .filter(col("nh") >= 2).select("doc_id", "pos")
    val byDoc = Window.partitionBy(col("doc_id")).orderBy(col("pos"))
    hits
      // islands: a window starts a new span when it does not overlap
      // or touch the previous marked window (positions ascend, window
      // length is constant, so lag(pos) is the running max start)
      .withColumn("brk",
        when(lag(col("pos"), 1).over(byDoc).isNull ||
          col("pos") > lag(col("pos"), 1).over(byDoc) + k, 1L).otherwise(0L))
      .withColumn("island", sum(col("brk")).over(
        byDoc.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .groupBy("doc_id", "island")
      .agg(min(col("pos")).as("span_start"),
        (max(col("pos")) + (k - 1)).as("span_end"),
        count(lit(1)).as("n_windows"))
      .drop("island")
  }

  /** Decontamination by SPAN EXCISION (t30) — the surgical variant of
    * [[decontaminate]]: instead of flagging (and typically dropping)
    * any document sharing a benchmark n-gram, cut exactly the
    * overlapping word spans out and keep the rest — the Lee et al.
    * exact-substring discipline applied to eval leakage, preserving
    * training tokens a whole-document drop would waste.
    *
    * A word index is removed iff ANY marked n-window covers it, which
    * is exactly the union of the maximal contaminated spans — computed
    * as a bounded fan-out (each hit covers n indices) into per-doc
    * covered-position SETS; excision is then a per-row array filter.
    *
    * Scale shape: bench n-grams broadcast (eval sets are small by
    * definition); the corpus side is one window explode + broadcast
    * join, a ≤n× expansion of the HITS only, one hits-sized aggregate,
    * and a left join back — the uncontaminated majority never sheds a
    * word row into a shuffle and passes its ORIGINAL text through
    * byte-identical. Output: (doc_id, total_words, removed_words,
    * cleaned_text), one row per input document. */
  def decontaminateSpans(docs: DataFrame, bench: DataFrame, idCol: String,
      textCol: String, n: Int = 8): DataFrame = {
    val benchNgrams = bench
      .select(explode(wordNgrams(col(textCol), n)).as("g"))
      .select(md5(col("g")).as("h")).distinct()
    // null text counts as empty; id keeps its OWN type (no cast — a
    // string-keyed corpus must not collapse into one null-id group)
    val text = coalesce(col(textCol), lit(""))
    val base = docs.select(col(idCol).as("doc_id"), text.as("__text"),
      filter(split(text, " "), x => x =!= "").as("w"))
    // windows via the shared guarded helper — ONE n-gram definition
    // (t11/t13/t19 use the same); md5 applied on top
    val wp = base
      .select(col("doc_id"),
        posexplode(wordNgrams(col("__text"), n)).as(Seq("p0", "g")))
      .select(col("doc_id"), (col("p0") + 1).cast("long").as("pos"),
        md5(col("g")).as("h"))
    // covered-position SETS exist only for docs with hits (rare by the
    // operator's premise): the corpus-wide anti-join + reassembly
    // shuffle of a word-exploded formulation is replaced by one small
    // aggregate + a left join; the uncontaminated majority passes its
    // ORIGINAL text through byte-identical, never re-tokenized
    val covSets = wp.join(broadcast(benchNgrams), "h")
      .select(col("doc_id"),
        explode(expr(s"sequence(pos, pos + ${n - 1})")).as("p"))
      .distinct()
      .groupBy(col("doc_id"))
      .agg(collect_set(col("p")).as("cov"))
    base.join(covSets, Seq("doc_id"), "left")
      .select(col("doc_id"),
        size(col("w")).cast("long").as("total_words"),
        when(col("cov").isNull, lit(0L))
          .otherwise(size(col("cov")).cast("long")).as("removed_words"),
        when(col("cov").isNull, col("__text"))
          // excision re-joins the surviving words with single spaces —
          // word-level surgery can't preserve intra-span whitespace,
          // and only TOUCHED docs pay that normalization
          .otherwise(concat_ws(" ", expr(
            "filter(w, (x, i) -> NOT array_contains(cov, CAST(i + 1 AS BIGINT)))")))
          .as("cleaned_text"))
  }

  /** EXACT duplicated-substring spans — suffix-array-fidelity
    * sub-document dedup (t28), the precision upgrade over
    * [[repeatedSpans]] (t20): t20's islands only guarantee every
    * k-window INSIDE a span is repeated SOMEWHERE, so an island can
    * splice windows repeated against different sources into a span
    * that never occurs twice as one string. This operator reports
    * spans that are PROVABLY exact duplicates, with their source:
    * each repeated k-word window is paired with its corpus-FIRST
    * occurrence (the keeper — a bucketed suffix-prefix group pass:
    * bucket = the k-word prefix fingerprint of the suffix at that
    * position), and runs of consecutive windows sharing one
    * (doc, src_doc, alignment) are merged. Overlapping k-windows that
    * all match under a FIXED alignment force the union substrings to
    * be word-identical, so every output row is an exact duplicated
    * substring of its source — the Lee et al. (ACL 2022) suffix-array
    * guarantee, without materializing suffixes.
    *
    * Maximality is per keeper-chain: a span whose true pairwise match
    * continues under a different first-occurrence provenance splits at
    * the provenance switch (sound, slightly conservative) — the cost
    * of keeping candidate pairs LINEAR in duplication (each occurrence
    * pairs only with its window's keeper, never all-pairs).
    *
    * Scale shape (r13 rework): one window explode (corpus-linear, one
    * pass), then keeper discovery is MIN/COUNT OVER the hash-keyed
    * window — one shuffle of the window relation, where the previous
    * groupBy + join-back shape shuffled it twice and materialized it
    * (two consumers); the island merge stays windowed by (doc,
    * src_doc, alignment). No corpus-sized unpartitioned window, no
    * quadratic pair emission (N occurrences of hot boilerplate → N−1
    * keeper pairs; the hot hash buffers one reducer's group either
    * way — the t22 keeper-window discipline).
    *
    * The keeper total order is min over a (doc_id, pos) STRUCT, so the
    * id keeps its OWN type: string-keyed corpora (every real web
    * corpus) order lexicographically, negative / arbitrarily large
    * numeric ids order numerically, and documents of any length work —
    * contrast the retired doc_id*100000+pos long encoding, which
    * null-cast string ids into one garbage group and overflowed past
    * ~9.2e13. Ids must be non-null (a null id row can never win a
    * null-safe keeper comparison deterministically).
    *
    * Output: (doc_id, span_start, span_end, span_words, src_doc,
    * src_start) — 1-based inclusive word positions; src_start is where
    * the identical words begin in the keeper document. src_doc carries
    * the id column's own type. */
  def exactSpans(docs: DataFrame, idCol: String, textCol: String,
      k: Int = 10): DataFrame = {
    val wp = docs
      .select(col(idCol).as("doc_id"), split(col(textCol), " ").as("w"))
      .filter(size(col("w")) >= k)
      .select(col("doc_id"), explode(expr(
        s"transform(sequence(1, size(w) - ${k - 1}), " +
          s"i -> struct(CAST(i AS BIGINT) AS pos, md5(concat_ws(' ', slice(w, i, $k))) AS h))"))
        .as("x"))
      .select(col("doc_id"), col("x.pos").as("pos"), col("x.h").as("h"))
    val byHash = Window.partitionBy(col("h"))
    val pairs = wp
      .withColumn("kmin", min(struct(col("doc_id"), col("pos"))).over(byHash))
      .withColumn("nh", count(lit(1)).over(byHash))
      .filter(col("nh") >= 2)
      // null-safe: the keeper row itself is excluded, every other
      // occurrence pairs with it
      .filter(!(col("doc_id") <=> col("kmin.doc_id") &&
        col("pos") <=> col("kmin.pos")))
      .select(col("doc_id"), col("pos"), col("kmin.doc_id").as("src_doc"),
        (col("pos") - col("kmin.pos")).as("delta"))
    val byAlign = Window
      .partitionBy(col("doc_id"), col("src_doc"), col("delta"))
      .orderBy(col("pos"))
    pairs
      // islands under a fixed alignment: consecutive positions extend
      // the exact match; pos - row_number is constant within a run
      .withColumn("grp", col("pos") - row_number().over(byAlign))
      .groupBy(col("doc_id"), col("src_doc"), col("delta"), col("grp"))
      .agg(min(col("pos")).as("span_start"),
        (max(col("pos")) + (k - 1)).as("span_end"))
      .select(col("doc_id"), col("span_start"), col("span_end"),
        (col("span_end") - col("span_start") + 1).as("span_words"),
        col("src_doc"), (col("span_start") - col("delta")).as("src_start"))
  }

  /** EXCISE exact duplicated substrings (t31) — the end state of the
    * Lee et al. (ACL 2022) exact-substring discipline that
    * [[exactSpans]] (t28) only REPORTS: every k-word window occurring
    * ≥ 2 times in the corpus keeps its first occurrence (the keeper,
    * same (doc_id, pos) struct total order as t28) and is cut from
    * every other occurrence; the surviving words are reassembled in
    * place. Every document with no repeated window passes through
    * byte-identical, and so does a keeper document none of whose
    * positions fall under a non-keeper window.
    *
    * A word index is removed iff a non-keeper marked window covers it
    * AND no keeper window in the same document does: keeper spans are
    * PROTECTED. Without the protection, overlapping occurrences —
    * periodic text ("w w w … w" spawns windows at pos 1,2,3 sharing
    * one orbit of hashes, of which only pos 1 is the keeper), or a
    * window first seen elsewhere overlapping this doc's own keeper
    * span — would excise the keeper's words and the duplicated text
    * could survive ZERO times instead of exactly once. With it, the
    * first occurrence of every duplicated window survives verbatim;
    * the (deliberate, conservative) flip side is that a non-keeper
    * window overlapping a protected keeper span keeps the overlapped
    * words, so cross-hash overlaps can let a few duplicated words
    * survive more than once — protection takes precedence.
    *
    * Coverage is computed as [[decontaminateSpans]] does: a bounded
    * ≤k× fan-out of the HITS only (keeper hits carry a flag) into
    * per-doc covered-position sets, excised = non-keeper cover MINUS
    * keeper cover, then a per-row array filter. Tokenization is the
    * empty-filtered [[wordNgrams]] stream (t30's), so null/empty text
    * and sub-k documents pass through unharmed.
    *
    * Scale shape (r13 rework): one window explode (corpus-linear),
    * then keeper discovery is MIN/COUNT OVER the hash-keyed window —
    * one shuffle of the window relation, where the previous groupBy +
    * join-back shape shuffled it twice and materialized it (two
    * consumers; the t28 rework, same hot-hash trade) — a hits-sized
    * coverage aggregate, and a left join back to the base — the
    * duplicate-free majority never sheds a word row into a shuffle.
    * No corpus-sized unpartitioned window, no driver materialization.
    *
    * Output: (doc_id, total_words, removed_words, cleaned_text), one
    * row per input document. */
  def exciseExactDuplicates(docs: DataFrame, idCol: String,
      textCol: String, k: Int = 10): DataFrame = {
    val text = coalesce(col(textCol), lit(""))
    val base = docs.select(col(idCol).as("doc_id"), text.as("__text"),
      filter(split(text, " "), x => x =!= "").as("w"))
    val wp = base
      .select(col("doc_id"),
        posexplode(wordNgrams(col("__text"), k)).as(Seq("p0", "g")))
      .select(col("doc_id"), (col("p0") + 1).cast("long").as("pos"),
        md5(col("g")).as("h"))
    // every occurrence of a duplicated window, keeper rows flagged:
    // excised positions = non-keeper cover MINUS keeper cover, so the
    // first occurrence of every duplicated window survives excision
    // even when a non-keeper window overlaps it (periodic text, or a
    // cross-hash overlap). Both collect_sets dedup map-side; the
    // conditional collect ignores the null branch.
    val byHash = Window.partitionBy(col("h"))
    val covSets = wp
      .withColumn("kmin", min(struct(col("doc_id"), col("pos"))).over(byHash))
      .withColumn("nh", count(lit(1)).over(byHash))
      .filter(col("nh") >= 2)
      .select(col("doc_id"),
        (col("doc_id") <=> col("kmin.doc_id") &&
          col("pos") <=> col("kmin.pos")).as("is_k"),
        explode(expr(s"sequence(pos, pos + ${k - 1})")).as("p"))
      .groupBy(col("doc_id"))
      .agg(array_except(
        collect_set(when(!col("is_k"), col("p"))),
        collect_set(when(col("is_k"), col("p")))).as("cov"))
    // a doc whose every covered position is keeper-protected ends with
    // an EMPTY cov — it must pass through byte-identical like the
    // never-touched (cov null) majority
    val untouched = col("cov").isNull || size(col("cov")) === 0
    base.join(covSets, Seq("doc_id"), "left")
      .select(col("doc_id"),
        size(col("w")).cast("long").as("total_words"),
        when(untouched, lit(0L))
          .otherwise(size(col("cov")).cast("long")).as("removed_words"),
        when(untouched, col("__text"))
          // same single-space reassembly contract as decontaminateSpans:
          // only TOUCHED docs pay the normalization
          .otherwise(concat_ws(" ", expr(
            "filter(w, (x, i) -> NOT array_contains(cov, CAST(i + 1 AS BIGINT)))")))
          .as("cleaned_text"))
  }

  // ---- corpus-level segment dedup (C4 / RefinedWeb line dedup) -----

  /** Remove every text segment whose content already appeared earlier
    * in the corpus, keeping only the globally-first occurrence — the
    * C4 "deduplicate by line" rule (and RefinedWeb's exact-substring
    * pass), adapted to the single-line synthetic corpus by treating
    * each run of `segWords` words as one segment. Differs from
    * `Dedup.exact` (d1): that drops whole duplicate DOCUMENTS; this
    * SURGICALLY removes duplicated spans and reassembles the
    * remaining text, so boilerplate shared across documents vanishes
    * while the unique remainder survives.
    *
    * First-occurrence is a total order: the keeper of a segment value
    * is the minimum (doc_id, seg_no) STRUCT, so the id keeps its OWN
    * type — string keys order lexicographically, any numeric id
    * numerically, documents of any segment count work (the retired
    * doc_id*100000+seg_no long encoding null-cast string ids and
    * needed a 100000-segment guard). Ids must be non-null. Plan shape:
    * one narrow explode, ONE shuffle by segment content for the
    * keeper window (a hot segment — boilerplate repeated across the
    * corpus — lands on one reducer but carries only small keys per
    * row), one shuffle by doc_id for the ordered reassembly, and a
    * doc-count-sized join against per-doc totals derived arithmetically
    * from the base scan (no extra shuffle for totals). No corpus-sized
    * unpartitioned window, no driver materialization.
    *
    * Output: (doc_id, total_segments, kept_segments, cleaned_text),
    * one row per input document, duplicated segments removed in place.
    */
  def segmentDedup(docs: DataFrame, idCol: String, textCol: String,
      segWords: Int = 10): DataFrame = {
    val base = docs.select(col(idCol).as("doc_id"),
        split(col(textCol), " ").as("w"))
      .withColumn("n_seg",
        expr(s"CAST(ceil(size(w) / ${segWords}.0) AS BIGINT)"))
    val seg = base
      .filter(col("n_seg") > 0)
      .select(col("doc_id"), explode(expr(
        s"transform(sequence(0, CAST(n_seg - 1 AS INT)), i -> struct(" +
          s"CAST(i AS BIGINT) AS seg_no, " +
          s"concat_ws(' ', slice(w, i * $segWords + 1, $segWords)) AS segment))"))
        .as("x"))
      .select(col("doc_id"), col("x.seg_no").as("seg_no"),
        col("x.segment").as("segment"))
    // keeper = first global occurrence of the segment's content,
    // ordered by the (doc_id, seg_no) struct — type-preserving
    val keeper = Window.partitionBy(col("segment"))
    val kept = seg
      .withColumn("kmin",
        min(struct(col("doc_id"), col("seg_no"))).over(keeper))
      .filter(struct(col("doc_id"), col("seg_no")) <=> col("kmin"))
      .drop("kmin")
    val reassembled = kept
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("kept_segments"),
        concat_ws(" ", expr(
          "transform(array_sort(collect_list(struct(seg_no, segment))), x -> x.segment)"))
          .as("cleaned_text"))
    base.select(col("doc_id"), col("n_seg").as("total_segments"))
      .join(reassembled, Seq("doc_id"), "left")
      .select(col("doc_id"), col("total_segments"),
        coalesce(col("kept_segments"), lit(0L)).as("kept_segments"),
        coalesce(col("cleaned_text"), lit("")).as("cleaned_text"))
  }

  // ---- content-defined chunking ------------------------------------

  /** Content-defined chunking — the Rabin/FastCDC boundary discipline
    * at word granularity: cut each document into variable-size chunks
    * at positions where a rolling window hash hits a boundary pattern,
    * so chunk edges are a function of CONTENT, not offsets. This is
    * what makes chunk-level dedup robust to edits: an insertion shifts
    * every fixed-width segment after it (segmentDedup's t22 regime
    * stops matching from the edit point on), but content-defined
    * boundaries RESYNCHRONIZE within one window width, so everything
    * past the edit still fingerprints identically — the storage-dedup
    * result (LBFS, Muthitacharoen et al. SOSP'01) applied to corpus
    * boilerplate.
    *
    * Boundary rule (engine-shared, no native hash dependence): a chunk
    * ends after word i when the first hex nibble of
    * `md5(w[i-2] ' ' w[i-1] ' ' w[i])` is '0' or '8' — P = 1/8, mean
    * chunk ≈ 8 words; the first window-1 words of a doc can't cut.
    *
    * Scale shape: ONE doc-keyed window shuffle computes the two lags,
    * the boundary flag, and the running chunk id (the t7 partitioned-
    * window discipline — never a global window); chunk assembly is a
    * (doc, chunk) groupBy with an in-group array_sort. Everything is
    * doc-local: corpus-linear, two doc-keyed shuffles, no pair space.
    * The id keeps its own type. Output: one row per chunk —
    * (doc_id, chunk_id, n_words, chunk_fp). */
  def cdcChunks(docs: DataFrame, idCol: String, textCol: String): DataFrame = {
    val words = docs
      .select(col(idCol).as("doc_id"),
        posexplode(filter(split(coalesce(col(textCol), lit("")), " "),
          x => x =!= "")).as(Seq("pos", "word")))
    val w = Window.partitionBy(col("doc_id")).orderBy(col("pos"))
    val flagged = words
      .withColumn("w1", lag(col("word"), 2).over(w))
      .withColumn("w2", lag(col("word"), 1).over(w))
      .withColumn("bflag",
        when(col("w1").isNotNull &&
          substring(md5(concat_ws(" ", col("w1"), col("w2"), col("word"))), 1, 1)
            .isin("0", "8"), 1L)
          .otherwise(0L))
      // chunk id = boundaries strictly BEFORE this word (a boundary
      // after word i opens a new chunk at i+1, not at i)
      .withColumn("chunk_id", coalesce(
        sum(col("bflag")).over(w.rowsBetween(Window.unboundedPreceding, -1)),
        lit(0L)))
    flagged
      .groupBy(col("doc_id"), col("chunk_id"))
      .agg(count(lit(1)).as("n_words"),
        md5(concat_ws(" ", expr(
          "transform(array_sort(collect_list(struct(pos, word))), x -> x.word)")))
          .as("chunk_fp"))
  }

  // ---- hashed linear quality classifier (fastText-style scoring) ---

  /** Score every document with a HASHED LINEAR classifier — the
    * fastText/CCNet-style quality-model scoring pass an LLM pipeline
    * runs after training a lightweight model: features are word
    * bigrams hashed into `buckets` slots (the hashing trick — no
    * vocabulary to broadcast, collisions are part of the model), and
    * the score is the integer sum of per-slot weights. Weights here
    * are a deterministic stand-in ((slot % 7) − 3 ∈ [−3,3]) so the
    * gate can replay them exactly; a trained model swaps in a
    * broadcast weight array without changing the plan.
    *
    * Scale shape: per-row bigram construction via an array transform
    * (NO per-doc window — contrast repetitionStats, which needs
    * ordering), one explode, and a map-side-combined per-doc sum:
    * corpus-linear, a single doc-keyed shuffle, all-integer. */
  def hashedLinearScores(docs: DataFrame, idCol: String, textCol: String,
      buckets: Int = 64): DataFrame = {
    val bg = docs
      .select(col(idCol).as("doc_id"),
        expr(s"filter(split(${textCol}, ' '), x -> x != '')").as("w"))
      .filter(size(col("w")) >= 2)
      .select(col("doc_id"), explode(expr(
        "transform(sequence(0, size(w) - 2), i -> concat(w[i], ' ', w[i + 1]))"))
        .as("bigram"))
    bg
      .withColumn("j", pmod(
        conv(substring(md5(col("bigram")), 1, 8), 16, 10).cast("long"),
        lit(buckets.toLong)))
      .withColumn("wt", col("j") % 7 - 3)
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_bigrams"), sum(col("wt")).as("logit"))
      .withColumn("pred",
        when(col("logit") > 0, 1L).otherwise(0L))
  }

  /** TRAINED-weights variant of [[hashedLinearScores]] (t32): the
    * stand-in `(slot % 7) − 3` expression is replaced by a broadcast
    * weight RELATION `weights(j, wt)` — the shape a real trained
    * model (fastText / logistic regression over hashed bigrams) drops
    * into without any plan change beyond swapping an arithmetic
    * column for a broadcast hash join on the slot key. Slots absent
    * from the relation weigh 0 (a sparse model stays sparse), and
    * duplicate slot rows (e.g. concatenated sparse model shards) are
    * SUMMED per slot before the join — the additive-model semantics —
    * so the join can never fan a bigram into multiple rows and
    * corrupt `n_bigrams`. The weight table is buckets-sized, so the
    * pre-aggregate and the broadcast are always tiny regardless of
    * corpus size.
    *
    * Scale shape: identical to the stand-in — per-row bigram
    * transform, one explode, a broadcast join on j, one map-side-
    * combined per-doc sum. Corpus-linear, a single doc-keyed shuffle,
    * all-integer. */
  def hashedLinearScoresWeighted(docs: DataFrame, idCol: String,
      textCol: String, weights: DataFrame, buckets: Int = 64): DataFrame = {
    val bg = docs
      .select(col(idCol).as("doc_id"),
        expr(s"filter(split(${textCol}, ' '), x -> x != '')").as("w"))
      .filter(size(col("w")) >= 2)
      .select(col("doc_id"), explode(expr(
        "transform(sequence(0, size(w) - 2), i -> concat(w[i], ' ', w[i + 1]))"))
        .as("bigram"))
    bg
      .withColumn("j", pmod(
        conv(substring(md5(col("bigram")), 1, 8), 16, 10).cast("long"),
        lit(buckets.toLong)))
      // slot-sum first: a duplicate-keyed weight relation must add,
      // not fan out the probe side (count(1) below counts join rows)
      .join(broadcast(weights.select(col("j"), col("wt"))
        .groupBy(col("j")).agg(sum(col("wt")).as("wt"))), Seq("j"), "left")
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_bigrams"),
        sum(coalesce(col("wt"), lit(0L))).as("logit"))
      .withColumn("pred",
        when(col("logit") > 0, 1L).otherwise(0L))
  }

  /** BM25 relevance scores for a fixed query-term set (t33) — the
    * Robertson/Lucene Okapi ranking function, the retrieval scorer a
    * curation pipeline uses to pull topical documents out of a corpus
    * (the step between t9's per-doc TF-IDF profile and an actual
    * query-driven selection):
    *
    *   score(d) = Σ_t idf(t) · tf/(tf + k1·(1 − b + b·dl/avgdl))
    *   idf(t)   = ln(1 + (N − df + 0.5)/(df + 0.5))
    *
    * Float discipline (the t9 memory-rule): idf and each per-term
    * contribution are ROUNDED to 6 decimals — identical double
    * formulas, identical association, on both engines — then summed
    * on DECIMAL(18,6) so partition order can't move a ulp, and the
    * final score rounds to 4. Ranking is (rounded score desc, doc_id):
    * a total order, so the top-k cut is deterministic.
    *
    * Scale shape: ONE corpus tokenization pass projects each doc to
    * (id, dl, matched-terms) — the length is a scalar and the match
    * filter runs INSIDE the array, so the non-matching majority never
    * explodes into the row stream (its `hits` is empty and the
    * generate emits nothing); that tiny projection is materialized
    * once (two consumers: the (N, Σdl) stats and the tf branch — the
    * exactSpans convention) instead of re-scanning the corpus per
    * consumer. Only query-term hits shuffle into the (doc, term)
    * count; df and the stats are broadcast terms-sized/1-row
    * relations; the cut is TakeOrderedAndProject. Corpus-linear, one
    * small shuffle, no pair space. */
  def bm25(docs: DataFrame, idCol: String, textCol: String,
      terms: Seq[String], k1: Double = 1.2, b: Double = 0.75,
      topK: Int = 20): DataFrame = {
    require(terms.nonEmpty, "bm25: query-term set must be non-empty")
    val base = docs.select(col(idCol).as("doc_id"),
        filter(split(coalesce(col(textCol), lit("")), " "),
          x => x =!= "").as("w"))
      .select(col("doc_id"), size(col("w")).cast("long").as("dl"),
        filter(col("w"), x => x.isin(terms: _*)).as("hits"))
      // two consumers (stats + tf): one tokenization, one tiny
      // (id, dl, hits) materialization
      .localCheckpoint()
    val stats = base.agg(count(lit(1)).as("n_docs"), sum(col("dl")).as("sum_dl"))
    val tf = base
      .select(col("doc_id"), col("dl"), explode(col("hits")).as("term"))
      .groupBy(col("doc_id"), col("dl"), col("term"))
      .agg(count(lit(1)).as("tf"))
    val df = tf.groupBy(col("term")).agg(count(lit(1)).as("df"))
    tf.join(broadcast(df), "term")
      .crossJoin(broadcast(stats))
      .withColumn("idf", round(log(lit(1.0) +
        (col("n_docs") - col("df") + lit(0.5)) / (col("df") + lit(0.5))), 6))
      .withColumn("avgdl", col("sum_dl").cast("double") / col("n_docs"))
      .withColumn("contrib", round(
        col("idf") * col("tf") /
          (col("tf") + lit(k1) * (lit(1 - b) + lit(b) * col("dl") / col("avgdl"))),
        6).cast("decimal(18,6)"))
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_terms"), sum(col("contrib")).as("s"))
      .select(col("doc_id"), col("n_terms"),
        round(col("s"), 4).cast("double").as("bm25"))
      .orderBy(col("bm25").desc, col("doc_id"))
      .limit(topK)
  }

  // ---- distributed BPE tokenizer training --------------------------

  /** Learn the first `rounds` BPE merges over the corpus (Sennrich et
    * al., ACL 2016 — the tokenizer-training pass every LLM pipeline
    * runs before anything else). Scale shape: ONE corpus pass builds
    * the weighted word-frequency relation (map-side-combined groupBy —
    * the only corpus-sized step, checkpointed once); every merge round
    * then runs entirely on that VOCAB-sized relation: adjacent-pair
    * weighted counts (explode + groupBy), a 1-row argmax winner
    * (ties broken (weight desc, pair asc) — total order, engine-free),
    * broadcast back, and the merge applied per word with an
    * `aggregate` HOF fold. The fold is the exact greedy left-to-right
    * non-overlapping BPE rule: merge when the accumulator's last
    * symbol is p1 and the current is p2; a just-merged p1p2 can never
    * re-match as p1 within the round (p2 is non-empty), so overlapping
    * runs take the first pair of each adjacent run — identical to the
    * oracle's window-island formulation, proven in the spec.
    *
    * Output: (round, p1, p2, weight) — the learned merge table. */
  def bpeMerges(docs: DataFrame, textCol: String, rounds: Int = 3): DataFrame =
    bpeTrain(docs, textCol, rounds)._1

  /** Checkpoint the evolving vocab every this many merge rounds: each
    * round stacks one literal-folded merge projection on the vocab
    * lineage (the winner is injected as constants — no crossJoin since
    * the r9 rework), so at tokenizer scale (32k merges) an unchecked
    * plan would still grow O(rounds) deep in projection layers.
    * Periodic eager localCheckpoints bound the live plan depth to
    * O(BpeCheckpointEvery) while costing one vocab-sized
    * materialization per N rounds — this is what keeps the measured
    * per-round cost flat (SCALING.md r9: 0.065 s/round to 200). */
  private val BpeCheckpointEvery = 8

  /** Learned merges AND the post-merge vocabulary (word, syms, n) —
    * the tokenizer-application side of [[bpeMerges]] (t25).
    *
    * The 1-row argmax winner is COLLECTED to the driver each round —
    * deliberately: the merge table is the training artifact itself
    * (O(rounds) rows, what a tokenizer ships), so the winner is
    * driver-data by definition, and collecting it lets the next
    * round's merge fold take p1/p2 as constant-folded LITERALS (no
    * per-round crossJoin in the vocab lineage) and the merges output
    * be a single local relation instead of an O(rounds)-deep union
    * tree. The vocab relation itself stays fully distributed — at
    * 32k-merge tokenizer scale the driver holds 32k tiny rows while
    * the cluster holds the corpus and vocabulary. */
  def bpeTrain(docs: DataFrame, textCol: String,
      rounds: Int): (DataFrame, DataFrame) = {
    import docs.sparkSession.implicits._
    var vocab = docs
      .select(explode(split(col(textCol), " ")).as("word"))
      .filter(col("word") =!= "")
      .groupBy("word").agg(count(lit(1)).as("n"))
      .select(col("word"), split(col("word"), "").as("syms"), col("n"))
      // one corpus pass; rounds replay only this vocab-sized relation
      .localCheckpoint()
    val winners = scala.collection.mutable.ArrayBuffer.empty[(Long, String, String, Long)]
    var r = 1
    var exhausted = false
    while (r <= rounds && !exhausted) {
      val top = vocab
        .filter(size(col("syms")) >= 2)
        .select(col("n"), explode(expr(
          "transform(sequence(0, size(syms) - 2), " +
            "i -> struct(syms[i] AS p1, syms[i + 1] AS p2))")).as("p"))
        .groupBy(col("p.p1").as("p1"), col("p.p2").as("p2"))
        .agg(sum(col("n")).as("weight"))
        .orderBy(col("weight").desc, col("p1").asc, col("p2").asc)
        .limit(1)
        .collect()
      if (top.isEmpty) {
        // no adjacent pair left to merge (all-single-symbol corpus, or
        // rounds > learnable merges). Applying an absent winner would
        // be meaningless — keep the vocab under the merges actually
        // learned and stop training instead (measured: a 200-round
        // request on an 89-merge corpus stops at 89, SCALING.md).
        exhausted = true
      } else {
        val (p1v, p2v) = (top(0).getString(0), top(0).getString(1))
        vocab = vocab
          .withColumn("p1", lit(p1v)).withColumn("p2", lit(p2v))
          .select(col("word"), expr(
            "aggregate(syms, CAST(array() AS ARRAY<STRING>), (acc, x) -> " +
              "CASE WHEN size(acc) > 0 AND element_at(acc, -1) = p1 AND x = p2 " +
              "THEN concat(slice(acc, 1, size(acc) - 1), array(concat(p1, p2))) " +
              "ELSE concat(acc, array(x)) END)").as("syms"),
            col("n"))
        if (r % BpeCheckpointEvery == 0) vocab = vocab.localCheckpoint()
        winners += ((r.toLong, p1v, p2v, top(0).getLong(2)))
        r += 1
      }
    }
    // LocalRelation with the proper schema even when empty
    val merges = winners.toSeq.toDF("round", "p1", "p2", "weight")
    (merges, vocab)
  }

  /** Tokenize the corpus with the learned merges: per document, the
    * word/char/token counts after `rounds` BPE merges. The corpus side
    * is ONE explode + a join keyed on word against the VOCAB-sized
    * symbol table (AQE broadcasts it while it fits; at web-corpus
    * vocab sizes it becomes a word-keyed hash join) + a doc-keyed
    * aggregate — tokenization never re-runs the merge fold per word
    * INSTANCE, only once per distinct word. */
  def bpeTokenCounts(docs: DataFrame, idCol: String, textCol: String,
      rounds: Int = 3): DataFrame = {
    val vocab = bpeTrain(docs, textCol, rounds)._2
      .select(col("word"), size(col("syms")).cast("long").as("n_syms"))
    docs
      .select(col(idCol).as("doc_id"), explode(split(col(textCol), " ")).as("word"))
      .filter(col("word") =!= "")
      .join(vocab, "word")
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_words"),
        sum(length(col("word"))).cast("long").as("n_chars"),
        sum(col("n_syms")).as("n_tokens"))
  }
}
