package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Exact set-similarity self-join with prefix filtering — the
  * AllPairs/PPJoin candidate-generation family (Bayardo et al.,
  * "Scaling Up All Pairs Similarity Search", WWW 2007; Xiao et al.,
  * "Efficient Similarity Joins for Near Duplicate Detection",
  * WWW 2008), the third pillar of near-dup detection next to MinHash
  * (probabilistic, [[Dedup.minhashNearDups]]) and SimHash (bitwise,
  * [[Dedup.simhash]]): EXACT Jaccard output with subquadratic
  * candidate generation.
  *
  * Why it scales: order every document's token set by ascending
  * document frequency (rarest first). For Jaccard ≥ τ, two sets MUST
  * share a token within their first `|t| - ceil(τ·|t|) + 1` tokens of
  * that order (prefix-filter lemma), so the candidate join runs over
  * the PREFIX relation only — and prefixes are made of the rarest
  * tokens, so bucket sizes stay small exactly where a naive
  * token-inverted-index join explodes (stopwords land at the END of
  * the order and never enter a prefix unless the doc is nearly all
  * stopwords). No O(n²) pair space, no data-sized unpartitioned
  * window: the per-doc prefix rank partitions by doc_id, and the
  * frequency order is carried as the (df, tok) key itself rather than
  * a globally materialized rank.
  *
  * Everything until the final reported division is int64 arithmetic —
  * the threshold test is `τDen·|A∩B| ≥ τNum·|A∪B|` on exact counts —
  * so an ANSI-SQL oracle replays the join bit-for-bit.
  */
object SetSimJoin {

  /** Distinct word set per document: (doc_id, tok). NOTE: raw word
    * sets only separate corpora with a broad vocabulary — on a
    * small-vocabulary corpus the background word-set Jaccard is high
    * and k-word shingles ([[Dedup.shingles]]) are the right token;
    * [[jaccardJoin]] takes the token relation so callers choose. */
  def wordSets(docs: DataFrame, idCol: String, textCol: String): DataFrame =
    docs.select(col(idCol).as("doc_id"),
        explode(split(col(textCol), " ")).as("tok"))
      .filter(col("tok") =!= "")
      .distinct()

  /** All pairs (d1 < d2) with Jaccard(tokens(d1), tokens(d2)) ≥
    * τNum/τDen, exactly, over a DISTINCT token relation
    * `tok(doc_id, tok)`. Output: (d1, d2, inter, uni, jaccard) with
    * jaccard = round(inter/uni, 6), ordered by (d1, d2).
    *
    * Plan: tokens → df counts → per-doc prefix (row_number within
    * doc over (df, tok) ascending, kept while rank ≤
    * `len - ceil(τ·len) + 1`) → prefix self-join on tok with the
    * length filter `τDen·min(len) ≥ τNum·max(len)` → distinct pairs →
    * one intersection join over the FULL token sets of candidates →
    * exact integer threshold. */
  def jaccardJoin(tokens: DataFrame, tauNum: Int, tauDen: Int): DataFrame = {
    require(tauNum > 0 && tauDen > 0 && tauNum <= tauDen,
      s"tau must be a rational in (0, 1]: got $tauNum/$tauDen")
    // the token relation feeds FIVE consumers (df, len, prefix, both
    // intersection sides); materialize it once instead of re-running
    // the upstream explode+distinct per consumer (measured 6.0 s →
    // 2.9 s at sf0.1, SCALING.md). At cluster scale this is the step
    // a pipeline persists to storage; localCheckpoint is the
    // single-job equivalent, and the relation is corpus-linear (one
    // row per distinct (doc, token)), never pair-sized.
    val tok = tokens.localCheckpoint()
    val len = tok.groupBy("doc_id").agg(count(lit(1)).as("len"))
    val df = tok.groupBy("tok").agg(count(lit(1)).as("df"))

    // prefix length p = len - ceil(tau*len) + 1, in exact int64:
    // ceil(a/b) = (a + b - 1) div b for positive a, b. rn (the
    // token's rank in the doc's frequency order) rides along for the
    // positional filter below.
    val prefix = tok
      .join(df, "tok")
      .join(len, "doc_id")
      .withColumn("rn", row_number().over(
        Window.partitionBy(col("doc_id")).orderBy(col("df").asc, col("tok").asc)))
      .filter(col("rn") <= expr(s"len - (($tauNum * len + ${tauDen - 1}) DIV $tauDen) + 1"))
      .select(col("doc_id"), col("tok"), col("len"), col("rn"))

    // candidate pairs: shared prefix token + two lossless integer
    // prunes BEFORE the distinct —
    // (1) length bound: |A| ≥ τ·|B| for |A| ≤ |B|;
    // (2) PPJoin positional bound (Xiao et al. §3.2): common tokens
    //     all rank ≥ this one in the global order, so the overlap is
    //     at most 1 + min(l1−rn1, l2−rn2); J ≥ τ needs overlap ≥
    //     τ/(1+τ)·(l1+l2), i.e. (τN+τD)·ubound ≥ τN·(l1+l2). The
    //     bound is loosest at the pair's FIRST shared token, so
    //     any-token-passes keeps every true pair (spec-pinned against
    //     brute force). Measured at sf0.1/τ=2/3: 315k → 44k
    //     candidates into verification.
    val cands = prefix.select(col("doc_id").as("d1"), col("tok"),
        col("len").as("l1"), col("rn").as("rn1"))
      .join(prefix.select(col("doc_id").as("d2"), col("tok"),
        col("len").as("l2"), col("rn").as("rn2")), "tok")
      .filter(col("d1") < col("d2") &&
        lit(tauDen) * least(col("l1"), col("l2")) >= lit(tauNum) * greatest(col("l1"), col("l2")) &&
        lit(tauNum + tauDen) * (lit(1) + least(col("l1") - col("rn1"), col("l2") - col("rn2"))) >=
          lit(tauNum) * (col("l1") + col("l2")))
      .select("d1", "d2", "l1", "l2")
      .distinct()

    // verify candidates with one exact intersection count over the
    // full token sets (candidates only — never the corpus pair space)
    val inter = cands
      .join(tok.select(col("doc_id").as("d1"), col("tok")), Seq("d1"))
      .join(tok.select(col("doc_id").as("d2"), col("tok")), Seq("d2", "tok"))
      .groupBy("d1", "d2", "l1", "l2")
      .agg(count(lit(1)).as("inter"))

    inter
      .withColumn("uni", col("l1") + col("l2") - col("inter"))
      .filter(lit(tauDen) * col("inter") >= lit(tauNum) * col("uni"))
      .select(col("d1"), col("d2"), col("inter"), col("uni"),
        round(col("inter").cast("double") / col("uni"), 6).as("jaccard"))
      .orderBy("d1", "d2")
  }

  /** Directional containment self-join: all ordered pairs (a ≠ b) with
    * C(A→B) = |A∩B| / |A| ≥ τNum/τDen over a DISTINCT token relation —
    * the asymmetric measure Jaccard structurally cannot express: an
    * EXCERPT (a 20-word quote of a 500-word page, a function lifted
    * into a larger file) has containment ≈ 1 but Jaccard ≈ |A|/|B| ≈
    * 0.04, far below any usable symmetric threshold. This is the
    * quote/excerpt/sub-document detector of the near-dup family
    * (the set-containment join of the clone-detection literature —
    * SourcererCC's index direction, Sajnani et al. ICSE'16), next to
    * d13's symmetric Jaccard.
    *
    * Prefix filtering is one-sided, which is the published containment
    * asymmetry: the CONTAINED side a must share a token within its
    * first `la - ceil(τ·la) + 1` rarest-first tokens (the Jaccard
    * prefix lemma with the overlap bound ceil(τ·la)), but the
    * container side b admits no own-length bound (any token of b can
    * be the one a's prefix hits), so b is fully token-indexed and the
    * join's bucket pressure is carried entirely by the PREFIX side
    * being rare tokens: a stopword enters the join only when some
    * contained doc is nearly all stopwords. Lossless int64 prunes
    * before the distinct: length bound τ·la ≤ lb (the overlap can't
    * exceed |B|), and the positional bound 1 + (la − rnA) ≥ ceil(τ·la)
    * (tokens before a's prefix hit can't contribute).
    *
    * Output: (a, b, inter, la, lb, containment = round(inter/la, 6)),
    * ordered by (a, b). A mutual near-dup pair emits BOTH directions —
    * callers wanting undirected pairs filter a < b. */
  def containmentJoin(tokens: DataFrame, tauNum: Int, tauDen: Int): DataFrame = {
    require(tauNum > 0 && tauDen > 0 && tauNum <= tauDen,
      s"tau must be a rational in (0, 1]: got $tauNum/$tauDen")
    val tok = tokens.localCheckpoint()
    val len = tok.groupBy("doc_id").agg(count(lit(1)).as("len"))
    val df = tok.groupBy("tok").agg(count(lit(1)).as("df"))

    // contained-side prefix: rank tokens rarest-first within the doc,
    // keep rank ≤ la - ceil(τ·la) + 1 (exact int64 ceil)
    val prefix = tok
      .join(df, "tok")
      .join(len, "doc_id")
      .withColumn("rn", row_number().over(
        Window.partitionBy(col("doc_id")).orderBy(col("df").asc, col("tok").asc)))
      .filter(col("rn") <= expr(s"len - (($tauNum * len + ${tauDen - 1}) DIV $tauDen) + 1"))
      .select(col("doc_id").as("a"), col("tok"), col("len").as("la"), col("rn"))

    val indexed = tok.join(len, "doc_id")
      .select(col("doc_id").as("b"), col("tok"), col("len").as("lb"))
    val cands = prefix
      .join(indexed, "tok")
      .filter(col("a") =!= col("b") &&
        lit(tauNum) * col("la") <= lit(tauDen) * col("lb") &&
        lit(tauDen) * (lit(1) + col("la") - col("rn")) >= lit(tauNum) * col("la"))
      .select(col("a"), col("b"), col("la"), col("lb"))
      .distinct()

    val inter = cands
      .join(tok.select(col("doc_id").as("a"), col("tok")), Seq("a"))
      .join(tok.select(col("doc_id").as("b"), col("tok")), Seq("b", "tok"))
      .groupBy("a", "b", "la", "lb")
      .agg(count(lit(1)).as("inter"))

    inter
      .filter(lit(tauDen) * col("inter") >= lit(tauNum) * col("la"))
      .select(col("a"), col("b"), col("inter"), col("la"), col("lb"),
        round(col("inter").cast("double") / col("la"), 6).as("containment"))
      .orderBy("a", "b")
  }
}
