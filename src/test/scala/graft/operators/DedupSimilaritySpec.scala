package graft.operators

import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

class DedupSimilaritySpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  val docs = Seq(
    (1L, "the quick brown fox jumps over the lazy dog near the river bank today"),
    (2L, "the quick brown fox jumps over the lazy dog near the river bank tonight"), // near-dup of 1
    (3L, "completely different words about spark catalyst optimizer and shuffle plans"),
    (4L, "THE QUICK BROWN FOX jumps over the lazy dog near the river bank today!!"), // exact-dup of 1 after canon
    (5L, "another unrelated document discussing parquet column pruning and pushdown")
  ).toDF("doc_id", "text")

  test("exact dedup groups case/punctuation variants") {
    val groups = Dedup.exactDupGroups(docs, "doc_id", "text")
      .filter($"n_dups" > 1).collect()
    assert(groups.length === 1)
    assert(groups.head.getAs[Long]("canonical_id") === 1L)
    assert(groups.head.getAs[Long]("n_dups") === 2L)
  }

  test("minhash LSH finds the near-dup pair and nothing else") {
    val pairs = Dedup.minhashNearDups(docs.filter($"doc_id" =!= 4), "doc_id", "text")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs === Set((1L, 2L)))
  }

  test("hot-bucket cap is a no-op on sane data, drops pathological cliques") {
    val sane = docs.filter($"doc_id" =!= 4)
    val uncapped = Dedup.minhashNearDups(sane, "doc_id", "text")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val capped = Dedup.minhashNearDups(sane, "doc_id", "text",
        maxBucket = Some(10))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(capped === uncapped) // no bucket is hot here
    // a 30-clique of identical docs: every band bucket exceeds the cap
    val clique = (0 until 30).map(i =>
      (100L + i, "the same boilerplate page text repeated verbatim across hosts"))
      .toDF("doc_id", "text")
    val cliquePairs = Dedup.minhashNearDups(
      sane.unionByName(clique), "doc_id", "text", maxBucket = Some(10))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(cliquePairs === uncapped,
      "capped run should drop only the pathological clique's pairs")
  }

  test("incremental minhash equals the full run filtered to new docs") {
    import org.apache.spark.sql.functions.col
    val corpus = docs.filter($"doc_id" =!= 4)
    // doc 10 = exact copy of doc 1 (J=1.0: every band collides, so the
    // hit is guaranteed — this test pins the join shape, not LSH recall)
    val fresh = Seq(
      (10L, "the quick brown fox jumps over the lazy dog near the river bank today"),
      (11L, "some genuinely novel content that matches nothing in the corpus at all x")
    ).toDF("doc_id", "text")
    val inc = Dedup.minhashNearDupsIncremental(corpus, fresh, "doc_id", "text")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val full = Dedup.minhashNearDups(corpus.unionByName(fresh), "doc_id", "text")
      .filter(col("d1").isin(10L, 11L) || col("d2").isin(10L, 11L))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(inc === full)
    assert(inc.nonEmpty, "doc 10 should near-dup docs 1/2")
  }

  test("dup clusters: transitive chains collapse to the smallest id") {
    // chain 10-11-12-13-14 (diameter 4 → needs several propagation
    // rounds) plus a disjoint pair 20-21
    val pairs = Seq(
      (10L, 11L), (11L, 12L), (12L, 13L), (13L, 14L),
      (20L, 21L)
    ).toDF("d1", "d2")
    val got = Dedup.dupClusters(pairs).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got === Map(
      10L -> 10L, 11L -> 10L, 12L -> 10L, 13L -> 10L, 14L -> 10L,
      20L -> 20L, 21L -> 20L))
  }

  test("simhash: near-dups are close in hamming distance, unrelated far") {
    val sh = Dedup.simhash(docs, "doc_id", "text")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    def ham(a: Long, b: Long) = java.lang.Long.bitCount(a ^ b)
    assert(ham(sh(1L), sh(2L)) < 12)
    assert(ham(sh(1L), sh(3L)) > 15)
    assert(sh(1L) === sh(4L).ensuring(_ => true) || ham(sh(1L), sh(4L)) < 12)
  }

  test("simhash near-dup retrieval equals brute-force hamming <= 3") {
    val docs4 = docs // includes the exact-dup pair (1, 4) up to case
    val res = Dedup.simhashNearDups(docs4, "doc_id", "text").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val sigs = Dedup.simhash(docs4, "doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val brute = (for {
      a <- sigs.keys; b <- sigs.keys
      if a < b && java.lang.Long.bitCount(sigs(a) ^ sigs(b)) <= 3
    } yield (a, b)).toSet
    assert(res === brute) // banded candidates are lossless for <= 3
  }

  test("ngram jaccard with blocking only pairs within a block") {
    val blocked = docs.withColumn("src",
      org.apache.spark.sql.functions.when($"doc_id" <= 2, "A").otherwise("B"))
    val pairs = Dedup.ngramJaccard(blocked, "doc_id", "text", "src", n = 4, threshold = 0.5)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs === Set((1L, 2L))) // 1-4 would match but sit in different blocks
  }

  test("ivf ANN recall vs brute force on real embeddings") {
    val emb = graft.Tables.load(spark, "/root/testdata/sf0.001", "embeddings")
    val queries = emb.filter($"vec_id" < 10)
    val exact = Similarity.cosineTopK(emb, queries, 10)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    // exact search: self excluded, k results per query
    assert(exact.size === 100)
    val nCells = emb.select("label").distinct().count().toInt
    // probing every cell must reduce to brute force exactly
    val full = Similarity.ivfTopK(emb, queries, "label", 10, nProbe = nCells)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(full === exact)
    // partial probe trades recall for cost but must stay useful
    val approx = Similarity.ivfTopK(emb, queries, "label", 10, nProbe = 2)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val recall = exact.intersect(approx).size.toDouble / exact.size
    assert(recall >= 2.0 / nCells * 0.7,
      s"IVF recall $recall below the $nCells-cell floor")
  }

  test("sorted-neighborhood catches tail-edit near-dups, skips unrelated texts") {
    val withTail = docs.filter($"doc_id" =!= 4).unionByName(
      Seq((10L, "the quick brown fox jumps over the lazy dog near the river bank today EXTRA"))
        .toDF("doc_id", "text"))
    val pairs = Dedup.sortedNeighborhoodCandidates(withTail, "doc_id", "text")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    // 1 and 10 share the whole head (tail-only edit) and sort adjacent;
    // 1–2 differ within the 30-char head by <=5 edits too (today/tonight
    // is past char 30, so head distance is 0)
    assert(pairs.contains((1L, 10L)))
    // unrelated docs (3, 5) never pair with the fox docs
    assert(!pairs.exists { case (a, b) => (a == 3 || b == 3) && (a != b) && Set(1L, 2L, 10L).contains(if (a == 3) b else a) })
  }

  test("survivorship keeps highest quality, ties break to smallest id") {
    import org.apache.spark.sql.functions.{col, length}
    val d = Seq(
      (1L, "aaaa"), (2L, "aaaaaa"), (3L, "aaaaaa"), // cluster 1: 2 and 3 tie on quality
      (4L, "bbbb"), (5L, "bb"),                     // cluster 4: 4 wins on quality
      (6L, "untouched")
    ).toDF("doc_id", "text")
    val clusters = Seq((1L, 1L), (2L, 1L), (3L, 1L), (4L, 4L), (5L, 4L))
      .toDF("doc_id", "cluster_id")
    val surv = Dedup.survivorship(d, clusters, "doc_id", length(col("text")).cast("long"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSet
    assert(surv === Set((1L, 2L, 3L, 6L), (4L, 4L, 2L, 4L)))
    val kept = Dedup.applySurvivorship(d, clusters, "doc_id",
        length(col("text")).cast("long"))
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(kept === Set(2L, 4L, 6L), "survivors + unclustered docs remain")
  }

  // ---- reciprocal-rank fusion ----------------------------------------

  test("n19 kNN classification equals a driver-side majority replay on real embeddings") {
    val emb = graft.Tables.load(spark, "/root/testdata/sf0.001", "embeddings")
    val queries = emb.filter($"vec_id" < 20)
    val got = graft.queries.TextPipeline.n19KnnClassify(spark, "/root/testdata/sf0.001")
      .collect().map(r => (r.getLong(0), (r.getInt(1), r.getLong(2)))).toMap
    assert(got.size === 20 && got.values.forall { case (_, v) => v >= 1 && v <= 10 })
    // replay: collect the top-k relation + label map, vote in Scala
    val labels = emb.select($"vec_id", $"label").collect()
      .map(r => r.getLong(0) -> r.getInt(1)).toMap
    val topk = Similarity.cosineTopK(emb, queries, k = 10)
      .select($"qid", $"vec_id").collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    val replay = topk.groupBy(_._1).map { case (qid, rows) =>
      val votes = rows.map(r => labels(r._2)).groupBy(identity)
        .map { case (l, xs) => (l, xs.length.toLong) }
      qid -> votes.toSeq.minBy { case (l, v) => (-v, l) }
    }
    assert(got === replay)
  }

  test("n20 hard negatives: label-mismatched only, ranked hardest-first, from the top-k pool") {
    val emb = graft.Tables.load(spark, "/root/testdata/sf0.001", "embeddings")
    val queries = emb.filter($"vec_id" < 20)
    val got = Similarity.hardNegatives(emb, queries, k = 20, m = 5)
      .collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getInt(3), r.getInt(5)))
    // no negative shares its query's label; ranks are 1..m contiguous per query
    assert(got.forall { case (_, ql, _, nl, _) => ql != nl })
    got.groupBy(_._1).foreach { case (qid, rows) =>
      assert(rows.map(_._5).sorted.toSeq === (1 to rows.length).toSeq, s"qid $qid")
      assert(rows.length <= 5)
    }
    // every emitted negative must come from that query's cosine top-20
    val pool = Similarity.cosineTopK(emb, queries, k = 20)
      .select($"qid", $"vec_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got.forall { case (qid, _, nid, _, _) => pool.contains((qid, nid)) })
    // and be the HIGHEST-cos label-mismatched members of that pool
    val labels = emb.select($"vec_id", $"label").collect()
      .map(r => r.getLong(0) -> r.getInt(1)).toMap
    val cosByPair = Similarity.cosineTopK(emb, queries, k = 20)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    val qLabels = queries.select($"vec_id", $"label").collect()
      .map(r => r.getLong(0) -> r.getInt(1)).toMap
    val replay = pool.groupBy(_._1).flatMap { case (qid, pairs) =>
      pairs.toSeq.map(_._2).filter(v => labels(v) != qLabels(qid))
        .sortBy(v => (-cosByPair((qid, v)), v)).take(5).zipWithIndex
        .map { case (v, i) => (qid, qLabels(qid), v, labels(v), i + 1) }
    }.toSet
    assert(got.toSet === replay)
  }

  test("rrfFuse: hand-computed fusion — shared doc sums both contributions") {
    val lex = Seq((10L, 0.9), (20L, 0.8)).toDF("doc_id", "score")
    val den = Seq((20L, 0.5), (30L, 0.4)).toDF("doc_id", "score")
    val out = Similarity.rrfFuse(Seq("lex" -> lex, "dense" -> den),
        "doc_id", "score")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    // ranks: lex 10→1, 20→2; dense 20→1, 30→2
    // round(1/61,6)=0.016393, round(1/62,6)=0.016129
    assert(out.toSeq === Seq(
      (20L, 2L, 0.032522), // 0.016129 + 0.016393
      (10L, 1L, 0.016393),
      (30L, 1L, 0.016129)))
  }

  test("rrfFuse: ranks break score ties by id and topK cuts on (rrf, id)") {
    val a = Seq((3L, 0.5), (1L, 0.5), (2L, 0.5)).toDF("doc_id", "score")
    val out = Similarity.rrfFuse(Seq("a" -> a), "doc_id", "score", topK = 2)
      .collect().map(r => (r.getLong(0), r.getDouble(2)))
    // tied scores rank by id asc: 1→1, 2→2, 3→3; topK=2 keeps 1, 2
    assert(out.toSeq === Seq((1L, 0.016393), (2L, 0.016129)))
  }

  test("rrfFuse: the id column keeps its own type (string-keyed lists fuse)") {
    val a = Seq(("u1", 0.9), ("u2", 0.8)).toDF("doc_id", "score")
    val b = Seq(("u2", 0.7)).toDF("doc_id", "score")
    val out = Similarity.rrfFuse(Seq("a" -> a, "b" -> b), "doc_id", "score")
    assert(out.schema("doc_id").dataType ===
      org.apache.spark.sql.types.StringType)
    val rows = out.collect().map(r => (r.getString(0), r.getLong(1)))
    assert(rows.toSeq === Seq(("u2", 2L), ("u1", 1L)))
  }
}
