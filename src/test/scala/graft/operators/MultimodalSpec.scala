package graft.operators

import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

class MultimodalSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  lazy val media = Multimodal.mediaFromText(
    graft.Tables.load(spark, "/root/testdata/sf0.001", "documents"),
    "doc_id", "text").as[Multimodal.MediaRow]

  test("binary payload plumbing preserves bytes and ids") {
    val feats = Multimodal.decodeFeatures(media).collect()
    assert(feats.length === media.count())
    val byId = feats.map(f => f.media_id -> f).toMap
    val doc0 = graft.Tables.load(spark, "/root/testdata/sf0.001", "documents")
      .filter($"doc_id" === 0).select("text").collect().head.getString(0)
    assert(byId(0L).n_bytes === doc0.getBytes("UTF-8").length)
    assert(byId(0L).features.length === 16)
    // deterministic: same input → same features
    val again = Multimodal.decodeFeatures(media).collect()
      .map(f => f.media_id -> f.features.toSeq).toMap
    assert(again(0L) === byId(0L).features.toSeq)
  }

  test("frame sampling emits every Nth fixed-width chunk") {
    val frames = Multimodal.sampleFrames(media, frameBytes = 32, everyN = 2)
    val f0 = frames.filter($"media_id" === 0).collect()
    assert(f0.forall(_.getInt(1) % 2 === 0))
    assert(f0.init.forall(_.getInt(2) === 32))
  }
}
