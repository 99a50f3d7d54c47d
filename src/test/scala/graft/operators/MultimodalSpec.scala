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

  test("real header decode round-trips PNG/BMP/GIF dimensions from bytes") {
    val body = "pixel data stand-in".getBytes("UTF-8")
    val rows = Seq(
      Multimodal.MediaRow(1L, "image/png", Multimodal.pngBytes(640, 480, body)),
      Multimodal.MediaRow(2L, "image/bmp", Multimodal.bmpBytes(1920, 1080, body)),
      // dimensions above 255 exercise multi-byte endianness both ways
      Multimodal.MediaRow(3L, "image/png", Multimodal.pngBytes(70000, 3, body)),
      Multimodal.MediaRow(4L, "application/octet-stream", body),
      Multimodal.MediaRow(5L, "image/gif", Multimodal.gifBytes(800, 600, body)),
      // 300 > 255: the u16 high byte must be read
      Multimodal.MediaRow(6L, "image/gif", Multimodal.gifBytes(300, 65535, body)))
    val out = Multimodal.decodeHeaders(spark.createDataset(rows))
      .collect().map(f => f.media_id -> f).toMap
    assert(out(1L).width === 640 && out(1L).height === 480)
    assert(out(2L).width === 1920 && out(2L).height === 1080)
    assert(out(3L).width === 70000 && out(3L).height === 3)
    // non-image bytes degrade to (0,0), never throw
    assert(out(4L).width === 0 && out(4L).height === 0)
    assert(out(5L).width === 800 && out(5L).height === 600)
    assert(out(6L).width === 300 && out(6L).height === 65535)
    assert(out(1L).n_bytes === 33 + body.length)
    assert(out(2L).n_bytes === 54 + body.length)
    assert(out(5L).n_bytes === 13 + body.length)
  }

  test("real JPEG decode walks the marker stream to SOF0/SOF2 dimensions") {
    val body = "entropy data stand-in ÿØ with marker-ish bytes".getBytes("UTF-8")
    val rows = Seq(
      Multimodal.MediaRow(1L, "image/jpeg", Multimodal.jpegBytes(800, 600, body)),
      Multimodal.MediaRow(2L, "image/jpeg",
        Multimodal.jpegBytes(4000, 3000, body, progressive = true)),
      // truncated mid-APP0: must degrade to (0, 0), not throw
      Multimodal.MediaRow(3L, "image/jpeg",
        Multimodal.jpegBytes(100, 100, Array.empty[Byte]).take(10)),
      // SOI then immediate start-of-scan: no SOF → (0, 0)
      Multimodal.MediaRow(4L, "image/jpeg",
        Array(0xff, 0xd8, 0xff, 0xda, 0x00, 0x02).map(_.toByte)),
      // SOF with declared length 2 (too short to hold dims) followed
      // by plausible next-segment bytes: must degrade, not read the
      // next segment's bytes as width/height
      Multimodal.MediaRow(5L, "image/jpeg",
        Array(0xff, 0xd8, 0xff, 0xc0, 0x00, 0x02,
          0x08, 0x01, 0x2c, 0x00, 0xc8, 0x03, 0x11).map(_.toByte)))
    val out = Multimodal.decodeHeaders(rows.toDS()).collect()
      .map(f => f.media_id -> ((f.width, f.height))).toMap
    assert(out(1L) === ((800, 600)))
    assert(out(2L) === ((4000, 3000)))   // progressive SOF2
    assert(out(3L) === ((0, 0)))
    assert(out(4L) === ((0, 0)))
    assert(out(5L) === ((0, 0)))         // short-SOF guard
  }

  test("real WAV decode round-trips channels/rate/bits and derives sample count") {
    val body = new Array[Byte](1001) // odd length: integer division drops the tail
    val rows = Seq(
      Multimodal.MediaRow(1L, "audio/wav", Multimodal.wavBytes(2, 44100, 16, body)),
      // rate above 65535 exercises the full le32 read
      Multimodal.MediaRow(2L, "audio/wav", Multimodal.wavBytes(1, 96000, 8, body)),
      Multimodal.MediaRow(3L, "application/octet-stream", body),
      Multimodal.MediaRow(4L, "audio/wav", "RIFF".getBytes("US-ASCII"))) // truncated
    val out = Multimodal.decodeWavs(spark.createDataset(rows))
      .collect().map(a => a.media_id -> a).toMap
    assert(out(1L).channels === 2 && out(1L).sample_rate === 44100 && out(1L).bits === 16)
    assert(out(1L).n_samples === 1001 / 4)
    assert(out(2L).channels === 1 && out(2L).sample_rate === 96000 && out(2L).bits === 8)
    assert(out(2L).n_samples === 1001)
    // non-WAV and truncated payloads degrade to zeros, never throw
    assert(out(3L).channels === 0 && out(3L).n_samples === 0)
    assert(out(4L).channels === 0 && out(4L).sample_rate === 0)
    assert(out(1L).n_bytes === 44 + body.length)
  }

  test("interleave alternates text chunks and anchored image frames in order") {
    import spark.implicits._
    // 7 words of 1 char + spaces = 13 chars; chunkWords=3 → 3 chunks;
    // frameChars=4, everyN=2 → raw frames ceil(13/4)=4, kept ceil(4/2)=2
    val docs = Seq((1L, "a b c d e f g")).toDF("doc_id", "text")
    val out = Multimodal.interleave(docs, "doc_id", "text",
        chunkWords = 3, frameChars = 4, everyN = 2)
      .orderBy("seq_no")
      .collect()
      .map(r => (r.getLong(1), r.getString(2), r.getString(3), r.getLong(4)))
    // sequence: chunk0, img0, chunk1, img1, chunk2
    assert(out.map(x => (x._1, x._2)).toSeq === Seq(
      (0L, "text"), (1L, "image"), (2L, "text"), (3L, "image"), (4L, "text")))
    assert(out(0)._3 === "a b c" && out(0)._4 === 5L)
    assert(out(2)._3 === "d e f")
    assert(out(4)._3 === "g" && out(4)._4 === 1L)
    // image 0 digests the frame at chars [1,4] = "a b "; image 1 at [9,12]
    def md5hex(s: String) = java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
    assert(out(1)._3 === md5hex("a b ") && out(1)._4 === 4L)
    assert(out(3)._3 === md5hex("e f ") && out(3)._4 === 4L)
  }

  test("interleave drops frames with no anchor chunk and empty docs entirely") {
    import spark.implicits._
    // one chunk but long chars → frames capped at n_chunks = 1
    val docs = Seq((1L, "aaaaaaaaaaaaaaaaaaaa"), (2L, "")).toDF("doc_id", "text")
    val out = Multimodal.interleave(docs, "doc_id", "text",
        chunkWords = 3, frameChars = 2, everyN = 1)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2)))
    // doc 1: 1 word → 1 chunk; 10 raw frames capped to 1 kept image
    assert(out.count(_._1 == 1L) === 2)
    assert(out.filter(_._1 == 1L).map(x => (x._2, x._3)).toSet ===
      Set((0L, "text"), (1L, "image")))
    // doc 2: split("") = [""] → 1 chunk of empty text, 0 frames
    assert(out.filter(_._1 == 2L).map(x => (x._2, x._3)).toSet ===
      Set((0L, "text")))
  }
}
