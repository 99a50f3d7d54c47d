package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal-column plumbing: image/audio/video as opaque `binary`
  * payloads with typed metadata, decoded/featurized per partition.
  *
  * The Spark-side contract is the real thing — schema, partitioning,
  * batch shape, and the per-partition decoder seam — while the decoder
  * itself is a clearly-marked deterministic STUB (`fakeDecode`): the
  * actual image/audio codecs aren't in this environment. Swapping
  * `fakeDecode` for a JNI/library call changes nothing else.
  *
  * Scale notes: `mapPartitions` keeps decoder init (model load, codec
  * contexts) once per partition, not per row; payloads stay columnar
  * parquet binary until the decode stage; feature vectors come back as
  * fixed-width arrays ready for the Similarity operators.
  */
object Multimodal {

  case class MediaRow(media_id: Long, kind: String, payload: Array[Byte])
  case class MediaFeatures(media_id: Long, kind: String, n_bytes: Int,
      width: Int, height: Int, features: Array[Float])

  /** STUB decoder — deterministic fake in place of a real codec.
    * Reads "header" fields from the first bytes and hashes fixed-size
    * byte windows into a feature vector. Replace with the real decode
    * (??? in production terms) keeping the exact signature. */
  def fakeDecode(r: MediaRow): MediaFeatures = {
    val b = r.payload
    val w = if (b.length >= 2) ((b(0) & 0xff) << 8 | (b(1) & 0xff)) % 4096 else 0
    val h = if (b.length >= 4) ((b(2) & 0xff) << 8 | (b(3) & 0xff)) % 4096 else 0
    val dim = 16
    val feats = new Array[Float](dim)
    var i = 0
    while (i < b.length) {
      feats(i % dim) += (b(i) & 0xff) / 255.0f
      i += 1
    }
    MediaFeatures(r.media_id, r.kind, b.length, w, h, feats)
  }

  /** The decode/featurize stage: one decoder instance per partition. */
  def decodeFeatures(media: Dataset[MediaRow]): Dataset[MediaFeatures] = {
    import media.sparkSession.implicits._
    media.mapPartitions { it =>
      // per-partition init seam: real codecs / models load HERE, once
      it.map(fakeDecode)
    }
  }

  // ---- real (non-stub) header decode -------------------------------

  private val PngSig = Array(0x89, 0x50, 0x4e, 0x47, 0x0d, 0x0a, 0x1a, 0x0a).map(_.toByte)

  private def be32(b: Array[Byte], off: Int): Int =
    ((b(off) & 0xff) << 24) | ((b(off + 1) & 0xff) << 16) |
      ((b(off + 2) & 0xff) << 8) | (b(off + 3) & 0xff)

  private def le32(b: Array[Byte], off: Int): Int =
    (b(off) & 0xff) | ((b(off + 1) & 0xff) << 8) |
      ((b(off + 2) & 0xff) << 16) | ((b(off + 3) & 0xff) << 24)

  private def le16(b: Array[Byte], off: Int): Int =
    (b(off) & 0xff) | ((b(off + 1) & 0xff) << 8)

  private def be16(b: Array[Byte], off: Int): Int =
    ((b(off) & 0xff) << 8) | (b(off + 1) & 0xff)

  /** SOF markers that carry frame dimensions: C0–C3, C5–C7, C9–CB,
    * CD–CF (C4 = DHT, C8 = JPG extension, CC = DAC are NOT frames). */
  private def isSof(m: Int): Boolean =
    m >= 0xc0 && m <= 0xcf && m != 0xc4 && m != 0xc8 && m != 0xcc

  /** (width, height) from a JPEG's first SOF segment — the standard
    * marker walk every fast-path prober does: skip SOI, step over
    * each FF-marker segment by its big-endian length, stop at any
    * SOFn (baseline C0, extended C1, progressive C2, …) and read
    * precision(1) height(2) width(2) from its payload. Returns (0, 0)
    * on any malformed/truncated structure — same degrade contract as
    * the other formats. */
  private def jpegDims(b: Array[Byte]): (Int, Int) = {
    var i = 2
    while (i + 3 < b.length) {
      if ((b(i) & 0xff) != 0xff) return (0, 0)
      var j = i
      // fill bytes: any number of FFs may pad before the marker id
      while (j + 1 < b.length && (b(j + 1) & 0xff) == 0xff) j += 1
      if (j + 1 >= b.length) return (0, 0)
      val m = b(j + 1) & 0xff
      if (m == 0xd8 || m == 0x01 || (m >= 0xd0 && m <= 0xd7)) {
        i = j + 2 // standalone markers carry no length field
      } else if (m == 0xd9 || m == 0xda) {
        return (0, 0) // EOI / start-of-scan before any SOF: no dims
      } else {
        if (j + 3 >= b.length) return (0, 0)
        val len = be16(b, j + 2)
        if (len < 2) return (0, 0)
        if (isSof(m)) {
          // the length field counts itself (2) + precision(1) +
          // height(2) + width(2): a declared len < 7 can't contain the
          // dims — reading on would return the NEXT segment's bytes
          if (len < 7 || j + 8 >= b.length) return (0, 0)
          return (be16(b, j + 7), be16(b, j + 5)) // (width, height)
        }
        i = j + 2 + len
      }
    }
    (0, 0)
  }

  /** REAL decoder for the four header formats a pure JVM can parse
    * with no codec library: PNG (8-byte signature, IHDR width/height
    * big-endian at offsets 16/20), BMP (`BM` magic, BITMAPINFOHEADER
    * width/height little-endian at offsets 18/22), GIF
    * (`GIF87a`/`GIF89a` signature, logical-screen width/height as
    * little-endian u16 at offsets 6/8), and JPEG (FFD8 SOI, then the
    * SOFn marker walk — [[jpegDims]] — the single most common image
    * format in web corpora). Format is detected from the BYTES, not
    * the declared kind; anything else degrades to (0, 0) dims rather
    * than failing the batch. Feature extraction is the same
    * byte-window accumulation as the stub — the difference is that
    * width/height now come from parsing real file structure. */
  def decodeHeader(r: MediaRow): MediaFeatures = {
    val b = r.payload
    val (w, h) =
      if (b.length >= 24 && b.take(8).sameElements(PngSig) &&
          new String(b.slice(12, 16), "US-ASCII") == "IHDR")
        (be32(b, 16), be32(b, 20))
      else if (b.length >= 26 && b(0) == 'B'.toByte && b(1) == 'M'.toByte)
        (le32(b, 18), le32(b, 22))
      else if (b.length >= 13 && b(0) == 'G'.toByte && b(1) == 'I'.toByte &&
          b(2) == 'F'.toByte && b(3) == '8'.toByte &&
          (b(4) == '7'.toByte || b(4) == '9'.toByte) && b(5) == 'a'.toByte)
        (le16(b, 6), le16(b, 8))
      else if (b.length >= 4 && (b(0) & 0xff) == 0xff && (b(1) & 0xff) == 0xd8)
        jpegDims(b)
      else (0, 0)
    val dim = 16
    val feats = new Array[Float](dim)
    var i = 0
    while (i < b.length) {
      feats(i % dim) += (b(i) & 0xff) / 255.0f
      i += 1
    }
    MediaFeatures(r.media_id, r.kind, b.length, w, h, feats)
  }

  /** Header-decode stage over the same per-partition seam. */
  def decodeHeaders(media: Dataset[MediaRow]): Dataset[MediaFeatures] = {
    import media.sparkSession.implicits._
    media.mapPartitions(_.map(decodeHeader))
  }

  // ---- real audio (WAV/RIFF) header decode -------------------------

  case class MediaAudio(media_id: Long, kind: String, n_bytes: Int,
      channels: Int, sample_rate: Int, bits: Int, n_samples: Long)

  /** REAL audio metadata decode: canonical 44-byte PCM WAV header —
    * "RIFF" + "WAVE" magic, "fmt " chunk (channels le16@22, sample
    * rate le32@24, bits/sample le16@34), "data" chunk size le32@40.
    * n_samples = data bytes / block align (channels · bits/8). A
    * payload that isn't a canonical-layout WAV degrades to zeros
    * rather than failing the batch — same contract as
    * [[decodeHeader]]. */
  def decodeWav(r: MediaRow): MediaAudio = {
    val b = r.payload
    def ascii(off: Int, s: String): Boolean =
      s.zipWithIndex.forall { case (c, i) => b(off + i) == c.toByte }
    val isWav = b.length >= 44 &&
      ascii(0, "RIFF") && ascii(8, "WAVEfmt ") && ascii(36, "data")
    if (!isWav) MediaAudio(r.media_id, r.kind, b.length, 0, 0, 0, 0L)
    else {
      val channels = le16(b, 22)
      val rate = le32(b, 24)
      val bits = le16(b, 34)
      val dataLen = le32(b, 40)
      val blockAlign = channels * (bits / 8)
      val nSamples = if (blockAlign > 0) dataLen.toLong / blockAlign else 0L
      MediaAudio(r.media_id, r.kind, b.length, channels, rate, bits, nSamples)
    }
  }

  /** WAV-decode stage over the per-partition seam. */
  def decodeWavs(media: Dataset[MediaRow]): Dataset[MediaAudio] = {
    import media.sparkSession.implicits._
    media.mapPartitions(_.map(decodeWav))
  }

  /** Canonical 44-byte PCM WAV header around `body` as the data
    * chunk (used to synthesize test/oracle payloads). */
  def wavBytes(channels: Int, sampleRate: Int, bits: Int, body: Array[Byte]): Array[Byte] = {
    val out = new Array[Byte](44 + body.length)
    "RIFF".getBytes("US-ASCII").copyToArray(out, 0)
    writeLe32(out, 4, 36 + body.length)
    "WAVEfmt ".getBytes("US-ASCII").copyToArray(out, 8)
    writeLe32(out, 16, 16)                  // fmt chunk size (PCM)
    out(20) = 1                             // audio format = PCM
    out(22) = channels.toByte; out(23) = (channels >>> 8).toByte
    writeLe32(out, 24, sampleRate)
    val blockAlign = channels * (bits / 8)
    writeLe32(out, 28, sampleRate * blockAlign) // byte rate
    out(32) = blockAlign.toByte; out(33) = (blockAlign >>> 8).toByte
    out(34) = bits.toByte; out(35) = (bits >>> 8).toByte
    "data".getBytes("US-ASCII").copyToArray(out, 36)
    writeLe32(out, 40, body.length)
    body.copyToArray(out, 44)
    out
  }

  /** Minimal valid-header builders (used to synthesize test/oracle
    * payloads; CRCs are zeroed — the parser, like most fast-path
    * probers, does not checksum). PNG: signature + IHDR chunk
    * (33 bytes) + body. BMP: 54-byte BITMAPFILEHEADER+INFOHEADER +
    * body. */
  def pngBytes(w: Int, h: Int, body: Array[Byte]): Array[Byte] = {
    val out = new Array[Byte](33 + body.length)
    PngSig.copyToArray(out, 0)
    out(11) = 13 // IHDR data length
    "IHDR".getBytes("US-ASCII").copyToArray(out, 12)
    writeBe32(out, 16, w); writeBe32(out, 20, h)
    out(24) = 8; out(25) = 6 // bit depth, color type RGBA
    body.copyToArray(out, 33)
    out
  }

  def bmpBytes(w: Int, h: Int, body: Array[Byte]): Array[Byte] = {
    val out = new Array[Byte](54 + body.length)
    out(0) = 'B'.toByte; out(1) = 'M'.toByte
    writeLe32(out, 2, 54 + body.length) // file size
    writeLe32(out, 10, 54)              // pixel-data offset
    writeLe32(out, 14, 40)              // BITMAPINFOHEADER size
    writeLe32(out, 18, w); writeLe32(out, 22, h)
    out(26) = 1; out(28) = 24           // planes, bpp
    body.copyToArray(out, 54)
    out
  }

  /** GIF89a: 6-byte signature + logical screen descriptor (w/h as
    * little-endian u16) — a 13-byte header + body. Dims cap at 65535
    * by format. */
  def gifBytes(w: Int, h: Int, body: Array[Byte]): Array[Byte] = {
    require(w <= 0xffff && h <= 0xffff, "GIF dims are u16")
    val out = new Array[Byte](13 + body.length)
    "GIF89a".getBytes("US-ASCII").copyToArray(out, 0)
    out(6) = w.toByte; out(7) = (w >>> 8).toByte
    out(8) = h.toByte; out(9) = (h >>> 8).toByte
    body.copyToArray(out, 13)
    out
  }

  /** Minimal JFIF JPEG: SOI + APP0 (18 bytes, exercises the marker
    * walk) + SOF0/SOF2 (3 components) + body as entropy data — a
    * 39-byte header. `progressive` emits SOF2 instead of SOF0. */
  def jpegBytes(w: Int, h: Int, body: Array[Byte],
      progressive: Boolean = false): Array[Byte] = {
    require(w <= 0xffff && h <= 0xffff, "JPEG dims are u16")
    val out = new Array[Byte](39 + body.length)
    out(0) = 0xff.toByte; out(1) = 0xd8.toByte            // SOI
    out(2) = 0xff.toByte; out(3) = 0xe0.toByte            // APP0
    writeBe16(out, 4, 16)
    "JFIF".getBytes("US-ASCII").copyToArray(out, 6)       // + trailing \0
    out(11) = 1; out(12) = 1                              // version 1.1
    writeBe16(out, 14, 1); writeBe16(out, 16, 1)          // 1x1 density
    out(20) = 0xff.toByte
    out(21) = (if (progressive) 0xc2 else 0xc0).toByte    // SOFn
    writeBe16(out, 22, 17)                                // 2+1+2+2+1+3*3
    out(24) = 8                                           // precision
    writeBe16(out, 25, h); writeBe16(out, 27, w)
    out(29) = 3                                           // components
    var c = 0
    while (c < 3) {
      out(30 + c * 3) = (c + 1).toByte                    // id
      out(31 + c * 3) = 0x11                              // 1x1 sampling
      c += 1                                              // qtable 0
    }
    body.copyToArray(out, 39)
    out
  }

  private def writeBe16(b: Array[Byte], off: Int, v: Int): Unit = {
    b(off) = (v >>> 8).toByte; b(off + 1) = v.toByte
  }

  private def writeBe32(b: Array[Byte], off: Int, v: Int): Unit = {
    b(off) = (v >>> 24).toByte; b(off + 1) = (v >>> 16).toByte
    b(off + 2) = (v >>> 8).toByte; b(off + 3) = v.toByte
  }

  private def writeLe32(b: Array[Byte], off: Int, v: Int): Unit = {
    b(off) = v.toByte; b(off + 1) = (v >>> 8).toByte
    b(off + 2) = (v >>> 16).toByte; b(off + 3) = (v >>> 24).toByte
  }

  /** Build a typed media Dataset from any table with a text column —
    * the test harness for the plumbing (payload = utf8 bytes). */
  def mediaFromText(df: DataFrame, idCol: String, textCol: String): DataFrame =
    df.select(
      col(idCol).cast("long").as("media_id"),
      lit("text/plain").as("kind"),
      // null text = EMPTY payload, never a null payload: every
      // downstream consumer (sampleFrames, decode seams) walks the
      // byte array and must not NPE on a null-text document
      encode(coalesce(col(textCol), lit("")), "UTF-8").as("payload"))

  /** Frame-sampling stub: every nth byte window as a "frame". */
  def sampleFrames(media: Dataset[MediaRow], frameBytes: Int, everyN: Int): DataFrame = {
    import media.sparkSession.implicits._
    media.flatMap { r =>
      r.payload.grouped(frameBytes).zipWithIndex.collect {
        case (chunk, idx) if idx % everyN == 0 =>
          (r.media_id, idx, chunk.length)
      }
    }.toDF("media_id", "frame_no", "frame_bytes")
  }

  /** MMC4/OBELICS-style interleaved sample assembly: each document
    * becomes ONE ordered multimodal sequence of text chunks with
    * "image" items spliced between them at deterministic anchors.
    * Text items are non-overlapping `chunkWords`-word chunks at even
    * sequence positions (chunk i → seq 2i); image items are the
    * document's sampled media frames (every `everyN`-th
    * `frameChars`-byte window of its payload, the m2 rule) anchored
    * after the same-index chunk (frame d → seq 2d+1), dropped when no
    * anchor chunk exists. The "image" content here is the frame's
    * digest — the real pipeline would carry the decoded bytes through
    * the decodeFeatures seam above; the SEQUENCING is the operator.
    *
    * Everything is per-row expression work (sequence/transform/explode
    * + a union of the two typed streams): embarrassingly parallel,
    * no shuffle, no UDF, stays in whole-stage codegen. At 100 TB this
    * is a map-only stage that parallelizes to every core reading the
    * corpus. */
  def interleave(docs: DataFrame, idCol: String, textCol: String,
      chunkWords: Int = 20, frameChars: Int = 64, everyN: Int = 2): DataFrame = {
    val base = docs.select(col(idCol).cast("long").as("doc_id"),
        col(textCol).as("t"))
      .withColumn("w", split(col("t"), " "))
      .withColumn("n_chunks",
        expr(s"CAST(ceil(size(w) / ${chunkWords}.0) AS BIGINT)"))
      .withColumn("n_frames",
        // dense count of KEPT frames (raw windows thinned by everyN),
        // capped at n_chunks so every image has its anchor chunk
        expr(s"least(CAST(ceil(ceil(length(t) / ${frameChars}.0) / ${everyN}.0) AS BIGINT), n_chunks)"))
    val text = base.filter(col("n_chunks") > 0)
      .select(col("doc_id"), explode(expr(
        s"transform(sequence(0, CAST(n_chunks - 1 AS INT)), i -> struct(" +
          s"CAST(i * 2 AS BIGINT) AS seq_no, 'text' AS item_type, " +
          s"concat_ws(' ', slice(w, i * $chunkWords + 1, $chunkWords)) AS content, " +
          s"CAST(length(concat_ws(' ', slice(w, i * $chunkWords + 1, $chunkWords))) AS BIGINT) AS n_bytes))"))
        .as("x"))
      .select(col("doc_id"), col("x.seq_no"), col("x.item_type"),
        col("x.content"), col("x.n_bytes"))
    val images = base.filter(col("n_frames") > 0)
      .select(col("doc_id"), explode(expr(
        s"transform(sequence(0, CAST(n_frames - 1 AS INT)), d -> struct(" +
          s"CAST(d * 2 + 1 AS BIGINT) AS seq_no, 'image' AS item_type, " +
          s"md5(substring(t, d * ${everyN * frameChars} + 1, $frameChars)) AS content, " +
          s"CAST(length(substring(t, d * ${everyN * frameChars} + 1, $frameChars)) AS BIGINT) AS n_bytes))"))
        .as("x"))
      .select(col("doc_id"), col("x.seq_no"), col("x.item_type"),
        col("x.content"), col("x.n_bytes"))
    text.unionByName(images)
  }
}
