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

  /** Build a typed media Dataset from any table with a text column —
    * the test harness for the plumbing (payload = utf8 bytes). */
  def mediaFromText(df: DataFrame, idCol: String, textCol: String): DataFrame =
    df.select(
      col(idCol).cast("long").as("media_id"),
      lit("text/plain").as("kind"),
      encode(col(textCol), "UTF-8").as("payload"))

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
}
