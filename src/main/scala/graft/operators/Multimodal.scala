package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal-column plumbing: image/audio/video payloads ride through
  * the engine as opaque `binary` columns with typed metadata, and
  * decode / feature-extract steps run as typed `mapPartitions` stages
  * (one decoder init per partition, streaming batch shape — the Scala
  * analogue of `mapInPandas`).
  *
  * The actual codec step is STUBBED (this container has no image/audio
  * libraries): [[StubDecoder.decodeImage]] derives deterministic fake
  * metadata from the bytes. Everything around it — schema, encoders,
  * partitioning, per-partition init, batch iteration — is the real
  * production shape; swap the stub for a JNI/javacv decoder and nothing
  * else changes.
  */
object Multimodal {

  /** An opaque media payload + its source metadata. */
  final case class MediaFile(media_id: Long, kind: String, content: Array[Byte])

  /** Decoded (stub) image metadata. */
  final case class ImageMeta(
      media_id: Long, kind: String, n_bytes: Long,
      width: Int, height: Int, channels: Int)

  object StubDecoder {
    /** STUB: a real implementation would parse the container header
      * (JPEG/PNG/...). Deterministic fake: dimensions derived from the
      * byte length so tests and oracles can verify the plumbing.
      */
    def decodeImage(m: MediaFile): ImageMeta = {
      val n = m.content.length.toLong
      ImageMeta(m.media_id, m.kind, n,
        width = (1L + n % 1024L).toInt,
        height = (1L + (n * 7L) % 768L).toInt,
        channels = 3)
    }
  }

  /** Wrap any table into media rows (demo source: utf-8 bytes of a text
    * column standing in for image bytes).
    */
  def fromText(df: DataFrame, idCol: String, textCol: String): DataFrame =
    df.select(
      col(idCol).cast("long").as("media_id"),
      lit("image").as("kind"),
      encode(col(textCol), "UTF-8").as("content"))

  /** Decode stage: binary → typed metadata via mapPartitions. Decoder
    * state (the expensive part in a real codec) is initialized once per
    * partition; rows stream through without materializing the partition.
    */
  def decodeImages(spark: SparkSession, media: DataFrame): Dataset[ImageMeta] = {
    import spark.implicits._
    media.as[MediaFile].mapPartitions { it =>
      // real code: val codec = Codec.init() here, once per partition
      it.map(StubDecoder.decodeImage)
    }
  }

  /** Frame-sampling stage shape for video: one row in, `frames` rows out
    * (flatMap keeps it streaming; no per-partition buffering).
    */
  final case class Frame(media_id: Long, frame_no: Int, n_bytes: Long)
  def sampleFrames(spark: SparkSession, media: DataFrame, everyNth: Int): Dataset[Frame] = {
    import spark.implicits._
    media.as[MediaFile].flatMap { m =>
      val n = m.content.length
      (0 until n by math.max(1, everyNth)).map(i => Frame(m.media_id, i, n.toLong))
    }
  }
}
