package graft.operators

import org.apache.spark.sql.{Column, DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal-column plumbing: image/audio/video payloads ride through
  * the engine as opaque `binary` columns with typed metadata, and
  * decode / feature-extract steps run as typed `mapPartitions` stages
  * (one decoder init per partition, streaming batch shape — the Scala
  * analogue of `mapInPandas`).
  *
  * Header decode is REAL: [[ImageHeader.parse]] reads PNG IHDR, JPEG
  * SOF0/SOF2 and GIF descriptors byte-by-byte (pure JVM, no codec
  * libraries). Payloads that are not a recognized container fall back to
  * deterministic synthetic metadata (format "raw") so mixed-quality
  * corpora keep flowing — the 100 TB posture for web-crawled media.
  * Full pixel decode (which genuinely needs a codec) would slot into the
  * same mapPartitions stage without touching schema or partitioning.
  */
object Multimodal {

  /** An opaque media payload + its source metadata. */
  final case class MediaFile(media_id: Long, kind: String, content: Array[Byte])

  /** Decoded image metadata; `format` is what the bytes actually are
    * (png/jpeg/gif, or "raw" when no container header matched).
    */
  final case class ImageMeta(
      media_id: Long, format: String, n_bytes: Long,
      width: Int, height: Int, channels: Int)

  /** Pure-JVM image container header parsing. */
  object ImageHeader {
    final case class Info(format: String, width: Int, height: Int, channels: Int)

    private def u8(b: Array[Byte], i: Int): Int = b(i) & 0xff
    private def be16(b: Array[Byte], i: Int): Int = (u8(b, i) << 8) | u8(b, i + 1)
    private def be32(b: Array[Byte], i: Int): Int = (be16(b, i) << 16) | be16(b, i + 2)
    private def le16(b: Array[Byte], i: Int): Int = u8(b, i) | (u8(b, i + 1) << 8)

    private val PngMagic =
      Array(0x89, 'P', 'N', 'G', 0x0d, 0x0a, 0x1a, 0x0a).map(_.toByte)

    def parse(b: Array[Byte]): Option[Info] = {
      if (b.length >= 26 && b.startsWith(PngMagic) &&
        new String(b, 12, 4, "US-ASCII") == "IHDR") {
        // IHDR: width/height as big-endian u32 at 16/20, bit depth at 24,
        // color type at 25 (PNG spec §11.2.2)
        val channels = u8(b, 25) match {
          case 0 => 1 // greyscale
          case 2 => 3 // truecolor
          case 3 => 1 // palette-indexed
          case 4 => 2 // grey + alpha
          case 6 => 4 // truecolor + alpha
          case _ => 3
        }
        Some(Info("png", be32(b, 16), be32(b, 20), channels))
      } else if (b.length >= 4 && u8(b, 0) == 0xff && u8(b, 1) == 0xd8) {
        // JPEG: walk the marker stream to the first frame header (SOFn,
        // n != 4/8/12 which are not frames); its payload is
        // precision(1) height(2) width(2) ncomponents(1)
        var i = 2
        while (i + 3 < b.length) {
          if (u8(b, i) != 0xff) return None // marker desync
          val marker = u8(b, i + 1)
          if (marker == 0xff) i += 1 // fill byte
          else if (marker == 0x01 || (marker >= 0xd0 && marker <= 0xd8)) {
            i += 2 // standalone marker, no length field
          } else if (marker == 0xd9) return None // EOI before any SOF
          else {
            val len = be16(b, i + 2)
            if (len < 2 || i + 2 + len > b.length) return None
            val isSof = marker >= 0xc0 && marker <= 0xcf &&
              marker != 0xc4 && marker != 0xc8 && marker != 0xcc
            if (isSof) {
              if (len < 8) return None
              return Some(Info("jpeg", be16(b, i + 7), be16(b, i + 5), u8(b, i + 9)))
            }
            i += 2 + len
          }
        }
        None
      } else if (b.length >= 10 && b(0) == 'G' && b(1) == 'I' && b(2) == 'F' &&
        b(3) == '8' && (b(4) == '7' || b(4) == '9') && b(5) == 'a') {
        // GIF logical screen descriptor: little-endian u16 at 6/8
        Some(Info("gif", le16(b, 6), le16(b, 8), 3))
      } else None
    }
  }

  /** Decode one payload: real header parse first; unrecognized bytes get
    * deterministic synthetic metadata tagged "raw" (a crawled corpus is
    * never 100% well-formed — a throwing decoder would kill the stage).
    */
  def decodeImage(m: MediaFile): ImageMeta = {
    val n = m.content.length.toLong
    ImageHeader.parse(m.content) match {
      case Some(h) => ImageMeta(m.media_id, h.format, n, h.width, h.height, h.channels)
      case None => ImageMeta(m.media_id, "raw", n,
        (1L + n % 1024L).toInt, (1L + (n * 7L) % 768L).toInt, 3)
    }
  }

  /** Decoded audio metadata (WAV/RIFF). */
  final case class AudioMeta(
      media_id: Long, format: String, n_bytes: Long,
      sample_rate: Int, channels: Int, bits: Int, n_samples: Long)

  /** Pure-JVM WAV (RIFF) header parsing: walks the chunk list to the
    * `fmt ` and `data` chunks; the declared data size is trusted (like
    * any streaming decoder), so truncated payloads still yield metadata.
    */
  object AudioHeader {
    private def u8(b: Array[Byte], i: Int): Int = b(i) & 0xff
    private def le16(b: Array[Byte], i: Int): Int = u8(b, i) | (u8(b, i + 1) << 8)
    private def le32(b: Array[Byte], i: Int): Long =
      le16(b, i).toLong | (le16(b, i + 2).toLong << 16)
    private def tag(b: Array[Byte], i: Int): String =
      new String(b, i, 4, "US-ASCII")

    /** (sample_rate, channels, bits, n_samples) if `b` is a RIFF/WAVE. */
    def parseWav(b: Array[Byte]): Option[(Int, Int, Int, Long)] = {
      if (b.length < 36 || tag(b, 0) != "RIFF" || tag(b, 8) != "WAVE") return None
      var i = 12
      var fmt: Option[(Int, Int, Int)] = None // rate, channels, bits
      var dataSize: Option[Long] = None
      while (i + 8 <= b.length && (fmt.isEmpty || dataSize.isEmpty)) {
        val id = tag(b, i)
        val size = le32(b, i + 4)
        if (id == "fmt " && i + 24 <= b.length) {
          val ch = le16(b, i + 10)
          val rate = le32(b, i + 12).toInt
          val bits = le16(b, i + 22)
          if (ch > 0 && rate > 0 && bits > 0) fmt = Some((rate, ch, bits))
        } else if (id == "data") {
          dataSize = Some(size)
        }
        // chunks are 2-byte aligned; size is an untrusted u32 — advance in
        // Long so 0xFFFFFFF8-style sizes can't wrap the step to 0 (hang) or
        // drive i negative (throw). Anything past the buffer ends the walk.
        val next = i.toLong + 8L + size + (size & 1L)
        i = if (next > b.length) b.length else next.toInt
      }
      for ((rate, ch, bits) <- fmt; ds <- dataSize)
        yield (rate, ch, bits, ds / math.max(1, ch * bits / 8))
    }
  }

  /** Decode one audio payload; non-RIFF bytes degrade to "raw". */
  def decodeAudio(m: MediaFile): AudioMeta = {
    val n = m.content.length.toLong
    AudioHeader.parseWav(m.content) match {
      case Some((rate, ch, bits, samples)) =>
        AudioMeta(m.media_id, "wav", n, rate, ch, bits, samples)
      case None => AudioMeta(m.media_id, "raw", n, 0, 0, 0, 0L)
    }
  }

  /** Audio decode stage: same mapPartitions shape as images. */
  def decodeAudios(spark: SparkSession, media: DataFrame): Dataset[AudioMeta] = {
    import spark.implicits._
    media.as[MediaFile].mapPartitions(_.map(decodeAudio))
  }

  /** Media source with REAL RIFF/WAVE headers (44-byte canonical header,
    * payload elided — decoders trust the declared data size): sample
    * rate / channel count / sample count derive from the row id, built
    * with native column functions like [[syntheticImages]].
    */
  def syntheticWavs(df: DataFrame, idCol: String): DataFrame = {
    val id = col(idCol).cast("long")
    def swap(h: Column, pairs: Seq[Int]): Column =
      concat(pairs.map(p => substring(h, p, 2)): _*)
    def le32(c: Column): Column = unhex(swap(lpad(hex(c), 8, "0"), Seq(7, 5, 3, 1)))
    def le16(c: Column): Column = unhex(swap(lpad(hex(c), 4, "0"), Seq(3, 1)))
    val rate = lit(8000L) + (id % 8L) * 1000L
    val channels = lit(1L) + id % 2L
    val nSamples = lit(100L) + (id * 13L) % 900L
    val dataSize = nSamples * channels * 2L // 16-bit PCM
    val byteRate = rate * channels * 2L
    val blockAlign = channels * 2L
    df.select(
      id.as("media_id"), lit("audio/wav").as("kind"),
      concat(
        unhex(lit("52494646")), le32(dataSize + 36L), unhex(lit("57415645")), // RIFF size WAVE
        unhex(lit("666D7420")), le32(lit(16L)), le16(lit(1L)),                // fmt , PCM
        le16(channels), le32(rate), le32(byteRate), le16(blockAlign),
        le16(lit(16L)),                                                      // bits
        unhex(lit("64617461")), le32(dataSize)                               // data chunk header
      ).as("content"))
  }

  /** Decoded video metadata (MP4). */
  final case class VideoMeta(
      media_id: Long, format: String, n_bytes: Long,
      width: Int, height: Int, duration_ms: Long)

  /** Pure-JVM MP4 (ISO BMFF) header parsing: walks the box tree
    * (`[u32 size][4cc type][payload]`) into `moov` → `mvhd`
    * (timescale/duration) and `trak` → `tkhd` (width/height as 16.16
    * fixed point). Media data (`mdat`) is never touched — exactly how a
    * probe step behaves on a 100 TB corpus.
    */
  object VideoHeader {
    final case class Info(width: Int, height: Int, durationMs: Long)

    private def u8(b: Array[Byte], i: Int): Int = b(i) & 0xff
    private def be32(b: Array[Byte], i: Int): Long =
      (u8(b, i).toLong << 24) | (u8(b, i + 1) << 16) | (u8(b, i + 2) << 8) | u8(b, i + 3)
    private def tag(b: Array[Byte], i: Int): String =
      new String(b, i, 4, "US-ASCII")

    def parseMp4(b: Array[Byte]): Option[Info] = {
      if (b.length < 16 || tag(b, 4) != "ftyp") return None
      var width = -1
      var height = -1
      var timescale = 0L
      var duration = -1L
      def walk(start: Int, end: Int, depth: Int): Unit = {
        var i = start
        while (i + 8 <= end) {
          val size = be32(b, i)
          if (size < 8 || i + size > end) return
          tag(b, i + 4) match {
            case "moov" | "trak" if depth < 4 =>
              walk(i + 8, i + size.toInt, depth + 1)
            case "mvhd" if size >= 32 && u8(b, i + 8) == 0 => // version 0
              timescale = be32(b, i + 20)
              duration = be32(b, i + 24)
            case "tkhd" if size >= 92 && u8(b, i + 8) == 0 =>
              width = (be32(b, i + 84) >> 16).toInt // 16.16 fixed point
              height = (be32(b, i + 88) >> 16).toInt
            case _ =>
          }
          i += size.toInt
        }
      }
      walk(0, b.length, 0)
      if (width > 0 && height > 0 && timescale > 0 && duration >= 0)
        Some(Info(width, height, duration * 1000L / timescale))
      else None
    }
  }

  /** Decode one video payload; non-MP4 bytes degrade to "raw". */
  def decodeVideo(m: MediaFile): VideoMeta = {
    val n = m.content.length.toLong
    VideoHeader.parseMp4(m.content) match {
      case Some(i) => VideoMeta(m.media_id, "mp4", n, i.width, i.height, i.durationMs)
      case None => VideoMeta(m.media_id, "raw", n, 0, 0, 0L)
    }
  }

  /** Video decode stage: same mapPartitions shape as images/audio. */
  def decodeVideos(spark: SparkSession, media: DataFrame): Dataset[VideoMeta] = {
    import spark.implicits._
    media.as[MediaFile].mapPartitions(_.map(decodeVideo))
  }

  /** Media source with REAL MP4 box structure (ftyp + moov{mvhd,
    * trak{tkhd}}, 232 bytes, media data elided): dimensions and duration
    * derive from the row id; decode has to walk genuine box sizes and
    * 16.16 fixed-point fields to recover them.
    */
  def syntheticMp4s(df: DataFrame, idCol: String): DataFrame = {
    val id = col(idCol).cast("long")
    def be32(c: Column): Column = unhex(lpad(hex(c), 8, "0"))
    def be16(c: Column): Column = unhex(lpad(hex(c), 4, "0"))
    val w = lit(16L) + id % 1920L
    val h = lit(16L) + (id * 3L) % 1080L
    val durMs = lit(1000L) + id % 60000L // timescale 1000 -> field == ms
    val matrix = "000100000000000000000000000000000001000000000000000000000000000040000000"
    val ftyp = unhex(lit("000000106674797069736F6D00000000"))
    val mvhd = concat(
      unhex(lit("0000006C6D766864" + "00000000" + "00000000" + "00000000" + "000003E8")),
      be32(durMs),
      unhex(lit("00010000" + "0100" + "0000" + "0000000000000000" + matrix +
        "0" * 48 + "00000002")))
    val tkhd = concat(
      unhex(lit("0000005C746B6864" + "00000000" + "00000000" + "00000000" +
        "00000001" + "00000000")),
      be32(durMs),
      unhex(lit("0000000000000000" + "0000" + "0000" + "0000" + "0000" + matrix)),
      be16(w), unhex(lit("0000")), be16(h), unhex(lit("0000")))
    val trak = concat(unhex(lit("000000647472616B")), tkhd)
    val moov = concat(unhex(lit("000000D86D6F6F76")), mvhd, trak)
    df.select(
      id.as("media_id"), lit("video/mp4").as("kind"),
      concat(ftyp, moov).as("content"))
  }

  /** Wrap any table into media rows (demo source: utf-8 bytes of a text
    * column standing in for opaque payload bytes).
    */
  def fromText(df: DataFrame, idCol: String, textCol: String): DataFrame =
    df.select(
      col(idCol).cast("long").as("media_id"),
      lit("image").as("kind"),
      encode(col(textCol), "UTF-8").as("content"))

  /** Media source with REAL image containers: minimal PNG (even ids) and
    * JPEG (odd ids) byte streams whose IHDR / SOF0 headers encode
    * dimensions derived from the row id. Built entirely from native
    * column functions (hex/unhex/concat — codegen'd), so payload
    * synthesis runs at scan speed with no UDF; decode then has to parse
    * genuine magic bytes and big-endian fields to recover the numbers.
    */
  def syntheticImages(df: DataFrame, idCol: String): DataFrame = {
    val id = col(idCol).cast("long")
    def be32(c: Column): Column = unhex(lpad(hex(c), 8, "0"))
    def be16(c: Column): Column = unhex(lpad(hex(c), 4, "0"))
    val w = lit(1L) + id % 1024L
    val h = lit(1L) + (id * 7L) % 768L
    // PNG: magic, IHDR length 13, "IHDR", w, h, depth 8, color type 2
    // (truecolor, 3 channels), compression/filter/interlace 0, CRC
    // (unchecked by header readers)
    val png = concat(
      unhex(lit("89504E470D0A1A0A0000000D49484452")),
      be32(w), be32(h),
      unhex(lit("080200000000000000")))
    // JPEG: SOI, SOF0 (len 17, precision 8), h, w, 3 component specs, EOI
    val jpeg = concat(
      unhex(lit("FFD8FFC0001108")), be16(h), be16(w),
      unhex(lit("03011100021101031101FFD9")))
    df.select(
      id.as("media_id"),
      when(id % 2 === 0, lit("image/png")).otherwise(lit("image/jpeg")).as("kind"),
      when(id % 2 === 0, png).otherwise(jpeg).as("content"))
  }

  /** Decode stage: binary → typed metadata via mapPartitions. Decoder
    * state (the expensive part in a full pixel codec) is initialized once
    * per partition; rows stream through without materializing the
    * partition.
    */
  def decodeImages(spark: SparkSession, media: DataFrame): Dataset[ImageMeta] = {
    import spark.implicits._
    media.as[MediaFile].mapPartitions { it =>
      // a pixel codec would init here, once per partition
      it.map(decodeImage)
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
