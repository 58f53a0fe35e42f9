package graft.operators

import java.awt.image.BufferedImage
import java.io.{ByteArrayInputStream, ByteArrayOutputStream}
import javax.imageio.ImageIO
import javax.sound.sampled.{AudioFileFormat, AudioFormat, AudioInputStream, AudioSystem}

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal-column plumbing: media as opaque `binary` columns with
  * typed metadata, batch feature extraction via `mapPartitions`.
  *
  * The image AND audio paths are REAL: [[imagesFromDocuments]]
  * synthesizes actual PNG payloads (JDK `BufferedImage` →
  * `ImageIO.write`) and [[extractFeatures]] decodes genuine width/height
  * back out with `ImageIO.read`; [[audioFromDocuments]] synthesizes
  * actual WAV payloads (`AudioSystem.write`) and the decode reads
  * genuine frame-count / sample-rate / channels back with
  * `AudioSystem.getAudioInputStream` — both JDK-bundled codecs
  * (java.desktop), no external libraries. Video mimes (no JDK codec
  * exists) fall back to a deterministic fingerprint decode, clearly
  * marked. At scale, `mapPartitions` amortizes codec setup per partition
  * (the reason it beats a per-row UDF for heavy decodes).
  */
object Multimodal {

  case class MediaRecord(media_id: Long, mime: String, media: Array[Byte])
  case class MediaFeatures(media_id: Long, mime: String, n_bytes: Long,
                           width: Int, height: Int, n_frames: Int,
                           sample_rate: Int, channels: Int,
                           checksum: Long)

  /** Build a media table from the documents table: encodes text bytes as
    * the opaque payload (mixed fake mimes — exercises the non-image
    * fallback path). Real pipelines read the binary from parquet/object
    * storage the same way. */
  def mediaFromDocuments(docs: DataFrame)(implicit spark: SparkSession): Dataset[MediaRecord] = {
    import spark.implicits._
    docs.select(
      col("doc_id").as("media_id"),
      element_at(array(lit("image/png"), lit("audio/wav"), lit("video/mp4")),
        (pmod(col("doc_id"), lit(3)) + 1).cast("int")).as("mime"),
      encode(col("text"), "UTF-8").as("media"))
      .as[MediaRecord]
  }

  /** Deterministic image dimensions for a synthesized doc image — the
    * q61 oracle recomputes the same arithmetic in SQL, so the decoded
    * dims are externally checkable. */
  def pngDims(docId: Long): (Int, Int) =
    (8 + math.floorMod(docId, 16L).toInt,
     8 + math.floorMod(math.floorDiv(docId, 16L), 16L).toInt)

  /** Encode a real PNG: deterministic per-pixel RGB from `seed`, written
    * through the JDK's ImageIO PNG codec. */
  def synthesizePng(width: Int, height: Int, seed: Long): Array[Byte] = {
    val img = new BufferedImage(width, height, BufferedImage.TYPE_INT_RGB)
    var y = 0
    while (y < height) {
      var x = 0
      while (x < width) {
        val h = seed * 1000003L + (y.toLong * width + x) * 0x9e3779b97f4a7c15L
        img.setRGB(x, y, (h >>> 24).toInt & 0xffffff)
        x += 1
      }
      y += 1
    }
    val bos = new ByteArrayOutputStream()
    ImageIO.write(img, "png", bos)
    bos.toByteArray
  }

  /** Media table of REAL PNG payloads, one per document, dimensions
    * deterministic from doc_id ([[pngDims]]). Partition-parallel
    * synthesis — the encode cost distributes like any decode would. */
  def imagesFromDocuments(docs: DataFrame)(implicit spark: SparkSession): Dataset[MediaRecord] = {
    import spark.implicits._
    docs.select(col("doc_id")).as[Long].mapPartitions { ids =>
      ImageIO.setUseCache(false) // in-memory codec streams, no temp files
      ids.map { id =>
        val (w, h) = pngDims(id)
        MediaRecord(id, "image/png", synthesizePng(w, h, id))
      }
    }
  }

  /** Deterministic audio properties for a synthesized doc clip — the q69
    * oracle recomputes the same arithmetic in SQL, so the decoded
    * frame-count / sample-rate are externally checkable (the q61 recipe
    * applied to the second modality). */
  def wavSpec(docId: Long): (Int, Int) =
    (100 + math.floorMod(docId, 900L).toInt,          // frames
     8000 * (1 + math.floorMod(docId, 3L).toInt))     // sample rate (Hz)

  /** Encode a real WAV: deterministic 16-bit mono PCM from `seed`,
    * written through the JDK's `AudioSystem` WAVE codec. */
  def synthesizeWav(frames: Int, sampleRate: Int, seed: Long): Array[Byte] = {
    val pcm = new Array[Byte](frames * 2) // 16-bit mono
    var i = 0
    while (i < frames) {
      val s = ((seed * 1000003L + i.toLong * 0x9e3779b97f4a7c15L) >>> 24).toShort
      pcm(2 * i) = (s & 0xff).toByte
      pcm(2 * i + 1) = ((s >> 8) & 0xff).toByte
      i += 1
    }
    val fmt = new AudioFormat(sampleRate.toFloat, 16, 1, true, false)
    val ais = new AudioInputStream(new ByteArrayInputStream(pcm), fmt, frames.toLong)
    val bos = new ByteArrayOutputStream()
    try AudioSystem.write(ais, AudioFileFormat.Type.WAVE, bos) finally ais.close()
    bos.toByteArray
  }

  /** Media table of REAL WAV payloads, one per document, properties
    * deterministic from doc_id ([[wavSpec]]). Partition-parallel
    * synthesis, like [[imagesFromDocuments]]. */
  def audioFromDocuments(docs: DataFrame)(implicit spark: SparkSession): Dataset[MediaRecord] = {
    import spark.implicits._
    docs.select(col("doc_id")).as[Long].mapPartitions { ids =>
      ids.map { id =>
        val (frames, sr) = wavSpec(id)
        MediaRecord(id, "audio/wav", synthesizeWav(frames, sr, id))
      }
    }
  }

  /** FNV-1a payload fingerprint — provenance column for all mimes. */
  private def fnv64(bytes: Array[Byte]): Long = {
    var checksum = 0xcbf29ce484222325L
    var i = 0
    while (i < bytes.length) { checksum ^= (bytes(i) & 0xffL); checksum *= 0x100000001b3L; i += 1 }
    checksum
  }

  /** FALLBACK decode for mimes without a JDK codec (video) or
    * undecodable image/audio payloads: deterministic fake properties
    * from the byte fingerprint. Replace with an ffmpeg-style binding
    * where available — the signature is the contract. */
  private[graft] def decodeStub(r: MediaRecord): MediaFeatures = {
    val checksum = fnv64(r.media)
    val n = r.media.length
    val w = 16 + (math.abs(checksum % 64)).toInt * 16
    val h = 16 + (math.abs((checksum >> 8) % 64)).toInt * 16
    val frames = if (r.mime.startsWith("video")) 1 + (n % 240) else 1
    val sr = if (r.mime.startsWith("audio")) 8000 * (1 + math.abs((checksum >> 16) % 3).toInt) else 0
    val ch = if (r.mime.startsWith("audio")) 1 else 0
    MediaFeatures(r.media_id, r.mime, n.toLong, w, h, frames, sr, ch, checksum)
  }

  /** REAL decode: image mimes go through `ImageIO.read` (every format
    * the JDK's reader SPIs know — PNG/JPEG/GIF/BMP/WBMP/TIFF — not just
    * a hardcoded magic list; unrecognizable bytes return null cheaply),
    * audio mimes through `AudioSystem.getAudioInputStream`
    * (WAV/AIFF/AU). Anything the codecs reject — non-media bytes under a
    * media mime, or malformed payloads where JDK readers can throw
    * unchecked exceptions, hence NonFatal — falls back to
    * [[decodeStub]]. */
  private[graft] def decode(r: MediaRecord): MediaFeatures = {
    if (r.mime.startsWith("image/")) {
      val img =
        try ImageIO.read(new ByteArrayInputStream(r.media))
        catch { case scala.util.control.NonFatal(_) => null }
      if (img != null)
        return MediaFeatures(r.media_id, r.mime, r.media.length.toLong,
          img.getWidth, img.getHeight, 1,
          0, img.getColorModel.getNumComponents, fnv64(r.media))
    } else if (r.mime.startsWith("audio/")) {
      try {
        val ais = AudioSystem.getAudioInputStream(new ByteArrayInputStream(r.media))
        try {
          val f = ais.getFormat
          return MediaFeatures(r.media_id, r.mime, r.media.length.toLong,
            0, 0, ais.getFrameLength.toInt,
            f.getSampleRate.toInt, f.getChannels, fnv64(r.media))
        } finally ais.close()
      } catch { case scala.util.control.NonFatal(_) => () }
    }
    decodeStub(r)
  }

  /** Partition-batched feature extraction. Codec setup happens once per
    * partition in the `iter =>` prologue; rows stream through without
    * materializing the partition. */
  def extractFeatures(media: Dataset[MediaRecord])(
      implicit spark: SparkSession): Dataset[MediaFeatures] = {
    import spark.implicits._
    media.mapPartitions { iter =>
      ImageIO.setUseCache(false) // per-partition codec setup: no temp-file cache
      iter.map(decode)
    }
  }

  /** Deterministic frame sampling for video rows: every `stride`-th frame
    * index up to n_frames — the shape of a frame-extraction fan-out
    * (one row per sampled frame, grain change like the genre explode). */
  def sampleFrames(features: Dataset[MediaFeatures], stride: Int): DataFrame =
    features.toDF()
      .filter(col("mime").startsWith("video"))
      .select(col("media_id"),
        explode(sequence(lit(0), col("n_frames") - 1, lit(stride))).as("frame_idx"))
}
