package graft.operators

import java.awt.image.BufferedImage
import java.io.{ByteArrayInputStream, ByteArrayOutputStream}
import javax.imageio.ImageIO

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal-column plumbing: media as opaque `binary` columns with
  * typed metadata, batch feature extraction via `mapPartitions`.
  *
  * The image path is REAL: [[imagesFromDocuments]] synthesizes actual
  * PNG payloads (JDK `BufferedImage` → `ImageIO.write`) and
  * [[extractFeatures]] decodes genuine width/height back out with
  * `ImageIO.read` — a JDK-bundled codec (java.desktop), no external
  * libraries. Audio/video mimes (no JDK codec exists) fall back to a
  * deterministic fingerprint decode, clearly marked. At scale,
  * `mapPartitions` amortizes codec setup per partition (the reason it
  * beats a per-row UDF for heavy decodes).
  */
object Multimodal {

  case class MediaRecord(media_id: Long, mime: String, media: Array[Byte])
  case class MediaFeatures(media_id: Long, mime: String, n_bytes: Long,
                           width: Int, height: Int, n_frames: Int,
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

  /** FNV-1a payload fingerprint — provenance column for all mimes. */
  private def fnv64(bytes: Array[Byte]): Long = {
    var checksum = 0xcbf29ce484222325L
    var i = 0
    while (i < bytes.length) { checksum ^= (bytes(i) & 0xffL); checksum *= 0x100000001b3L; i += 1 }
    checksum
  }

  /** FALLBACK decode for mimes without a JDK codec (audio/video) or
    * undecodable image payloads: deterministic fake properties from the
    * byte fingerprint. Replace with an ffmpeg-style binding where
    * available — the signature is the contract. */
  private[graft] def decodeStub(r: MediaRecord): MediaFeatures = {
    val checksum = fnv64(r.media)
    val n = r.media.length
    val w = 16 + (math.abs(checksum % 64)).toInt * 16
    val h = 16 + (math.abs((checksum >> 8) % 64)).toInt * 16
    val frames = if (r.mime.startsWith("video")) 1 + (n % 240) else 1
    MediaFeatures(r.media_id, r.mime, n.toLong, w, h, frames, checksum)
  }

  /** Cheap magic-prefix sniff (PNG / JPEG / GIF) so non-image bytes that
    * merely carry an image mime skip the ImageIO reader-SPI scan. */
  private[graft] def looksLikeImage(b: Array[Byte]): Boolean =
    (b.length >= 8 &&
      b(0) == 0x89.toByte && b(1) == 'P' && b(2) == 'N' && b(3) == 'G') ||
    (b.length >= 3 &&
      b(0) == 0xff.toByte && b(1) == 0xd8.toByte && b(2) == 0xff.toByte) ||
    (b.length >= 4 && b(0) == 'G' && b(1) == 'I' && b(2) == 'F' && b(3) == '8')

  /** REAL decode: image mimes whose payload carries an image magic prefix
    * go through `ImageIO.read` and report the codec's decoded
    * width/height; anything else (non-image mime, non-image bytes, or a
    * payload the codec rejects — JDK readers can throw unchecked
    * exceptions on malformed input, hence NonFatal) falls back to
    * [[decodeStub]]. */
  private[graft] def decode(r: MediaRecord): MediaFeatures = {
    if (r.mime.startsWith("image/") && looksLikeImage(r.media)) {
      val img =
        try ImageIO.read(new ByteArrayInputStream(r.media))
        catch { case scala.util.control.NonFatal(_) => null }
      if (img != null)
        return MediaFeatures(r.media_id, r.mime, r.media.length.toLong,
          img.getWidth, img.getHeight, 1, fnv64(r.media))
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
