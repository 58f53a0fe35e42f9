package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal-column plumbing: media as opaque `binary` columns with
  * typed metadata, batch feature extraction via `mapPartitions`.
  *
  * The decode kernels are STUBBED (this environment ships no image/audio
  * codecs): `decodeStub` derives deterministic fake dimensions/features
  * from the bytes. Everything AROUND the stub — schema, Dataset encoders,
  * partition-batched execution shape, feature schema — is the real
  * production plumbing: swap `decodeStub` for a codec call and nothing
  * else changes. At scale, `mapPartitions` amortizes codec init per
  * partition (the reason it beats a per-row UDF for heavy decodes).
  */
object Multimodal {

  case class MediaRecord(media_id: Long, mime: String, media: Array[Byte])
  case class MediaFeatures(media_id: Long, mime: String, n_bytes: Long,
                           width: Int, height: Int, n_frames: Int,
                           checksum: Long)

  /** Build a media table from the documents table: encodes text bytes as
    * the opaque payload (deterministic fake "image"), with a mime derived
    * from the id. Real pipelines read the binary from parquet/object
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

  /** STUB decode: deterministic fake media properties from the raw bytes.
    * Replace with a real codec (e.g. javax.imageio / ffmpeg binding) —
    * the signature is the contract. */
  private[operators] def decodeStub(r: MediaRecord): MediaFeatures = {
    val n = r.media.length
    var checksum = 0xcbf29ce484222325L
    var i = 0
    while (i < n) { checksum ^= (r.media(i) & 0xffL); checksum *= 0x100000001b3L; i += 1 }
    val w = 16 + (math.abs(checksum % 64)).toInt * 16
    val h = 16 + (math.abs((checksum >> 8) % 64)).toInt * 16
    val frames = if (r.mime.startsWith("video")) 1 + (n % 240) else 1
    MediaFeatures(r.media_id, r.mime, n.toLong, w, h, frames, checksum)
  }

  /** Partition-batched feature extraction. One decoder context per
    * partition (the `iter =>` prologue is where a real codec would init);
    * rows stream through without materializing the partition. */
  def extractFeatures(media: Dataset[MediaRecord])(
      implicit spark: SparkSession): Dataset[MediaFeatures] = {
    import spark.implicits._
    media.mapPartitions { iter =>
      // real impl: val codec = Codec.open() here, once per partition
      iter.map(decodeStub)
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
