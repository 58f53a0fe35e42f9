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
  * (java.desktop), no external libraries. The video path is real too
  * for uncompressed AVI: [[videosFromDocuments]] synthesizes genuine
  * RIFF 'AVI ' containers (BI_RGB 24-bit DIB frames) and [[decodeAvi]]
  * parses the chunk tree and decodes the RGB frames back — pure-JDK
  * byte-level work, the same RIFF container family as the WAV codec.
  * Compressed video codecs (no JDK decoder exists) fall back to a
  * deterministic fingerprint decode, clearly marked ([[decodeStub]]).
  * At scale, `mapPartitions` amortizes codec setup per partition
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
  def synthesizePng(width: Int, height: Int, seed: Long): Array[Byte] =
    // the delta=0 special case of the brightness-shifted variant —
    // ONE pixel formula, not two copies the oracles could drift between
    synthesizePngBright(width, height, seed, delta = 0)

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

  /** [[synthesizePng]] with a uniform per-channel brightness shift
    * (clamped at 255) — the planted NEAR-duplicate for perceptual-hash
    * dedup: a re-graded/re-encoded copy whose bytes and exact hash
    * differ but whose perceptual structure survives. */
  def synthesizePngBright(width: Int, height: Int, seed: Long,
                          delta: Int): Array[Byte] = {
    val img = new BufferedImage(width, height, BufferedImage.TYPE_INT_RGB)
    var y = 0
    while (y < height) {
      var x = 0
      while (x < width) {
        val h = seed * 1000003L + (y.toLong * width + x) * 0x9e3779b97f4a7c15L
        val rgb = (h >>> 24).toInt & 0xffffff
        def ch(v: Int) = math.min(255, v + delta)
        img.setRGB(x, y, (ch((rgb >> 16) & 0xff) << 16) |
          (ch((rgb >> 8) & 0xff) << 8) | ch(rgb & 0xff))
        x += 1
      }
      y += 1
    }
    val bos = new ByteArrayOutputStream()
    ImageIO.write(img, "png", bos)
    bos.toByteArray
  }

  /** Brightness-shifted copies of the per-document images under offset
    * ids — the near-dup planting helper for q165 (delta = 0 plants
    * EXACT pixel copies under new ids). */
  def brightenedImagesFromDocuments(docs: DataFrame, idOffset: Long,
      delta: Int)(implicit spark: SparkSession): Dataset[MediaRecord] = {
    import spark.implicits._
    docs.select(col("doc_id")).as[Long].mapPartitions { ids =>
      ImageIO.setUseCache(false)
      ids.map { id =>
        val (w, h) = pngDims(id)
        MediaRecord(id + idOffset, "image/png",
          synthesizePngBright(w, h, id, delta))
      }
    }
  }

  /** PERCEPTUAL image hashes — the image-dedup signature step of a
    * multimodal training pipeline (the public LAION/DataComp-style
    * near-dup screen): per decoded image a 64-bit aHash (average hash:
    * 8×8 grayscale grid, bit i set iff cell i's gray exceeds the grid's
    * integer mean) and a 64-bit dHash (difference hash: 9×8 grid, bit
    * (y·8+x) set iff gray(x,y) > gray(x+1,y) — invariant under uniform
    * brightness/contrast shifts, which is exactly what byte-exact
    * hashing misses on re-encoded copies).
    *
    * Everything is INTEGER arithmetic so the hash is bit-reproducible
    * and SQL-replayable (q164 recomputes it from the synthesis formula
    * pixel by pixel): grayscale is the fixed-point BT.601 luma
    * (77R + 150G + 29B) >> 8, grid sampling is the same
    * floor(i·src/dst) nearest-neighbor map as [[resizeImages]], and
    * the aHash mean is the floor of the 64-cell sum. One row per
    * decoded image: (media_id, width, height, ahash, dhash); non-image
    * mimes and undecodable payloads drop (post-quarantine semantics).
    * `mapPartitions` decode, zero shuffle, O(grid) per row after the
    * decode. Downstream: [[Dedup.hammingDupPairs]] on either hash
    * gives exact-recall near-dup pairs without an all-pairs scan. */
  def perceptualHashes(media: Dataset[MediaRecord])(
      implicit spark: SparkSession): DataFrame = {
    import spark.implicits._
    media.mapPartitions { iter =>
      ImageIO.setUseCache(false)
      iter.flatMap { r =>
        if (!r.mime.startsWith("image/")) None
        else {
          val img = try ImageIO.read(new ByteArrayInputStream(r.media))
                    catch { case scala.util.control.NonFatal(_) => null }
          if (img == null) None
          else {
            val w = img.getWidth; val h = img.getHeight
            def gray(sx: Int, sy: Int): Int = {
              val rgb = img.getRGB(sx, sy) & 0xffffff
              (77 * ((rgb >> 16) & 0xff) + 150 * ((rgb >> 8) & 0xff) +
                29 * (rgb & 0xff)) >> 8
            }
            // dHash: 9 columns × 8 rows, compare horizontal neighbors
            var dhash = 0L
            var gy = 0
            while (gy < 8) {
              val sy = gy * h / 8
              var gx = 0
              while (gx < 8) {
                val a = gray(gx * w / 9, sy)
                val b = gray((gx + 1) * w / 9, sy)
                if (a > b) dhash |= (1L << (gy * 8 + gx))
                gx += 1
              }
              gy += 1
            }
            // aHash: 8×8 grid vs the grid's integer mean
            val cells = new Array[Int](64)
            var sum = 0L
            var i = 0
            while (i < 64) {
              cells(i) = gray((i % 8) * w / 8, (i / 8) * h / 8)
              sum += cells(i)
              i += 1
            }
            val mean = sum / 64
            var ahash = 0L
            i = 0
            while (i < 64) {
              if (cells(i) > mean) ahash |= (1L << i)
              i += 1
            }
            Some((r.media_id, w, h, ahash, dhash))
          }
        }
      }
    }.toDF("media_id", "width", "height", "ahash", "dhash")
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
  def synthesizeWav(frames: Int, sampleRate: Int, seed: Long): Array[Byte] =
    // the div=1 special case of the gain-scaled variant (s/1 == s
    // exactly) — ONE PCM formula, not two copies
    synthesizeWavGain(frames, sampleRate, seed, div = 1)

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

  /** Deterministic video properties for a synthesized doc clip — the
    * q90 oracle recomputes the same arithmetic in SQL, so the decoded
    * width / height / frame count are externally checkable (the
    * q61/q69 recipe applied to the third modality). Width varies mod
    * 11 so the DIB row stride (3·w rounded up to 4 bytes) exercises
    * every padding residue. */
  def aviSpec(docId: Long): (Int, Int, Int) =
    (6 + math.floorMod(docId, 11L).toInt,                // width
     4 + math.floorMod(math.floorDiv(docId, 11L), 9L).toInt, // height
     2 + math.floorMod(docId, 7L).toInt)                 // frames

  /** Deterministic RGB for pixel (x, y) of frame f — shared by the AVI
    * encoder and the spec's expected-pixel recomputation (same hash
    * family as [[synthesizePng]]). */
  private[graft] def aviPixel(seed: Long, f: Int, x: Int, y: Int,
                              w: Int, h: Int): Int = {
    val idx = f.toLong * w * h + y.toLong * w + x
    (((seed * 1000003L + idx * 0x9e3779b97f4a7c15L) >>> 24) & 0xffffff).toInt
  }

  /** Encode a real uncompressed AVI (RIFF 'AVI ' container, BI_RGB
    * 24-bit DIB '00db' frames — the format every AVI reader accepts;
    * RIFF is the container family the JDK's WAVE codec already
    * exercises): avih + strh('vids')/strf(BITMAPINFOHEADER) headers,
    * then one bottom-up BGR frame chunk per frame, rows padded to 4
    * bytes. Pure JDK byte assembly — no codec library. */
  def synthesizeAvi(width: Int, height: Int, frames: Int, seed: Long): Array[Byte] =
    synthesizeAviImpl(width, height, frames, seed, 0)

  /** [[synthesizeAvi]] with a uniform per-channel brightness shift
    * (clamped at 255) — the planted near-dup re-grade for video
    * fingerprinting, [[synthesizePngBright]]'s contract on frames. */
  def synthesizeAviBright(width: Int, height: Int, frames: Int, seed: Long,
                          delta: Int): Array[Byte] =
    synthesizeAviImpl(width, height, frames, seed, delta)

  private def synthesizeAviImpl(width: Int, height: Int, frames: Int,
                                seed: Long, delta: Int): Array[Byte] = {
    val stride = (3 * width + 3) / 4 * 4
    val frameBytes = stride * height
    val moviSize = 4 + frames * (8 + frameBytes)
    val hdrlSize = 4 + (8 + 56) + (12 + (8 + 56) + (8 + 40))
    val riffSize = 4 + (8 + hdrlSize) + (8 + moviSize)
    val buf = java.nio.ByteBuffer.allocate(8 + riffSize)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    def fourcc(s: String): Unit = buf.put(s.getBytes("US-ASCII"))
    fourcc("RIFF"); buf.putInt(riffSize); fourcc("AVI ")
    fourcc("LIST"); buf.putInt(hdrlSize); fourcc("hdrl")
    fourcc("avih"); buf.putInt(56)
    buf.putInt(33333)               // dwMicroSecPerFrame (30 fps)
    buf.putInt(frameBytes * 30)     // dwMaxBytesPerSec
    buf.putInt(0)                   // dwPaddingGranularity
    buf.putInt(0)                   // dwFlags
    buf.putInt(frames)              // dwTotalFrames
    buf.putInt(0)                   // dwInitialFrames
    buf.putInt(1)                   // dwStreams
    buf.putInt(frameBytes)          // dwSuggestedBufferSize
    buf.putInt(width); buf.putInt(height)
    (0 until 4).foreach(_ => buf.putInt(0)) // dwReserved
    fourcc("LIST"); buf.putInt(4 + 64 + 48); fourcc("strl") // 'strl' + strh + strf
    fourcc("strh"); buf.putInt(56)
    fourcc("vids"); fourcc("DIB ")
    buf.putInt(0); buf.putInt(0)    // dwFlags, wPriority+wLanguage
    buf.putInt(0)                   // dwInitialFrames
    buf.putInt(1); buf.putInt(30)   // dwScale / dwRate = 30 fps
    buf.putInt(0); buf.putInt(frames) // dwStart, dwLength
    buf.putInt(frameBytes)          // dwSuggestedBufferSize
    buf.putInt(-1)                  // dwQuality
    buf.putInt(0)                   // dwSampleSize
    buf.putShort(0); buf.putShort(0) // rcFrame left, top
    buf.putShort(width.toShort); buf.putShort(height.toShort)
    fourcc("strf"); buf.putInt(40)
    buf.putInt(40)                  // biSize
    buf.putInt(width); buf.putInt(height) // biHeight > 0: bottom-up
    buf.putShort(1); buf.putShort(24)     // biPlanes, biBitCount
    buf.putInt(0)                   // biCompression = BI_RGB
    buf.putInt(frameBytes)          // biSizeImage
    buf.putInt(0); buf.putInt(0); buf.putInt(0); buf.putInt(0)
    fourcc("LIST"); buf.putInt(moviSize); fourcc("movi")
    var f = 0
    while (f < frames) {
      fourcc("00db"); buf.putInt(frameBytes)
      var y = height - 1               // bottom-up row order
      while (y >= 0) {
        var x = 0
        while (x < width) {
          val rgb = aviPixel(seed, f, x, y, width, height)
          def ch(v: Int) = math.min(255, v + delta)
          buf.put(ch(rgb & 0xff).toByte)         // B
          buf.put(ch((rgb >> 8) & 0xff).toByte)  // G
          buf.put(ch((rgb >> 16) & 0xff).toByte) // R
          x += 1
        }
        var p = 3 * width
        while (p < stride) { buf.put(0.toByte); p += 1 }
        y -= 1
      }
      f += 1
    }
    buf.array()
  }

  /** Media table of REAL AVI payloads, one per document, properties
    * deterministic from doc_id ([[aviSpec]]). Partition-parallel
    * synthesis, like [[imagesFromDocuments]]. */
  def videosFromDocuments(docs: DataFrame)(implicit spark: SparkSession): Dataset[MediaRecord] = {
    import spark.implicits._
    docs.select(col("doc_id")).as[Long].mapPartitions { ids =>
      ids.map { id =>
        val (w, h, frames) = aviSpec(id)
        MediaRecord(id, "video/avi", synthesizeAvi(w, h, frames, id))
      }
    }
  }

  /** Deterministic geometry for a synthesized MJPEG clip — the q115
    * oracle recomputes the same arithmetic in SQL ([[aviSpec]]'s
    * recipe on the compressed-codec path). */
  def mjpegSpec(docId: Long): (Int, Int, Int) =
    (8 + math.floorMod(docId, 9L).toInt,                    // width
     6 + math.floorMod(math.floorDiv(docId, 9L), 7L).toInt, // height
     1 + math.floorMod(docId, 5L).toInt)                    // frames

  /** Encode a real MOTION-JPEG AVI: the same RIFF 'AVI ' container as
    * [[synthesizeAvi]], but strh/strf declare the 'MJPG' codec and
    * every '00dc' frame chunk is a complete JFIF payload written
    * through the JDK's ImageIO JPEG encoder (frame pixels from
    * [[aviPixel]], same hash family as the uncompressed path). Chunk
    * sizes vary per frame — exactly the property that distinguishes
    * the MJPEG walk from the fixed-stride DIB walk. */
  def synthesizeMjpegAvi(width: Int, height: Int, frames: Int, seed: Long): Array[Byte] = {
    val jpegs = (0 until frames).map { f =>
      val img = new BufferedImage(width, height, BufferedImage.TYPE_INT_RGB)
      var y = 0
      while (y < height) {
        var x = 0
        while (x < width) {
          img.setRGB(x, y, aviPixel(seed, f, x, y, width, height))
          x += 1
        }
        y += 1
      }
      val bos = new ByteArrayOutputStream()
      ImageIO.write(img, "jpeg", bos)
      bos.toByteArray
    }
    val moviSize = 4 + jpegs.map(j => 8 + j.length + (j.length & 1)).sum
    val hdrlSize = 4 + (8 + 56) + (12 + (8 + 56) + (8 + 40))
    val riffSize = 4 + (8 + hdrlSize) + (8 + moviSize)
    val maxFrame = jpegs.map(_.length).max
    val buf = java.nio.ByteBuffer.allocate(8 + riffSize)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    def fourcc(s: String): Unit = buf.put(s.getBytes("US-ASCII"))
    fourcc("RIFF"); buf.putInt(riffSize); fourcc("AVI ")
    fourcc("LIST"); buf.putInt(hdrlSize); fourcc("hdrl")
    fourcc("avih"); buf.putInt(56)
    buf.putInt(33333)               // dwMicroSecPerFrame (30 fps)
    buf.putInt(maxFrame * 30)       // dwMaxBytesPerSec
    buf.putInt(0)                   // dwPaddingGranularity
    buf.putInt(0)                   // dwFlags
    buf.putInt(frames)              // dwTotalFrames
    buf.putInt(0)                   // dwInitialFrames
    buf.putInt(1)                   // dwStreams
    buf.putInt(maxFrame)            // dwSuggestedBufferSize
    buf.putInt(width); buf.putInt(height)
    (0 until 4).foreach(_ => buf.putInt(0)) // dwReserved
    fourcc("LIST"); buf.putInt(4 + 64 + 48); fourcc("strl")
    fourcc("strh"); buf.putInt(56)
    fourcc("vids"); fourcc("MJPG")
    buf.putInt(0); buf.putInt(0)    // dwFlags, wPriority+wLanguage
    buf.putInt(0)                   // dwInitialFrames
    buf.putInt(1); buf.putInt(30)   // dwScale / dwRate = 30 fps
    buf.putInt(0); buf.putInt(frames) // dwStart, dwLength
    buf.putInt(maxFrame)            // dwSuggestedBufferSize
    buf.putInt(-1)                  // dwQuality
    buf.putInt(0)                   // dwSampleSize
    buf.putShort(0); buf.putShort(0) // rcFrame left, top
    buf.putShort(width.toShort); buf.putShort(height.toShort)
    fourcc("strf"); buf.putInt(40)
    buf.putInt(40)                  // biSize
    buf.putInt(width); buf.putInt(height)
    buf.putShort(1); buf.putShort(24)     // biPlanes, biBitCount
    buf.putInt(MJPG)                // biCompression = 'MJPG'
    buf.putInt(maxFrame)            // biSizeImage (advisory for MJPG)
    buf.putInt(0); buf.putInt(0); buf.putInt(0); buf.putInt(0)
    fourcc("LIST"); buf.putInt(moviSize); fourcc("movi")
    for (j <- jpegs) {
      fourcc("00dc"); buf.putInt(j.length)
      buf.put(j)
      if ((j.length & 1) == 1) buf.put(0.toByte) // word alignment
    }
    buf.array()
  }

  /** Media table of REAL MJPEG payloads, one per document, geometry
    * deterministic from doc_id ([[mjpegSpec]]). Partition-parallel
    * synthesis, like [[videosFromDocuments]]. */
  def mjpegVideosFromDocuments(docs: DataFrame)(implicit spark: SparkSession): Dataset[MediaRecord] = {
    import spark.implicits._
    docs.select(col("doc_id")).as[Long].mapPartitions { ids =>
      ImageIO.setUseCache(false)
      ids.map { id =>
        val (w, h, frames) = mjpegSpec(id)
        MediaRecord(id, "video/avi", synthesizeMjpegAvi(w, h, frames, id))
      }
    }
  }

  /** biCompression fourcc for motion-JPEG ('MJPG' little-endian). */
  private val MJPG = 0x47504a4d

  /** biCompression fourcc for planar YUV 4:2:0 ('I420' little-endian) —
    * the standard UNCOMPRESSED planar format real capture pipelines
    * emit: a full-resolution Y plane followed by quarter-resolution U
    * and V planes (chroma dims ⌈w/2⌉×⌈h/2⌉). No codec involved —
    * decoding is pure integer arithmetic, so it belongs on the real
    * decode path, not the stub. */
  private val I420 = 0x30323449

  /** Fixed-point BT.601 FULL-RANGE YUV→RGB (the JPEG-range integer
    * approximation: R = Y + (359·(V−128))>>8, G = Y − (88·(U−128) +
    * 183·(V−128))>>8, B = Y + (454·(U−128))>>8, clamped) — the single
    * conversion convention for both the synthesizer and the decoder;
    * chroma upsampling is nearest-neighbor (each 2×2 block shares its
    * U,V sample). Deterministic integer math, independently
    * re-implemented in the spec's expected-checksum recompute. */
  private def clamp8(v: Int): Int = if (v < 0) 0 else if (v > 255) 255 else v

  /** Deterministic geometry for a synthesized I420 clip — moduli differ
    * from [[mjpegSpec]] and include odd widths/heights, so the rounded-up
    * chroma-plane arithmetic (⌈w/2⌉) is actually exercised. */
  def i420Spec(docId: Long): (Int, Int, Int) =
    (6 + math.floorMod(docId, 11L).toInt,                    // width
     5 + math.floorMod(math.floorDiv(docId, 11L), 6L).toInt, // height
     1 + math.floorMod(docId, 4L).toInt)                     // frames

  /** Encode a real I420 AVI: the [[synthesizeAvi]] RIFF container with
    * strh/strf declaring the 'I420' planar-YUV format and one fixed-size
    * frame chunk per frame (w·h luma bytes + 2·⌈w/2⌉·⌈h/2⌉ chroma
    * bytes). Frame pixels come from [[aviPixel]] (same hash family as
    * every other synthesized clip); Y is the per-pixel BT.601 luma and
    * each chroma sample is computed from the MEAN RGB of its 2×2 block
    * (standard 4:2:0 downsampling, edge blocks average the pixels that
    * exist). */
  def synthesizeI420Avi(width: Int, height: Int, frames: Int, seed: Long): Array[Byte] = {
    val cw = (width + 1) / 2; val chh = (height + 1) / 2
    val frameSize = width * height + 2 * cw * chh
    val payloads = (0 until frames).map { f =>
      val out = new Array[Byte](frameSize)
      var y = 0
      while (y < height) {
        var x = 0
        while (x < width) {
          val rgb = aviPixel(seed, f, x, y, width, height)
          val r = (rgb >> 16) & 0xff; val g = (rgb >> 8) & 0xff; val b = rgb & 0xff
          out(y * width + x) = ((77 * r + 150 * g + 29 * b + 128) >> 8).toByte
          x += 1
        }
        y += 1
      }
      var cy = 0
      while (cy < chh) {
        var cx = 0
        while (cx < cw) {
          var sr = 0; var sg = 0; var sb = 0; var n = 0
          var dy = 0
          while (dy < 2) {
            var dx = 0
            while (dx < 2) {
              val px = 2 * cx + dx; val py = 2 * cy + dy
              if (px < width && py < height) {
                val rgb = aviPixel(seed, f, px, py, width, height)
                sr += (rgb >> 16) & 0xff; sg += (rgb >> 8) & 0xff
                sb += rgb & 0xff; n += 1
              }
              dx += 1
            }
            dy += 1
          }
          val r = (sr + n / 2) / n; val g = (sg + n / 2) / n
          val b = (sb + n / 2) / n
          out(width * height + cy * cw + cx) =
            clamp8(128 + ((-43 * r - 85 * g + 128 * b + 128) >> 8)).toByte
          out(width * height + cw * chh + cy * cw + cx) =
            clamp8(128 + ((128 * r - 107 * g - 21 * b + 128) >> 8)).toByte
          cx += 1
        }
        cy += 1
      }
      out
    }
    val moviSize = 4 + payloads.map(p => 8 + p.length + (p.length & 1)).sum
    val hdrlSize = 4 + (8 + 56) + (12 + (8 + 56) + (8 + 40))
    val riffSize = 4 + (8 + hdrlSize) + (8 + moviSize)
    val buf = java.nio.ByteBuffer.allocate(8 + riffSize)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    def fourcc(s: String): Unit = buf.put(s.getBytes("US-ASCII"))
    fourcc("RIFF"); buf.putInt(riffSize); fourcc("AVI ")
    fourcc("LIST"); buf.putInt(hdrlSize); fourcc("hdrl")
    fourcc("avih"); buf.putInt(56)
    buf.putInt(33333)               // dwMicroSecPerFrame (30 fps)
    buf.putInt(frameSize * 30)      // dwMaxBytesPerSec
    buf.putInt(0)                   // dwPaddingGranularity
    buf.putInt(0)                   // dwFlags
    buf.putInt(frames)              // dwTotalFrames
    buf.putInt(0)                   // dwInitialFrames
    buf.putInt(1)                   // dwStreams
    buf.putInt(frameSize)           // dwSuggestedBufferSize
    buf.putInt(width); buf.putInt(height)
    (0 until 4).foreach(_ => buf.putInt(0)) // dwReserved
    fourcc("LIST"); buf.putInt(4 + 64 + 48); fourcc("strl")
    fourcc("strh"); buf.putInt(56)
    fourcc("vids"); fourcc("I420")
    buf.putInt(0); buf.putInt(0)    // dwFlags, wPriority+wLanguage
    buf.putInt(0)                   // dwInitialFrames
    buf.putInt(1); buf.putInt(30)   // dwScale / dwRate = 30 fps
    buf.putInt(0); buf.putInt(frames) // dwStart, dwLength
    buf.putInt(frameSize)           // dwSuggestedBufferSize
    buf.putInt(-1)                  // dwQuality
    buf.putInt(frameSize)           // dwSampleSize (fixed-size samples)
    buf.putShort(0); buf.putShort(0) // rcFrame left, top
    buf.putShort(width.toShort); buf.putShort(height.toShort)
    fourcc("strf"); buf.putInt(40)
    buf.putInt(40)                  // biSize
    buf.putInt(width); buf.putInt(height)
    buf.putShort(1); buf.putShort(12)     // biPlanes, biBitCount (4:2:0)
    buf.putInt(I420)                // biCompression = 'I420'
    buf.putInt(frameSize)           // biSizeImage
    buf.putInt(0); buf.putInt(0); buf.putInt(0); buf.putInt(0)
    fourcc("LIST"); buf.putInt(moviSize); fourcc("movi")
    for (p <- payloads) {
      fourcc("00dc"); buf.putInt(p.length)
      buf.put(p)
      if ((p.length & 1) == 1) buf.put(0.toByte) // word alignment
    }
    buf.array()
  }

  /** Media table of REAL I420 payloads, one per document, geometry
    * deterministic from doc_id ([[i420Spec]]) — partition-parallel
    * synthesis like the DIB and MJPEG tables. */
  def i420VideosFromDocuments(docs: DataFrame)(implicit spark: SparkSession): Dataset[MediaRecord] = {
    import spark.implicits._
    docs.select(col("doc_id")).as[Long].mapPartitions { ids =>
      ids.map { id =>
        val (w, h, frames) = i420Spec(id)
        MediaRecord(id, "video/avi", synthesizeI420Avi(w, h, frames, id))
      }
    }
  }

  /** REAL video decode: a pure-JDK RIFF/AVI parser for uncompressed
    * BI_RGB DIB streams, planar-YUV 'I420' streams AND motion-JPEG
    * ('MJPG') streams — walks the chunk tree (hdrl → strh/strf for the
    * 'vids' geometry, movi for the frame chunks), validates every
    * frame chunk (size against the DIB stride for BI_RGB / the planar
    * layout for I420; SOI marker + in-bounds for MJPG, whose chunk
    * sizes vary per frame), and DECODES the frames: BI_RGB by direct
    * DIB byte walk, I420 by fixed-point BT.601 YUV→RGB arithmetic,
    * MJPG through the JDK's ImageIO JPEG codec (each frame chunk is a
    * complete JFIF payload — the MJPEG contract), rejecting any frame
    * whose decoded geometry contradicts the strf header. The returned checksum is FNV-1a over the decoded
    * top-down RGB pixel stream (not the container bytes), so a parser
    * that skipped the pixel data could not produce it — spec-asserted
    * against independently recomputed pixels. Returns None for
    * anything else (other compression fourccs, other containers),
    * which [[decode]] routes to the clearly-marked [[decodeStub]]
    * fallback — after this round the stub's video domain is genuinely
    * exotic codecs (cinepak/h264/... — no JDK decoder exists). */
  private[graft] def decodeAvi(bytes: Array[Byte]): Option[(Int, Int, Int, Long)] = {
    var checksum = 0xcbf29ce484222325L
    var ok = true
    def fnvByte(b: Int): Unit = {
      checksum ^= (b & 0xffL); checksum *= 0x100000001b3L
    }
    // hash the bottom-up BGR rows in top-down RGB order IN PLACE — the
    // whole-corpus decode path (q90/q61) visits every frame and must
    // not allocate a raster per frame just to hash and discard it
    // (real video frames are megabytes); [[frameRgb]] materializes
    // only in [[extractVideoFrames]], which emits the raster
    parseAvi(bytes) { (codec, w, h, _, off, size) =>
      if (ok && codec == 0) {
        val stride = (3 * w + 3) / 4 * 4
        var y = 0
        while (y < h) {
          val row = off + (h - 1 - y) * stride
          var x = 0
          while (x < w) {
            fnvByte(bytes(row + 3 * x + 2)) // R
            fnvByte(bytes(row + 3 * x + 1)) // G
            fnvByte(bytes(row + 3 * x))     // B
            x += 1
          }
          y += 1
        }
      } else if (ok && codec == I420) {
        // planar YUV→RGB in place (fixed-point BT.601 full-range,
        // nearest-neighbor chroma) — like the DIB walk, no raster is
        // allocated just to hash it
        val cw = (w + 1) / 2
        val uOff = off + w * h
        val vOff = uOff + cw * ((h + 1) / 2)
        var y = 0
        while (y < h) {
          var x = 0
          while (x < w) {
            val lum = bytes(off + y * w + x) & 0xff
            val ci = (y / 2) * cw + (x / 2)
            val u = (bytes(uOff + ci) & 0xff) - 128
            val v = (bytes(vOff + ci) & 0xff) - 128
            fnvByte(clamp8(lum + ((359 * v + 128) >> 8)))
            fnvByte(clamp8(lum - ((88 * u + 183 * v + 128) >> 8)))
            fnvByte(clamp8(lum + ((454 * u + 128) >> 8)))
            x += 1
          }
          y += 1
        }
      } else if (ok) {
        val img = try ImageIO.read(new ByteArrayInputStream(bytes, off, size))
                  catch { case scala.util.control.NonFatal(_) => null }
        if (img == null || img.getWidth != w || img.getHeight != h) ok = false
        else {
          var y = 0
          while (y < h) {
            var x = 0
            while (x < w) {
              val rgb = img.getRGB(x, y)
              fnvByte((rgb >> 16) & 0xff); fnvByte((rgb >> 8) & 0xff)
              fnvByte(rgb & 0xff)
              x += 1
            }
            y += 1
          }
        }
      }
    } match {
      case Some((w, h, n, _)) if ok => Some((w, h, n, checksum))
      case _ => None
    }
  }

  /** Decode one bottom-up BGR DIB frame chunk at `off` into a top-down
    * row-major RGB raster (3 bytes/pixel) — the caller ([[parseAvi]])
    * has already validated the chunk size against the DIB stride. */
  private def frameRgb(bytes: Array[Byte], off: Int, w: Int, h: Int): Array[Byte] = {
    val stride = (3 * w + 3) / 4 * 4
    val out = new Array[Byte](3 * w * h)
    var y = 0; var i = 0
    while (y < h) {
      val row = off + (h - 1 - y) * stride // bottom-up storage
      var x = 0
      while (x < w) {
        out(i) = bytes(row + 3 * x + 2)     // R
        out(i + 1) = bytes(row + 3 * x + 1) // G
        out(i + 2) = bytes(row + 3 * x)     // B
        i += 3; x += 1
      }
      y += 1
    }
    out
  }

  /** Decode one I420 frame chunk at `off` into a top-down row-major RGB
    * raster — the planar analogue of [[frameRgb]] (same fixed-point
    * BT.601 full-range math as the [[decodeAvi]] checksum walk; the
    * caller has validated the chunk size against the planar layout). */
  private def frameRgbI420(bytes: Array[Byte], off: Int, w: Int, h: Int): Array[Byte] = {
    val cw = (w + 1) / 2
    val uOff = off + w * h
    val vOff = uOff + cw * ((h + 1) / 2)
    val out = new Array[Byte](3 * w * h)
    var y = 0; var i = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        val lum = bytes(off + y * w + x) & 0xff
        val ci = (y / 2) * cw + (x / 2)
        val u = (bytes(uOff + ci) & 0xff) - 128
        val v = (bytes(vOff + ci) & 0xff) - 128
        out(i) = clamp8(lum + ((359 * v + 128) >> 8)).toByte
        out(i + 1) = clamp8(lum - ((88 * u + 183 * v + 128) >> 8)).toByte
        out(i + 2) = clamp8(lum + ((454 * u + 128) >> 8)).toByte
        i += 3; x += 1
      }
      y += 1
    }
    out
  }

  /** Walk a RIFF 'AVI ' chunk tree and visit every validated frame
    * chunk: `onFrame(codec, width, height, frameIdx, dataOff, size)` in
    * stream order, codec = 0 (BI_RGB DIB), [[MJPG]] or [[I420]]. Returns
    * Some((width, height, nFrames, codec)) iff the container is a
    * well-formed AVI in one of those codecs with at least one frame —
    * shared by [[decodeAvi]] (whole-stream pixel checksum) and
    * [[extractVideoFrames]] (sampled raster gather). */
  private def parseAvi(bytes: Array[Byte])(
      onFrame: (Int, Int, Int, Int, Int, Int) => Unit): Option[(Int, Int, Int, Int)] = {
    val buf = java.nio.ByteBuffer.wrap(bytes)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    def fourcc(off: Int): String =
      if (off + 4 <= bytes.length)
        new String(bytes, off, 4, "US-ASCII") else ""
    if (bytes.length < 12 || fourcc(0) != "RIFF" || fourcc(8) != "AVI ")
      return None
    var width = 0; var height = 0; var valid = true
    var codec = 0
    var frames = 0
    // parse strf's BITMAPINFOHEADER: geometry + the codec contract every
    // frame chunk is validated against (BI_RGB 24-bit, or MJPG whose
    // bitCount field is advisory)
    def readStrf(off: Int, size: Int): Unit =
      if (size >= 40 && off + 40 <= bytes.length) {
        val w = buf.getInt(off + 4); val h = buf.getInt(off + 8)
        val bitCount = buf.getShort(off + 14).toInt
        val compression = buf.getInt(off + 16)
        if (w > 0 && h > 0 &&
            ((bitCount == 24 && compression == 0) || compression == MJPG ||
             compression == I420)) {
          width = w; height = h; codec = compression
        } else valid = false
      } else valid = false
    def readFrame(off: Int, size: Int): Unit = {
      // long arithmetic: a crafted strf geometry (biWidth ~2^30) wraps
      // 32-bit stride*height to a value that can match a tiny chunk
      // size, and the decode then indexes far past the buffer — the
      // size check must agree with the TRUE product, so no adversarial
      // geometry reaches the pixel loops (both callers are covered
      // here, not per-caller). MJPG chunk sizes vary per frame: the
      // walker checks bounds + the JPEG SOI marker; full validation is
      // the decoder's (ImageIO rejects truncated payloads).
      val stride = (3L * width + 3) / 4 * 4
      val sizeOk =
        if (codec == MJPG)
          size >= 2 && bytes(off) == 0xff.toByte && bytes(off + 1) == 0xd8.toByte
        else if (codec == I420)
          // fixed planar size: w·h luma + two ⌈w/2⌉×⌈h/2⌉ chroma planes
          size.toLong == width.toLong * height +
            2L * ((width + 1) / 2) * ((height + 1) / 2)
        else size.toLong == stride * height
      if (width == 0 || !sizeOk || off + size > bytes.length) {
        valid = false; return
      }
      onFrame(codec, width, height, frames, off, size)
      frames += 1
    }
    // walk a chunk run [off, end): plain chunks and LIST recursion.
    // All size comparisons are in subtracted form (size > end - off - 8)
    // so a corrupt/adversarial 2^31-scale size field cannot overflow the
    // int arithmetic past the guard and drive the cursor negative
    def walk(off0: Int, end: Int, inMovi: Boolean): Unit = {
      var off = off0
      while (valid && off + 8 <= end) {
        val id = fourcc(off)
        val size = buf.getInt(off + 4)
        if (size < 0 || size > end - off - 8) { valid = false; return }
        if (id == "LIST" && size >= 4) {
          val listType = fourcc(off + 8)
          // frames may be grouped in 'rec ' LISTs inside 'movi'
          // (standard interleaved layout) — stay in movi mode there
          walk(off + 12, off + 8 + size,
            inMovi = listType == "movi" || (inMovi && listType == "rec "))
        } else if (id == "strf") readStrf(off + 8, size)
        else if (inMovi && (id == "00db" || id == "00dc"))
          readFrame(off + 8, size)
        off += 8 + size + (size & 1) // chunks are word-aligned
      }
    }
    val riffSize = buf.getInt(4)
    val riffEnd =
      if (riffSize < 0) bytes.length
      else math.min(bytes.length.toLong, 8L + riffSize).toInt
    walk(12, riffEnd, inMovi = false)
    if (valid && width > 0 && frames > 0)
      Some((width, height, frames, codec))
    else None
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
    * (WAV/AIFF/AU), video mimes through the pure-JDK [[decodeAvi]]
    * RIFF parser (uncompressed BI_RGB AVI; the checksum column is the
    * decoded-pixel fingerprint). Anything the codecs reject —
    * non-media bytes under a media mime, compressed video codecs, or
    * malformed payloads where JDK readers can throw unchecked
    * exceptions, hence NonFatal — falls back to [[decodeStub]]. */
  private[graft] def decode(r: MediaRecord): MediaFeatures = {
    if (r.mime.startsWith("video/")) {
      // NonFatal: the parser bounds-checks internally, but a malformed
      // payload must land on the stub, never kill the task — the same
      // containment contract as the image/audio branches
      val avi = try decodeAvi(r.media)
                catch { case scala.util.control.NonFatal(_) => None }
      avi match {
        case Some((w, h, frames, pixelChecksum)) =>
          return MediaFeatures(r.media_id, r.mime, r.media.length.toLong,
            w, h, frames, 0, 3, pixelChecksum)
        case None => ()
      }
    } else if (r.mime.startsWith("image/")) {
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

  /** REAL image resize — the normalization step of an image-training
    * pipeline (every input scaled to one model resolution before
    * feature extraction / embedding). Decodes through ImageIO (any
    * JDK-readable format), maps destination pixel (x, y) to source
    * pixel (x·srcW/dstW, y·srcH/dstH) — deliberately NEAREST-NEIGHBOR
    * with pure integer arithmetic, not Graphics2D filtering: filtered
    * interpolation is implementation-defined across JVM versions, and
    * a training pipeline needs byte-stable outputs for cache keys and
    * dedup. Re-encodes through the PNG codec (lossless, so the pixel
    * checksum survives a decode round-trip — spec-asserted).
    *
    * One row per DECODED image: (media_id, src_w, src_h, width, height,
    * resized_png, checksum); checksum is FNV-64 over the resized RGB
    * raster (row-major, 3 bytes/pixel). Non-image mimes and
    * undecodable payloads are dropped — this is the post-quarantine
    * transform stage; [[extractFeatures]]' stub path is where they get
    * flagged. `mapPartitions` amortizes codec setup per partition (the
    * [[extractFeatures]] contract); each row's work is O(dstW·dstH),
    * embarrassingly parallel, zero shuffle. */
  def resizeImages(media: Dataset[MediaRecord], dstW: Int, dstH: Int)(
      implicit spark: SparkSession): DataFrame = {
    require(dstW >= 1 && dstH >= 1, "target dims must be positive")
    import spark.implicits._
    media.mapPartitions { iter =>
      ImageIO.setUseCache(false)
      iter.flatMap { r =>
        if (!r.mime.startsWith("image/")) None
        else {
          val img = try ImageIO.read(new ByteArrayInputStream(r.media))
                    catch { case scala.util.control.NonFatal(_) => null }
          if (img == null) None
          else {
            val out = new BufferedImage(dstW, dstH, BufferedImage.TYPE_INT_RGB)
            val raster = new Array[Byte](dstW * dstH * 3)
            var y = 0
            while (y < dstH) {
              val sy = y * img.getHeight / dstH
              var x = 0
              while (x < dstW) {
                val sx = x * img.getWidth / dstW
                val rgb = img.getRGB(sx, sy) & 0xffffff
                out.setRGB(x, y, rgb)
                val base = (y * dstW + x) * 3
                raster(base) = ((rgb >> 16) & 0xff).toByte
                raster(base + 1) = ((rgb >> 8) & 0xff).toByte
                raster(base + 2) = (rgb & 0xff).toByte
                x += 1
              }
              y += 1
            }
            val bos = new ByteArrayOutputStream()
            ImageIO.write(out, "png", bos)
            Some((r.media_id, img.getWidth, img.getHeight, dstW, dstH,
              bos.toByteArray, fnv64(raster)))
          }
        }
      }
    }.toDF("media_id", "src_w", "src_h", "width", "height",
      "resized_png", "checksum")
  }

  /** REAL audio resample — the rate-normalization step of an
    * audio-training pipeline ([[resizeImages]]'s contract on the second
    * modality: every clip brought to one model rate before feature
    * extraction). Decodes through `AudioSystem`, resamples 16-bit mono
    * PCM by the same pure-integer nearest-neighbor mapping as the image
    * path — output frame i reads source frame i·srcRate/dstRate, and
    * the output length is ⌊srcFrames·dstRate/srcRate⌋ (so the mapped
    * index provably stays in range) — then re-encodes through the WAVE
    * codec (PCM is lossless, so the sample checksum survives a decode
    * round-trip — spec-asserted). Integer NN, not windowed-sinc, for
    * the same reason as the image path: byte-stable outputs for cache
    * keys and dedup, no float or codec-library variance.
    *
    * One row per DECODED clip: (media_id, src_rate, src_frames, rate,
    * n_frames, resampled_wav, checksum); checksum is FNV-64 over the
    * resampled little-endian PCM bytes. Non-audio mimes, undecodable
    * payloads, and formats outside the 16-bit signed mono PCM contract
    * are dropped — post-quarantine semantics, like [[resizeImages]].
    * `mapPartitions` amortizes codec setup; per-row work is
    * O(dstFrames), embarrassingly parallel, zero shuffle. */
  def resampleAudio(media: Dataset[MediaRecord], dstRate: Int)(
      implicit spark: SparkSession): DataFrame = {
    require(dstRate >= 1, "target rate must be positive")
    import spark.implicits._
    media.mapPartitions { iter =>
      iter.flatMap { r =>
        if (!r.mime.startsWith("audio/")) None
        else {
          try {
            val ais = AudioSystem.getAudioInputStream(
              new ByteArrayInputStream(r.media))
            try {
              val f = ais.getFormat
              val srcFrames = ais.getFrameLength.toInt
              val srcRate = f.getSampleRate.toInt
              if (f.getEncoding != AudioFormat.Encoding.PCM_SIGNED ||
                  f.getSampleSizeInBits != 16 || f.getChannels != 1 ||
                  f.isBigEndian || srcFrames < 1 || srcRate < 1) None
              else {
                val pcm = ais.readAllBytes()
                val dstFrames =
                  (srcFrames.toLong * dstRate / srcRate).toInt
                if (dstFrames < 1) None
                else {
                  val out = new Array[Byte](dstFrames * 2)
                  var i = 0
                  while (i < dstFrames) {
                    val s = (i.toLong * srcRate / dstRate).toInt
                    out(2 * i) = pcm(2 * s)
                    out(2 * i + 1) = pcm(2 * s + 1)
                    i += 1
                  }
                  val fmt = new AudioFormat(dstRate.toFloat, 16, 1, true, false)
                  val res = new AudioInputStream(
                    new ByteArrayInputStream(out), fmt, dstFrames.toLong)
                  val bos = new ByteArrayOutputStream()
                  try AudioSystem.write(res, AudioFileFormat.Type.WAVE, bos)
                  finally res.close()
                  Some((r.media_id, srcRate, srcFrames, dstRate, dstFrames,
                    bos.toByteArray, fnv64(out)))
                }
              }
            } finally ais.close()
          } catch { case scala.util.control.NonFatal(_) => None }
        }
      }
    }.toDF("media_id", "src_rate", "src_frames", "rate", "n_frames",
      "resampled_wav", "checksum")
  }

  /** [[synthesizeWav]] with every sample gain-scaled by 1/div
    * (integer division, truncation toward zero — exactly what a
    * fixed-point re-mastering does) — the planted NEAR-duplicate for
    * audio fingerprinting: bytes and exact hashes differ, the energy
    * ENVELOPE ordering survives. */
  def synthesizeWavGain(frames: Int, sampleRate: Int, seed: Long,
                        div: Int): Array[Byte] = {
    val pcm = new Array[Byte](frames * 2)
    var i = 0
    while (i < frames) {
      val s0 = ((seed * 1000003L + i.toLong * 0x9e3779b97f4a7c15L) >>> 24).toShort
      val s = (s0 / div).toShort
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

  /** Gain-scaled copies of the per-document clips under offset ids —
    * the near-dup planting helper for q166 (div = 1 plants EXACT
    * sample copies under new ids). */
  def gainScaledAudioFromDocuments(docs: DataFrame, idOffset: Long,
      div: Int)(implicit spark: SparkSession): Dataset[MediaRecord] = {
    import spark.implicits._
    docs.select(col("doc_id")).as[Long].mapPartitions { ids =>
      ids.map { id =>
        val (frames, rate) = wavSpec(id)
        MediaRecord(id + idOffset, "audio/wav",
          synthesizeWavGain(frames, rate, id, div))
      }
    }
  }

  /** PERCEPTUAL AUDIO FINGERPRINT — the third modality's near-dup
    * signature ([[perceptualHashes]]' contract on audio): the clip's
    * absolute-amplitude ENERGY ENVELOPE over 65 equal floor-NN
    * windows, packed as 64 difference bits (bit i set iff
    * energy(i) > energy(i+1) — the dHash rule applied in time). A
    * uniform GAIN change rescales every window's energy by the same
    * factor, so the ordering — and the fingerprint — survives the
    * re-mastered-copy case that byte-exact hashing misses
    * (spec-asserted: integer gain-halving flips zero bits on the
    * fixture). All-integer arithmetic (Σ|s| per window, windows by
    * floor(w·frames/65)) — bit-reproducible and SQL-replayable, q166
    * recomputes it sample by sample from the synthesis formula.
    *
    * One row per decoded clip: (media_id, n_frames, sample_rate, fp);
    * the decode contract (16-bit signed mono little-endian PCM,
    * post-quarantine drop semantics) is [[resampleAudio]]'s. Clips
    * shorter than 65 frames drop (a window would be empty). Zero
    * shuffle; O(frames) per row. Downstream:
    * [[Dedup.hammingDupPairs]] on `fp`. */
  def audioFingerprints(media: Dataset[MediaRecord])(
      implicit spark: SparkSession): DataFrame = {
    import spark.implicits._
    media.mapPartitions { iter =>
      iter.flatMap { r =>
        if (!r.mime.startsWith("audio/")) None
        else {
          try {
            val ais = AudioSystem.getAudioInputStream(
              new ByteArrayInputStream(r.media))
            try {
              val f = ais.getFormat
              val frames = ais.getFrameLength.toInt
              if (f.getEncoding != AudioFormat.Encoding.PCM_SIGNED ||
                  f.getSampleSizeInBits != 16 || f.getChannels != 1 ||
                  f.isBigEndian || frames < 65) None
              else {
                val pcm = ais.readAllBytes()
                val energy = new Array[Long](65)
                var w = 0
                while (w < 65) {
                  val lo = w * frames / 65
                  val hi = (w + 1) * frames / 65
                  var e = 0L
                  var i = lo
                  while (i < hi) {
                    val s = ((pcm(2 * i) & 0xff) |
                      (pcm(2 * i + 1) << 8)).toShort
                    e += math.abs(s.toLong)
                    i += 1
                  }
                  energy(w) = e
                  w += 1
                }
                var fp = 0L
                var i = 0
                while (i < 64) {
                  if (energy(i) > energy(i + 1)) fp |= (1L << i)
                  i += 1
                }
                Some((r.media_id, frames.toLong,
                  f.getSampleRate.toInt.toLong, fp))
              }
            } finally ais.close()
          } catch { case scala.util.control.NonFatal(_) => None }
        }
      }
    }.toDF("media_id", "n_frames", "sample_rate", "fp")
  }

  /** REAL video frame sampling — the frame-extraction stage of a
    * video-training pipeline: every `stride`-th frame of each clip is
    * DECODED to its RGB raster (vision models train on sampled frames,
    * not full streams). Where [[sampleFrames]] fans out frame INDICES
    * from decoded metadata, this emits the frame BYTES: the RIFF walk
    * ([[parseAvi]]) yields each validated BI_RGB chunk and the sampled
    * ones are materialized through [[frameRgb]] — so a stub that never
    * touched the pixel data cannot produce the raster or its checksum
    * (spec-asserted against independently recomputed pixels).
    *
    * One row per sampled frame of each DECODED clip: (media_id, width,
    * height, n_frames, frame_idx, frame_rgb, checksum); frame_rgb is
    * the top-down row-major RGB raster, checksum its FNV-64. Non-video
    * mimes and undecodable containers are dropped — post-quarantine
    * semantics like [[resizeImages]]/[[resampleAudio]]. The fan-out is
    * NARROW (rows multiply inside the partition, no exchange), per-row
    * work is O(sampled pixels), and the raster column keeps downstream
    * stages (resize, patching, embedding) shuffle-free on the frame
    * grain. */
  def extractVideoFrames(media: Dataset[MediaRecord], stride: Int)(
      implicit spark: SparkSession): DataFrame = {
    require(stride >= 1, "stride must be positive")
    import spark.implicits._
    media.mapPartitions { iter =>
      iter.flatMap { r =>
        if (!r.mime.startsWith("video/")) Iterator.empty
        else {
          val sampled = scala.collection.mutable.ArrayBuffer.empty[(Int, Array[Byte])]
          var ok = true
          parseAvi(r.media) { (codec, w, h, idx, off, size) =>
            if (ok && idx % stride == 0) {
              if (codec == 0) sampled += ((idx, frameRgb(r.media, off, w, h)))
              else if (codec == I420)
                sampled += ((idx, frameRgbI420(r.media, off, w, h)))
              else {
                // MJPG: decode the sampled frame's JFIF payload to a
                // top-down RGB raster through the JDK JPEG codec
                val img = try ImageIO.read(
                    new ByteArrayInputStream(r.media, off, size))
                  catch { case scala.util.control.NonFatal(_) => null }
                if (img == null || img.getWidth != w || img.getHeight != h)
                  ok = false
                else {
                  val out = new Array[Byte](3 * w * h)
                  var y = 0; var i = 0
                  while (y < h) {
                    var x = 0
                    while (x < w) {
                      val rgb = img.getRGB(x, y)
                      out(i) = ((rgb >> 16) & 0xff).toByte
                      out(i + 1) = ((rgb >> 8) & 0xff).toByte
                      out(i + 2) = (rgb & 0xff).toByte
                      i += 3; x += 1
                    }
                    y += 1
                  }
                  sampled += ((idx, out))
                }
              }
            }
          } match {
            case Some((w, h, n, _)) if ok =>
              sampled.iterator.map { case (idx, rgb) =>
                (r.media_id, w, h, n, idx, rgb, fnv64(rgb))
              }
            case _ => Iterator.empty
          }
        }
      }
    }.toDF("media_id", "width", "height", "n_frames", "frame_idx",
      "frame_rgb", "checksum")
  }

  /** Brightness-shifted copies of the per-document videos under offset
    * ids — the near-dup planting helper for q168 (delta = 0 plants
    * EXACT copies under new ids). */
  def brightenedVideosFromDocuments(docs: DataFrame, idOffset: Long,
      delta: Int)(implicit spark: SparkSession): Dataset[MediaRecord] = {
    import spark.implicits._
    docs.select(col("doc_id")).as[Long].mapPartitions { ids =>
      ids.map { id =>
        val (w, h, frames) = aviSpec(id)
        MediaRecord(id + idOffset, "video/avi",
          synthesizeAviBright(w, h, frames, id, delta))
      }
    }
  }

  /** dHash of one top-down RGB raster — [[perceptualHashes]]' dHash
    * rule factored over raw bytes so video frames hash identically to
    * still images with the same pixels. */
  private[graft] def dhashOfRaster(rgb: Array[Byte], w: Int, h: Int): Long = {
    def gray(sx: Int, sy: Int): Int = {
      val base = (sy * w + sx) * 3
      (77 * (rgb(base) & 0xff) + 150 * (rgb(base + 1) & 0xff) +
        29 * (rgb(base + 2) & 0xff)) >> 8
    }
    var dhash = 0L
    var gy = 0
    while (gy < 8) {
      val sy = gy * h / 8
      var gx = 0
      while (gx < 8) {
        if (gray(gx * w / 9, sy) > gray((gx + 1) * w / 9, sy))
          dhash |= (1L << (gy * 8 + gx))
        gx += 1
      }
      gy += 1
    }
    dhash
  }

  /** PERCEPTUAL VIDEO FINGERPRINTS — frame-level dHash over
    * [[extractVideoFrames]] output (one 64-bit signature per SAMPLED
    * frame; decode and stride policy are that operator's, so all three
    * codec families — BI_RGB, I420, MJPEG — feed the same hash). A
    * video-level near-dup screen joins on (frame rank) and runs
    * [[Dedup.hammingDupPairs]] per frame slot, or hashes the frame
    * signature SEQUENCE for exact sequence identity; brightness
    * re-grades are dHash-invariant frame by frame (q164's property on
    * the time axis — q168 puts the whole chain under the pixel-formula
    * oracle). Narrow map over already-decoded rasters — zero
    * additional decode or shuffle. */
  def videoFrameHashes(frames: DataFrame)(
      implicit spark: SparkSession): DataFrame = {
    import spark.implicits._
    frames
      .select(col("media_id"), col("width"), col("height"),
        col("n_frames"), col("frame_idx"), col("frame_rgb"))
      .as[(Long, Int, Int, Int, Int, Array[Byte])]
      .map { case (id, w, h, n, idx, rgb) =>
        (id, w.toLong, h.toLong, n.toLong, idx.toLong,
          dhashOfRaster(rgb, w, h))
      }
      .toDF("media_id", "width", "height", "n_frames", "frame_idx", "dhash")
  }
}
