package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.operators.Multimodal
import graft.sources.Tables

/** The codec DOMAIN BOUNDARY as a permanent, executable contract
  * (round-16 closure of the decodeStub residual): every media family
  * the queries declare (PNG via ImageIO, WAV via AudioSystem,
  * uncompressed BI_RGB AVI via the pure-JDK RIFF parser) decodes REAL
  * — the fingerprint stub is never hit by a declared fixture — while
  * payloads OUTSIDE the boundary (malformed bytes, non-JDK compressed
  * codecs like mp4) land on the stub deterministically instead of
  * killing the task. A codec added later that silently regresses to
  * the stub (e.g. an ImageIO SPI disappearing from the runtime) fails
  * here, not in a production scan.
  */
class CodecBoundarySpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  test("declared PNG/WAV/AVI fixtures decode REAL — stub never hit") {
    implicit val ss = spark
    val docs = Tables(spark, TestSpark.sf0001, "documents").limit(96)
    // images: decoded dims must equal the synthesis ground truth —
    // the stub derives dims from the byte fingerprint (multiples of 16
    // on a 16..1024 grid) and cannot reproduce pngDims' 8..23 range
    // for every record
    Multimodal.imagesFromDocuments(docs).collect().foreach { r =>
      val f = Multimodal.decode(r)
      val (w, h) = Multimodal.pngDims(r.media_id)
      assert((f.width, f.height, f.n_frames) == ((w, h, 1)),
        s"image ${r.media_id} decoded (${f.width},${f.height}) != synthesis ($w,$h): stub path hit")
    }
    // audio: decoded frame count / sample rate / mono channel must
    // equal wavSpec — the stub has no frame count (1) and fabricates
    // the rate from the checksum
    Multimodal.audioFromDocuments(docs).collect().foreach { r =>
      val f = Multimodal.decode(r)
      val (frames, sr) = Multimodal.wavSpec(r.media_id)
      assert((f.n_frames, f.sample_rate, f.channels) == ((frames, sr, 1)),
        s"audio ${r.media_id} decoded (${f.n_frames},${f.sample_rate}) != synthesis ($frames,$sr): stub path hit")
    }
    // video: decoded dims / frame count must equal aviSpec
    Multimodal.videosFromDocuments(docs).collect().foreach { r =>
      val f = Multimodal.decode(r)
      val (w, h, frames) = Multimodal.aviSpec(r.media_id)
      assert((f.width, f.height, f.n_frames) == ((w, h, frames)),
        s"video ${r.media_id} decoded (${f.width},${f.height},${f.n_frames}) != synthesis ($w,$h,$frames): stub path hit")
    }
  }

  test("outside the boundary: malformed and non-JDK payloads land on the stub, contained") {
    // malformed bytes under a media mime: contained to the stub — the
    // deterministic fingerprint fallback, never an exception
    val badPng = Multimodal.MediaRecord(7L, "image/png",
      Array[Byte](1, 2, 3, 4, 5))
    assert(Multimodal.decode(badPng) == Multimodal.decodeStub(badPng))
    val badWav = Multimodal.MediaRecord(8L, "audio/wav",
      Array[Byte](82, 73, 70, 70, 0, 0))
    assert(Multimodal.decode(badWav) == Multimodal.decodeStub(badWav))
    // compressed video (mp4) has no JDK codec: by contract it routes
    // to the stub — the documented domain boundary, not a bug
    val mp4 = Multimodal.MediaRecord(9L, "video/mp4",
      "not an mp4 but honestly labeled".getBytes("UTF-8"))
    assert(Multimodal.decode(mp4) == Multimodal.decodeStub(mp4))
    // determinism: the stub is a pure function of (id, mime, bytes)
    assert(Multimodal.decodeStub(mp4) == Multimodal.decodeStub(mp4))
  }
}
