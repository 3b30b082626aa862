package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.operators.Multimodal
import graft.operators.Multimodal.MediaRecord

/** Multimodal column pipeline: REAL decodes for all three kinds
  * through the JDK (PNG via ImageIO, WAV via javax.sound, multi-frame
  * animated GIF via ImageIO's sequence reader) and the end-to-end
  * Dataset plumbing.
  */
class MultimodalSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("pngPayload round-trips through ImageIO with the generated dims") {
    for (id <- Seq(0L, 3L, 47L, 123L)) {
      val (w, h) = Multimodal.imageDims(id)
      val feats = Multimodal.decodeImage(
        MediaRecord(id, "image", Multimodal.pngPayload(id), "png"))
      assert(feats.isDefined)
      assert(feats.get.width == w && feats.get.height == h,
        s"id=$id expected ${w}x$h got ${feats.get.width}x${feats.get.height}")
      assert(feats.get.n_frames == 1)
    }
  }

  test("decodeImage rejects non-image kinds and garbage bytes") {
    assert(Multimodal.decodeImage(
      MediaRecord(1L, "audio", Array[Byte](1, 2, 3), "stub/v1")).isEmpty)
    assert(Multimodal.decodeImage(
      MediaRecord(1L, "image", Array[Byte](1, 2, 3), "png")).isEmpty)
    // TRUNCATED valid PNG: a recognized header with a cut-off body
    // makes ImageIO throw mid-decode (unlike garbage, which returns
    // null) — a per-record corruption must yield None, never a task
    // failure
    val truncated = Multimodal.pngPayload(7L).take(40)
    assert(Multimodal.decodeImage(
      MediaRecord(7L, "image", truncated, "png")).isEmpty)
  }

  test("wavPayload round-trips through javax.sound with the generated shape") {
    for (id <- Seq(1L, 4L, 1601L)) {
      val (rate, frames) = Multimodal.audioShape(id)
      val feats = Multimodal.decodeAudio(
        MediaRecord(id, "audio", Multimodal.wavPayload(id), "wav"))
      assert(feats.isDefined)
      assert(feats.get.n_frames == frames, s"id=$id frames")
      assert(feats.get.width == rate)     // sample rate
      assert(feats.get.height == 1)       // mono
    }
    assert(Multimodal.decodeAudio(
      MediaRecord(1L, "audio", Array[Byte](1, 2, 3), "wav")).isEmpty)
  }

  test("gifPayload round-trips frame count and dims through ImageIO") {
    for (id <- Seq(2L, 5L, 38L, 101L)) {
      val (w, h, frames) = Multimodal.videoShape(id)
      val feats = Multimodal.decodeVideo(
        MediaRecord(id, "video", Multimodal.gifPayload(id), "gif"))
      assert(feats.isDefined)
      assert(feats.get.width == w && feats.get.height == h, s"id=$id dims")
      assert(feats.get.n_frames == frames, s"id=$id frames")
    }
  }

  test("decodeVideo rejects non-video kinds, garbage and truncation") {
    assert(Multimodal.decodeVideo(
      MediaRecord(1L, "image", Multimodal.gifPayload(1L), "gif")).isEmpty)
    assert(Multimodal.decodeVideo(
      MediaRecord(1L, "video", Array[Byte](1, 2, 3), "gif")).isEmpty)
    // truncated GIF: recognized header, cut-off body — per-record
    // corruption must yield None (fallback), never a task failure
    val truncated = Multimodal.gifPayload(8L).take(30)
    val f = Multimodal.decode(MediaRecord(8L, "video", truncated, "gif"))
    assert(f.n_bytes == 30L) // fell back to byte-level features
  }

  test("extractFeatures: dims/frames are decoded containers, not stub values") {
    val docs = Seq(
      (0L, "doc zero"), (1L, "doc one"), (2L, "doc two"),
      (3L, "doc three"), (6L, "doc six")
    ).toDF("doc_id", "text")
    val feats = Multimodal
      .extractFeatures(Multimodal.mediaFromDocuments(spark, docs))
      .collect().map(f => f.media_id -> f).toMap
    // ids 0, 3, 6 are images (id % 3 == 0) with known generated dims
    for (id <- Seq(0L, 3L, 6L)) {
      val (w, h) = Multimodal.imageDims(id)
      assert(feats(id).kind == "image")
      assert(feats(id).width == w && feats(id).height == h)
    }
    // id 1 is real WAV audio; id 2 is real animated-GIF video
    assert(feats(1L).kind == "audio")
    val (rate1, frames1) = Multimodal.audioShape(1L)
    assert(feats(1L).n_frames == frames1 && feats(1L).width == rate1)
    assert(feats(2L).kind == "video")
    val (w2, h2, frames2) = Multimodal.videoShape(2L)
    assert(feats(2L).width == w2 && feats(2L).height == h2)
    assert(feats(2L).n_frames == frames2)
  }

  test("featuresQuery groups all three kinds with real image dims") {
    val docs = (0L until 30L).map(i => (i, s"document number $i")).toDF("doc_id", "text")
    val rows = Multimodal.featuresQuery(spark, docs).collect()
    assert(rows.map(_.getString(0)).toSeq == Seq("audio", "image", "video"))
    val img = rows.find(_.getString(0) == "image").get
    // 10 images, max dims over ids 0,3,...,27: width 16+27=43, height 9+27=36
    assert(img.getLong(1) == 10L)
    assert(img.getInt(3) == 43 && img.getInt(4) == 36)
  }

  test("resizeImages: NN pixel law, target dims, non-image passthrough") {
    val src = MediaRecord(0L, "image", Multimodal.pngPayload(0L), "png")
    val wav = MediaRecord(1L, "audio", Multimodal.wavPayload(1L), "wav")
    val (w, h) = (24, 16)
    val out = Multimodal.resizeImages(Seq(src, wav).toDS(), w, h)
      .collect().map(r => r.media_id -> r).toMap
    // audio passes through byte-identical
    assert(out(1L).payload.sameElements(wav.payload))
    val orig = javax.imageio.ImageIO.read(
      new java.io.ByteArrayInputStream(src.payload))
    val res = javax.imageio.ImageIO.read(
      new java.io.ByteArrayInputStream(out(0L).payload))
    assert(res.getWidth == w && res.getHeight == h)
    // nearest-neighbour law: every target pixel IS the integer-
    // selected source pixel — checked exhaustively
    for (y <- 0 until h; x <- 0 until w) {
      val sx = (x.toLong * orig.getWidth / w).toInt
      val sy = (y.toLong * orig.getHeight / h).toInt
      assert((res.getRGB(x, y) & 0xffffff) ==
        (orig.getRGB(sx, sy) & 0xffffff), s"pixel ($x,$y)")
    }
    // determinism: a second run re-encodes byte-identically
    val again = Multimodal.resizeImages(Seq(src).toDS(), w, h)
      .collect().head.payload
    assert(again.sameElements(out(0L).payload))
    // failure contract: a truncated PNG (valid signature, cut-off
    // data — ImageIO THROWS on these) degrades to passthrough, never
    // kills the task
    val corrupt = MediaRecord(9L, "image",
      src.payload.take(src.payload.length / 2), "png")
    val kept = Multimodal.resizeImages(Seq(corrupt).toDS(), w, h)
      .collect().head
    assert(kept.payload.sameElements(corrupt.payload))
    // and the end-to-end query reports the target dims for images
    val docs = (0L until 12L).map(i => (i, s"doc $i")).toDF("doc_id", "text")
    val q = Multimodal.resizeQuery(spark, docs, w, h).collect()
      .find(_.getString(0) == "image").get
    assert(q.getInt(3) == w && q.getInt(4) == h)
  }

  test("sampleFrames explodes stride-sampled frame indices without payloads") {
    val feats = Seq(
      Multimodal.MediaFeatures(1L, "video", 4096L, 640, 360, 25, 7L)
    ).toDS()
    val frames = Multimodal.sampleFrames(feats, stride = 10).collect()
    assert(frames.map(_.getInt(2)).toSeq == Seq(0, 10, 20))
    assert(!frames.head.schema.fieldNames.contains("payload"))
  }
}
