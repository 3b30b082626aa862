package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal-column plumbing (training-pipeline extension): media as
  * opaque `binary` columns with typed metadata, decode / feature
  * extraction / frame sampling as partition-local transforms.
  *
  * All three media kinds decode for REAL with the JDK alone (no
  * external codecs in this container): images are PNG via
  * `javax.imageio`, audio is 16-bit PCM WAV via `javax.sound.sampled`,
  * and video is multi-frame animated GIF via ImageIO's sequence
  * reader — width/height/frame counts come from actually decoded
  * containers. A production deployment swaps the per-kind kernels for
  * ffmpeg/JNI codecs; the Spark-side contract is identical and tested:
  * the schema, the `Dataset[T]` encoders, the `mapPartitions` batch
  * shape (one decoder instantiation per partition, the same contract a
  * JNI/FFMPEG decoder needs), and the partitioning story (binary
  * payloads never shuffle — features are extracted before any wide
  * operation).
  */
object Multimodal {

  /** A media row: opaque payload + metadata. */
  final case class MediaRecord(
      media_id: Long,
      kind: String,          // image | audio | video
      payload: Array[Byte],
      meta_format: String)

  /** Extracted features; the decode output schema. */
  final case class MediaFeatures(
      media_id: Long,
      kind: String,
      n_bytes: Long,
      width: Int,
      height: Int,
      n_frames: Int,
      checksum: Long)

  private def rollingChecksum(bytes: Array[Byte]): Long = {
    var h = 1125899906842597L // FNV-ish rolling checksum
    var i = 0
    while (i < bytes.length) { h = 31 * h + bytes(i); i += 1 }
    h
  }

  /** Deterministic image dimensions for media_id (used by the
    * generator; the decoder must recover them from the pixels alone).
    */
  def imageDims(mediaId: Long): (Int, Int) =
    (16 + (mediaId % 48).toInt, 9 + (mediaId % 32).toInt)

  /** Encode a real PNG payload for media_id: a small RGB image with a
    * deterministic per-pixel gradient, written by the JDK's ImageIO.
    */
  def pngPayload(mediaId: Long): Array[Byte] = {
    val (w, h) = imageDims(mediaId)
    val img = new java.awt.image.BufferedImage(
      w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        img.setRGB(x, y,
          (((mediaId * 31 + x * 7 + y * 13) % 0x1000000L).toInt))
        x += 1
      }
      y += 1
    }
    val out = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", out)
    out.toByteArray
  }

  /** Real image decode via `javax.imageio` — width/height/frame count
    * from the actual decoded raster. Returns None for undecodable
    * bytes or non-image kinds.
    */
  def decodeImage(r: MediaRecord): Option[MediaFeatures] =
    if (r.kind != "image") None
    else try {
      // ImageIO returns null for unrecognized bytes but THROWS on
      // truncated/corrupt streams — a per-record failure must never
      // kill the task at corpus scale, so both become None
      Option(javax.imageio.ImageIO.read(
          new java.io.ByteArrayInputStream(r.payload)))
        .map { img =>
          MediaFeatures(r.media_id, r.kind, r.payload.length.toLong,
            img.getWidth, img.getHeight, 1, rollingChecksum(r.payload))
        }
    } catch { case _: Exception => None }

  /** Deterministic audio shape for media_id: (sample rate, frames). */
  def audioShape(mediaId: Long): (Int, Int) =
    (8000, 800 + (mediaId % 1600).toInt)

  /** Encode a real WAV payload for media_id: 16-bit mono PCM sine
    * whose frequency depends on the id, written by the JDK's
    * `javax.sound.sampled` (WAV needs no external codecs either).
    */
  def wavPayload(mediaId: Long): Array[Byte] = {
    import javax.sound.sampled.{AudioFileFormat, AudioFormat, AudioInputStream, AudioSystem}
    val (rate, frames) = audioShape(mediaId)
    val freq = 220.0 + (mediaId % 20) * 55.0
    val pcm = new Array[Byte](frames * 2)
    var i = 0
    while (i < frames) {
      val s = (math.sin(2 * math.Pi * freq * i / rate) * 12000).toInt
      pcm(2 * i) = (s & 0xFF).toByte
      pcm(2 * i + 1) = ((s >> 8) & 0xFF).toByte
      i += 1
    }
    val fmt = new AudioFormat(rate.toFloat, 16, 1, true, false)
    val stream = new AudioInputStream(
      new java.io.ByteArrayInputStream(pcm), fmt, frames.toLong)
    val out = new java.io.ByteArrayOutputStream()
    AudioSystem.write(stream, AudioFileFormat.Type.WAVE, out)
    out.toByteArray
  }

  /** Real audio decode via `javax.sound.sampled`: frame count, sample
    * rate and channels from the actual WAV header/stream (mapped onto
    * the features schema as n_frames/width/height). Returns None for
    * undecodable bytes or non-audio kinds.
    */
  def decodeAudio(r: MediaRecord): Option[MediaFeatures] =
    if (r.kind != "audio") None
    else try {
      val in = javax.sound.sampled.AudioSystem.getAudioInputStream(
        new java.io.ByteArrayInputStream(r.payload))
      try Some(MediaFeatures(r.media_id, r.kind, r.payload.length.toLong,
        in.getFormat.getSampleRate.toInt, in.getFormat.getChannels,
        in.getFrameLength.toInt, rollingChecksum(r.payload)))
      finally in.close()
    } catch { case _: Exception => None }

  /** Deterministic video shape for media_id: (width, height, frames). */
  def videoShape(mediaId: Long): (Int, Int, Int) =
    (32 + (mediaId % 32).toInt, 18 + (mediaId % 24).toInt,
      2 + (mediaId % 7).toInt)

  /** Encode a real multi-frame video payload for media_id as an
    * animated GIF — the one moving-picture container the JDK can both
    * write and read without external codecs (`ImageWriter`
    * sequence API). Each frame is a deterministic per-(id, frame)
    * gradient, so the decoder must recover the frame count from the
    * actual container structure.
    */
  def gifPayload(mediaId: Long): Array[Byte] = {
    val (w, h, frames) = videoShape(mediaId)
    val out = new java.io.ByteArrayOutputStream()
    val ios = javax.imageio.ImageIO.createImageOutputStream(out)
    val writer =
      javax.imageio.ImageIO.getImageWritersByFormatName("gif").next()
    try {
      writer.setOutput(ios)
      writer.prepareWriteSequence(null)
      var f = 0
      while (f < frames) {
        // gray frames written straight into the raster: the GIF
        // writer's per-pixel RGB→palette quantization dominated the
        // encode cost and the decoder only reads dims/frame count
        val img = new java.awt.image.BufferedImage(
          w, h, java.awt.image.BufferedImage.TYPE_BYTE_GRAY)
        val data = img.getRaster.getDataBuffer
          .asInstanceOf[java.awt.image.DataBufferByte].getData
        var i = 0
        while (i < data.length) {
          data(i) = ((mediaId * 37 + f * 101 + i * 7) % 251).toByte
          i += 1
        }
        writer.writeToSequence(
          new javax.imageio.IIOImage(img, null, null), null)
        f += 1
      }
      writer.endWriteSequence()
    } finally {
      writer.dispose(); ios.close()
    }
    out.toByteArray
  }

  /** Real video decode via the JDK's GIF `ImageReader`: frame count
    * from the container's image sequence (`getNumImages`), dimensions
    * from the first decoded frame. Returns None for undecodable bytes
    * or non-video kinds — same per-record failure isolation as the
    * image path.
    */
  def decodeVideo(r: MediaRecord): Option[MediaFeatures] =
    if (r.kind != "video") None
    else try {
      val iis = javax.imageio.ImageIO.createImageInputStream(
        new java.io.ByteArrayInputStream(r.payload))
      try {
        val readers = javax.imageio.ImageIO.getImageReaders(iis)
        if (!readers.hasNext) None
        else {
          val reader = readers.next()
          try {
            reader.setInput(iis)
            val n = reader.getNumImages(true)
            if (n <= 0) None
            else {
              val first = reader.read(0)
              Some(MediaFeatures(r.media_id, r.kind,
                r.payload.length.toLong, first.getWidth, first.getHeight,
                n, rollingChecksum(r.payload)))
            }
          } finally reader.dispose()
        }
      } finally iis.close()
    } catch { case _: Exception => None }

  /** Fallback features for payloads none of the real decoders accept
    * (corrupt/unknown containers) — deterministic on the bytes, so a
    * poisoned record degrades to byte-level features instead of
    * killing the task.
    */
  def decodeFallback(r: MediaRecord): MediaFeatures = {
    val n = r.payload.length.toLong
    val h = rollingChecksum(r.payload)
    val w = (math.abs(h) % 1920 + 64).toInt
    MediaFeatures(r.media_id, r.kind, n, w, (w * 9 / 16).max(1),
      if (r.kind == "video") (n / 1024).toInt.max(1) else 1, h)
  }

  /** Full decode kernel — every media kind decodes for real via the
    * JDK (ImageIO PNG, javax.sound WAV, ImageIO animated-GIF video);
    * the byte-level fallback only handles undecodable payloads.
    */
  def decode(r: MediaRecord): MediaFeatures =
    decodeImage(r).orElse(decodeAudio(r)).orElse(decodeVideo(r))
      .getOrElse(decodeFallback(r))

  /** Decode/feature-extract: partition-local, one decoder per
    * partition (`mapPartitions`), no shuffle of payloads.
    */
  def extractFeatures(media: Dataset[MediaRecord]): Dataset[MediaFeatures] = {
    import media.sparkSession.implicits._
    media.mapPartitions { it =>
      // real decoders initialize per-partition state here (codecs etc.)
      it.map(decode)
    }
  }

  /** Real image RESIZE (decode PNG → scale → re-encode PNG),
    * partition-local like [[extractFeatures]] — binary payloads never
    * cross a shuffle; non-image rows pass through untouched. The
    * scale kernel is a hand-rolled nearest-neighbour loop rather than
    * `AffineTransformOp`: integer source-pixel selection
    * (`sx = x·W/w`) is bit-deterministic across JVMs and platforms
    * (no anti-aliasing rounding), so a resized corpus is reproducible
    * — the determinism discipline every oracle-checked operator
    * follows, applied to a path DuckDB cannot mirror (rows-only +
    * spec: round-trip decode recovers the target dims and the exact
    * source pixels NN selects).
    */
  def resizeImages(media: Dataset[MediaRecord], w: Int,
      h: Int): Dataset[MediaRecord] = {
    import media.sparkSession.implicits._
    media.mapPartitions { it =>
      it.map { r =>
        if (r.kind != "image") r
        else try {
          // the family's failure contract ([[decodeImage]]): corrupt
          // payloads degrade (pass through unresized), never kill the
          // task — ImageIO THROWS on truncated streams, it only
          // returns null for unrecognized bytes
          val img = javax.imageio.ImageIO.read(
            new java.io.ByteArrayInputStream(r.payload))
          if (img == null) r
          else {
            val out = new java.awt.image.BufferedImage(w, h,
              java.awt.image.BufferedImage.TYPE_INT_RGB)
            var y = 0
            while (y < h) {
              var x = 0
              while (x < w) {
                out.setRGB(x, y, img.getRGB(
                  (x.toLong * img.getWidth / w).toInt,
                  (y.toLong * img.getHeight / h).toInt))
                x += 1
              }
              y += 1
            }
            val bos = new java.io.ByteArrayOutputStream()
            javax.imageio.ImageIO.write(out, "png", bos)
            r.copy(payload = bos.toByteArray)
          }
        } catch { case _: Exception => r }
      }
    }
  }

  /** Frame sampling for video payloads: every `stride`-th frame index
    * up to the decoded frame count — the Spark-side shape of
    * keyframe extraction (explode AFTER dropping the payload, so the
    * wide operation never carries binary blobs).
    */
  def sampleFrames(features: Dataset[MediaFeatures], stride: Int = 10): DataFrame =
    features.toDF()
      .select(col("media_id"), col("n_frames"),
        explode(sequence(lit(0), col("n_frames") - 1, lit(stride)))
          .as("frame_idx"))

  /** Build a media table from the documents fixture: image rows carry
    * REAL PNG payloads, audio rows REAL WAV payloads, and video rows
    * REAL animated-GIF payloads (all generated partition-locally and
    * decoded back by the JDK).
    */
  def mediaFromDocuments(spark: SparkSession, docs: DataFrame): Dataset[MediaRecord] = {
    import spark.implicits._
    docs.select(col("doc_id"), col("text")).as[(Long, String)].map {
      case (id, _) =>
        (id % 3) match {
          case 0 => MediaRecord(id, "image", pngPayload(id), "png")
          case 1 => MediaRecord(id, "audio", wavPayload(id), "wav")
          case _ => MediaRecord(id, "video", gifPayload(id), "gif")
        }
    }
  }

  /** End-to-end RESIZE query: documents-derived media → image resize
    * → feature re-extraction (REAL decodes of the re-encoded
    * payloads) → per-kind aggregate. Rows-only by design (DuckDB has
    * no codec); the spec proves the pixel-level laws.
    */
  def resizeQuery(spark: SparkSession, docs: DataFrame, w: Int = 24,
      h: Int = 16): DataFrame = {
    val feats = extractFeatures(
      resizeImages(mediaFromDocuments(spark, docs), w, h))
    feats.toDF()
      .groupBy("kind")
      .agg(count(lit(1)).as("n"),
        sum("n_bytes").as("total_bytes"),
        max("width").as("max_width"),
        max("height").as("max_height"),
        min("checksum").as("min_checksum"))
      .orderBy("kind")
  }

  /** End-to-end features query over the documents-derived media table
    * (rows-only correctness check; every kind's dimensions/frame
    * counts come from real JDK decodes; byte counts and checksums are
    * real everywhere).
    */
  def featuresQuery(spark: SparkSession, docs: DataFrame): DataFrame = {
    val feats = extractFeatures(mediaFromDocuments(spark, docs))
    feats.toDF()
      .groupBy("kind")
      .agg(count(lit(1)).as("n"),
        sum("n_bytes").as("total_bytes"),
        max("width").as("max_width"),
        max("height").as("max_height"),
        min("checksum").as("min_checksum"))
      .orderBy("kind")
  }
}
