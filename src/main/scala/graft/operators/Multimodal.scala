package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal-column plumbing (training-pipeline extension): media as
  * opaque `binary` columns with typed metadata, decode / feature
  * extraction / frame sampling as partition-local transforms.
  *
  * The container has no image/audio codecs, so the decode kernel is a
  * clearly-marked deterministic STUB (`decodeStub`) — but everything
  * Spark-side is real and tested: the schema, the `Dataset[T]`
  * encoders, the `mapPartitions` batch shape (one decoder
  * instantiation per partition, the same contract a JNI/FFMPEG/PIL
  * decoder needs), and the partitioning story (binary payloads never
  * shuffle — features are extracted before any wide operation).
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

  /** STUB decoder — stands in for a real codec (PIL/ffmpeg/soundfile
    * are not in this container). Deterministic on the payload bytes so
    * tests are exact. A production deployment swaps only this
    * function; the Dataset plumbing around it is unchanged.
    */
  def decodeStub(r: MediaRecord): MediaFeatures = {
    val n = r.payload.length.toLong
    var h = 1125899906842597L // FNV-ish rolling checksum
    var i = 0
    while (i < r.payload.length) { h = 31 * h + r.payload(i); i += 1 }
    val w = (math.abs(h) % 1920 + 64).toInt
    MediaFeatures(r.media_id, r.kind, n, w, (w * 9 / 16).max(1),
      if (r.kind == "video") (n / 1024).toInt.max(1) else 1, h)
  }

  /** Decode/feature-extract: partition-local, one decoder per
    * partition (`mapPartitions`), no shuffle of payloads.
    */
  def extractFeatures(media: Dataset[MediaRecord]): Dataset[MediaFeatures] = {
    import media.sparkSession.implicits._
    media.mapPartitions { it =>
      // real decoders initialize per-partition state here (codecs etc.)
      it.map(decodeStub)
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

  /** Build a media table from the documents fixture (payload =
    * UTF-8 bytes of the text — a stand-in corpus for exercising the
    * plumbing end-to-end on real files).
    */
  def mediaFromDocuments(spark: SparkSession, docs: DataFrame): Dataset[MediaRecord] = {
    import spark.implicits._
    docs.select(
      col("doc_id").as("media_id"),
      element_at(array(lit("image"), lit("audio"), lit("video")),
        (pmod(col("doc_id"), lit(3)) + 1).cast("int")).as("kind"),
      encode(col("text"), "UTF-8").as("payload"),
      lit("stub/v1").as("meta_format"))
      .as[MediaRecord]
  }

  /** End-to-end features query over the documents-derived media table
    * (rows-only correctness check; the decode is a stub, but byte
    * counts and deterministic checksums are real).
    */
  def featuresQuery(spark: SparkSession, docs: DataFrame): DataFrame = {
    val feats = extractFeatures(mediaFromDocuments(spark, docs))
    feats.toDF()
      .groupBy("kind")
      .agg(count(lit(1)).as("n"),
        sum("n_bytes").as("total_bytes"),
        min("checksum").as("min_checksum"))
      .orderBy("kind")
  }
}
