package graft.multimodal

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal column plumbing: image/audio/video as opaque binary columns
  * with typed metadata, and decode/feature-extract as distributed
  * per-partition transforms.
  *
  * The decode step is a STUB (this container has no image/audio codecs):
  * `StubCodec` produces deterministic fake features from the bytes. The
  * Spark-side contract — schema, binary column handling, partition-wise
  * batching, feature shape — is real and tested; swapping `StubCodec` for
  * a JNI/FFI decoder changes nothing upstream.
  */
object Multimodal {

  /** A media asset: opaque payload + typed metadata. */
  case class MediaRecord(
      media_id: Long,
      modality: String, // "image" | "audio" | "video" | "text"
      content: Array[Byte],
      width: Int, // image/video pixels; 0 when n/a
      height: Int,
      duration_ms: Long) // audio/video; 0 when n/a

  /** Extracted features for one asset. */
  case class MediaFeatures(
      media_id: Long,
      modality: String,
      n_bytes: Long,
      checksum: Long,
      features: Array[Float])

  /** STUB decoder: stands in for image decode / audio resample / video
    * frame-sampling. Deterministic in the payload bytes so tests and
    * verify runs are stable. Real implementation would decode via a codec
    * library; marked clearly per the build contract. */
  object StubCodec {
    val FeatureDim = 8
    def decode(content: Array[Byte]): Array[Float] = {
      val out = new Array[Float](FeatureDim)
      var i = 0
      while (i < content.length) {
        out(i % FeatureDim) += (content(i) & 0xFF) / 255.0f
        i += 1
      }
      out
    }
    def checksum(content: Array[Byte]): Long = {
      var h = 1125899906842597L
      var i = 0
      while (i < content.length) { h = 31 * h + (content(i) & 0xFF); i += 1 }
      h
    }
  }

  /** Build a media table from the harness documents table, treating the
    * text payload as opaque bytes (the container has no real media files).
    * Modality is assigned round-robin from the source column so the
    * pipeline exercises mixed-modality batches. */
  def mediaFromDocuments(docs: DataFrame): DataFrame =
    docs.select(
      col("doc_id").as("media_id"),
      element_at(
        array(lit("image"), lit("audio"), lit("video"), lit("text")),
        (pmod(xxhash64(col("source")), lit(4)) + lit(1)).cast("int")).as("modality"),
      col("text").cast("binary").as("content"),
      lit(64).as("width"),
      lit(64).as("height"),
      lit(1000L).as("duration_ms"))

  /** One sampled frame from a video asset (1→N decode). */
  case class FrameSample(
      media_id: Long,
      frame_idx: Int,
      frame_checksum: Long,
      features: Array[Float])

  /** Frame sampling: each video asset yields `framesPerAsset` rows — the
    * 1→N decode shape (video → frames, audio → windows). Runs as a typed
    * flatMap inside executors; the frame "decode" is the stub codec over a
    * deterministic byte slice standing in for a real demuxer. */
  def sampleFrames(spark: SparkSession, media: DataFrame,
      framesPerAsset: Int = 4): Dataset[FrameSample] = {
    import spark.implicits._
    media.as[MediaRecord].flatMap { m =>
      if (m.modality != "video" || m.content.isEmpty) Iterator.empty
      else (0 until framesPerAsset).iterator.map { f =>
        val start = (m.content.length.toLong * f / framesPerAsset).toInt
        val end = (m.content.length.toLong * (f + 1) / framesPerAsset).toInt
        val slice = java.util.Arrays.copyOfRange(m.content, start, math.max(end, start + 1))
        FrameSample(m.media_id, f, StubCodec.checksum(slice), StubCodec.decode(slice))
      }
    }
  }

  /** Feature extraction as a partition-wise transform: the decode runs
    * inside executors, one partition at a time, no driver involvement —
    * the shape a Pandas-UDF/mapInPandas pipeline has in PySpark, expressed
    * as a typed mapPartitions here. */
  def extractFeatures(spark: SparkSession, media: DataFrame): Dataset[MediaFeatures] = {
    import spark.implicits._
    media.as[MediaRecord].mapPartitions { it =>
      it.map { m =>
        MediaFeatures(
          media_id = m.media_id,
          modality = m.modality,
          n_bytes = m.content.length.toLong,
          checksum = StubCodec.checksum(m.content),
          features = StubCodec.decode(m.content))
      }
    }
  }
}
