package graft.multimodal

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal column plumbing: image/audio/video as opaque binary columns
  * with typed metadata, and decode/feature-extract as distributed
  * per-partition transforms.
  *
  * IMAGE and AUDIO decode are REAL: [[ImageIoCodec]] runs javax.imageio
  * and [[AudioIoCodec]] runs javax.sound.sampled (both ship in the JDK —
  * no external codec needed) inside the executors, with the stub as
  * fallback for payloads that aren't decodable media (the harness
  * documents corpus carries text bytes as stand-in payloads).
  * VIDEO splits honestly in two: CONTAINER metadata is REAL — [[Mp4]]
  * walks the ISO-BMFF box structure (public format, no codec needed)
  * for duration/tracks/dimensions/handlers — while frame-PIXEL decode
  * remains a STUB (`StubCodec` — the JDK has no video codec and none
  * exists in this container): deterministic fake features from the
  * bytes. The
  * Spark-side contract — schema, binary column handling, partition-wise
  * batching, feature shape — is identical either way, which is the point:
  * swapping a codec changes nothing upstream (MultimodalSpec proves it by
  * pushing real PNGs through the same path).
  */
object Multimodal {

  /** Real image decoder (javax.imageio): payload → [width, height, mean
    * R/G/B (0-1), mean luma, 0, 0]. Deterministic in the bytes. Returns
    * None when the payload isn't a decodable image, letting the caller
    * fall back to the stub. */
  object ImageIoCodec {
    val FeatureDim = 8
    def tryDecode(content: Array[Byte]): Option[Array[Float]] =
      try {
        val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(content))
        if (img == null) None
        else {
          val w = img.getWidth
          val h = img.getHeight
          var rs = 0.0; var gs = 0.0; var bs = 0.0
          var y = 0
          while (y < h) {
            var x = 0
            while (x < w) {
              val p = img.getRGB(x, y)
              rs += (p >> 16) & 0xFF; gs += (p >> 8) & 0xFF; bs += p & 0xFF
              x += 1
            }
            y += 1
          }
          val n = (w.toLong * h).toDouble
          val (r, g, b) = (rs / n, gs / n, bs / n)
          Some(Array(
            w.toFloat, h.toFloat,
            (r / 255.0).toFloat, (g / 255.0).toFloat, (b / 255.0).toFloat,
            ((0.299 * r + 0.587 * g + 0.114 * b) / 255.0).toFloat, 0f, 0f))
        }
      } catch { case _: Exception => None }
  }

  /** Real audio decoder (javax.sound.sampled — ships in the JDK, decodes
    * WAV/PCM and AIFF/AU containers): payload → [sample rate, channels,
    * duration seconds, RMS amplitude (0-1), zero-crossing rate, 0, 0, 0].
    * Deterministic in the bytes. Returns None when the payload isn't a
    * decodable audio stream, letting the caller fall back to the stub —
    * the exact ImageIoCodec contract. */
  object AudioIoCodec {
    val FeatureDim = 8
    def tryDecode(content: Array[Byte]): Option[Array[Float]] =
      try {
        val in = javax.sound.sampled.AudioSystem
          .getAudioInputStream(new java.io.ByteArrayInputStream(content))
        try {
          val fmt = in.getFormat
          val enc = fmt.getEncoding
          // Gate matches the sample-decode branches EXACTLY (WAV
          // conventions: signed 16-bit, unsigned-centered 8-bit). Other
          // encoding/width combos (signed 8-bit AIFF, unsigned 16-bit PCM)
          // would decode with the wrong sign convention, so they fall back
          // to the stub instead.
          val ok =
            (enc == javax.sound.sampled.AudioFormat.Encoding.PCM_SIGNED &&
              fmt.getSampleSizeInBits == 16) ||
            (enc == javax.sound.sampled.AudioFormat.Encoding.PCM_UNSIGNED &&
              fmt.getSampleSizeInBits == 8)
          if (!ok) None
          else {
            val bytes = in.readAllBytes()
            val bytesPerSample = fmt.getSampleSizeInBits / 8
            val frameBytes = bytesPerSample * fmt.getChannels
            val nFrames = bytes.length / frameBytes
            if (nFrames == 0) None
            else {
              // First channel only; 16-bit honors endianness, 8-bit is
              // unsigned-centered per the WAV convention.
              var sumSq = 0.0
              var crossings = 0L
              var prevNeg = false
              var i = 0
              while (i < nFrames) {
                val off = i * frameBytes
                val s =
                  if (bytesPerSample == 2) {
                    val (lo, hi) = if (fmt.isBigEndian) (off + 1, off) else (off, off + 1)
                    (((bytes(hi) << 8) | (bytes(lo) & 0xFF)).toShort).toDouble / 32768.0
                  } else ((bytes(off) & 0xFF) - 128).toDouble / 128.0
                sumSq += s * s
                val neg = s < 0
                if (i > 0 && neg != prevNeg) crossings += 1
                prevNeg = neg
                i += 1
              }
              Some(Array(
                fmt.getSampleRate,
                fmt.getChannels.toFloat,
                (nFrames.toDouble / fmt.getSampleRate).toFloat,
                math.sqrt(sumSq / nFrames).toFloat,
                (crossings.toDouble / nFrames).toFloat,
                0f, 0f, 0f))
            }
          }
        } finally in.close()
      } catch { case _: Exception => None }
  }

  /** A media asset: opaque payload + typed metadata. */
  case class MediaRecord(
      media_id: Long,
      modality: String, // "image" | "audio" | "video" | "text"
      content: Array[Byte],
      width: Int, // image/video pixels; 0 when n/a
      height: Int,
      duration_ms: Long) // audio/video; 0 when n/a

  /** Extracted features for one asset. `content_fp` is an md5 hex of the
    * payload computed INSIDE the typed pipeline — engine-portable, so the
    * multimodal plumbing itself (binary columns through a typed
    * mapPartitions) is verifiable by a SQL oracle, not just rows-only. */
  case class MediaFeatures(
      media_id: Long,
      modality: String,
      n_bytes: Long,
      checksum: Long,
      content_fp: String,
      features: Array[Float])

  private[multimodal] def md5Hex(bytes: Array[Byte]): String = {
    val d = java.security.MessageDigest.getInstance("MD5").digest(bytes)
    val sb = new StringBuilder(32)
    d.foreach(b => sb.append(f"${b & 0xFF}%02x"))
    sb.toString
  }

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
    * Modality is assigned from a PORTABLE hash of the source column
    * (md5-h31, replicable in the DuckDB oracle — xxhash64 is
    * engine-specific) so the pipeline exercises mixed-modality batches
    * AND the routing is oracle-checkable. */
  def mediaFromDocuments(docs: DataFrame): DataFrame =
    docs.select(
      col("doc_id").as("media_id"),
      element_at(
        array(lit("image"), lit("audio"), lit("video"), lit("text")),
        (pmod(
          graft.functions.PortableHashFunctions
            .md5_token_hashes(array(col("source")), bits = 31)
            .getItem(0),
          lit(4)) + lit(1)).cast("int")).as("modality"),
      col("text").cast("binary").as("content"),
      lit(64).as("width"),
      lit(64).as("height"),
      lit(1000L).as("duration_ms"))

  /** One sampled frame from a video asset (1→N decode). `frame_fp` is the
    * portable md5 of the frame slice (see MediaFeatures.content_fp). */
  case class FrameSample(
      media_id: Long,
      frame_idx: Int,
      frame_checksum: Long,
      frame_fp: String,
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
        FrameSample(m.media_id, f, StubCodec.checksum(slice), md5Hex(slice), StubCodec.decode(slice))
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
        // Images and audio decode for real (JDK imageio / sampled audio);
        // everything else — and payloads that turn out not to be decodable
        // media — takes the stub path.
        val features = m.modality match {
          case "image" => ImageIoCodec.tryDecode(m.content).getOrElse(StubCodec.decode(m.content))
          case "audio" => AudioIoCodec.tryDecode(m.content).getOrElse(StubCodec.decode(m.content))
          case "video" => Mp4.tryParse(m.content).map(v => Array(
            (v.duration_ms.toDouble / 1000.0).toFloat, v.timescale.toFloat,
            v.n_tracks.toFloat, v.width.toFloat, v.height.toFloat,
            if (v.has_video) 1f else 0f, if (v.has_audio) 1f else 0f, 0f))
            .getOrElse(StubCodec.decode(m.content))
          case _ => StubCodec.decode(m.content)
        }
        MediaFeatures(
          media_id = m.media_id,
          modality = m.modality,
          n_bytes = m.content.length.toLong,
          checksum = StubCodec.checksum(m.content),
          content_fp = md5Hex(m.content),
          features = features)
      }
    }
  }
}
