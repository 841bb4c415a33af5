package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.multimodal.Multimodal

class MultimodalSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("media table carries binary payloads with typed metadata") {
    val media = Multimodal.mediaFromDocuments(Tables.documents(spark, TestSpark.SfDir))
    assert(media.schema("content").dataType.typeName == "binary")
    val modalities = media.select($"modality").distinct().as[String].collect().toSet
    assert(modalities.subsetOf(Set("image", "audio", "video", "text")))
    assert(media.count() == 500)
  }

  test("feature extraction is deterministic and shape-stable") {
    val media = Multimodal.mediaFromDocuments(Tables.documents(spark, TestSpark.SfDir))
    val a = Multimodal.extractFeatures(spark, media).collect().sortBy(_.media_id)
    val b = Multimodal.extractFeatures(spark, media.repartition(7)).collect().sortBy(_.media_id)
    assert(a.length == b.length)
    a.zip(b).foreach { case (x, y) =>
      assert(x.checksum == y.checksum)
      assert(x.features.toSeq == y.features.toSeq)
      assert(x.features.length == Multimodal.StubCodec.FeatureDim)
      assert(x.n_bytes > 0)
    }
  }

  test("frame sampling yields N frames per video asset, deterministic") {
    val media = Multimodal.mediaFromDocuments(Tables.documents(spark, TestSpark.SfDir))
    val nVideos = media.filter($"modality" === "video").count()
    val frames = Multimodal.sampleFrames(spark, media, framesPerAsset = 4)
    assert(frames.count() == nVideos * 4)
    val perAsset = frames.groupBy($"media_id").count().select($"count").distinct().as[Long].collect()
    assert(perAsset.toSeq == Seq(4L))
    val again = Multimodal.sampleFrames(spark, media.repartition(5), framesPerAsset = 4)
    assert(frames.select($"media_id", $"frame_idx", $"frame_checksum").collect().toSet ==
      again.select($"media_id", $"frame_idx", $"frame_checksum").collect().toSet)
  }

  test("real PNG decode through the full MediaRecord → features path") {
    // Deterministic in-test PNGs (javax.imageio is in the JDK): a solid-red
    // 4x4 and a solid-green 8x2, pushed through the SAME distributed
    // extractFeatures pipeline as every other asset — demonstrating the
    // "swap the codec, nothing upstream changes" claim with a real decoder.
    def png(w: Int, h: Int, rgb: Int): Array[Byte] = {
      val img = new java.awt.image.BufferedImage(w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
      for (y <- 0 until h; x <- 0 until w) img.setRGB(x, y, rgb)
      val bos = new java.io.ByteArrayOutputStream()
      javax.imageio.ImageIO.write(img, "png", bos)
      bos.toByteArray
    }
    val media = Seq(
      Multimodal.MediaRecord(1L, "image", png(4, 4, 0xFF0000), 4, 4, 0L),
      Multimodal.MediaRecord(2L, "image", png(8, 2, 0x00FF00), 8, 2, 0L),
      Multimodal.MediaRecord(3L, "image", "not an image".getBytes, 0, 0, 0L)).toDF()
    val got = Multimodal.extractFeatures(spark, media)
      .collect().map(f => f.media_id -> f.features).toMap
    // red 4x4: [w, h, r, g, b, luma, 0, 0]
    assert(got(1L)(0) == 4f && got(1L)(1) == 4f)
    assert(got(1L)(2) == 1f && got(1L)(3) == 0f && got(1L)(4) == 0f)
    assert(math.abs(got(1L)(5) - 0.299f) < 1e-6)
    // green 8x2
    assert(got(2L)(0) == 8f && got(2L)(1) == 2f)
    assert(got(2L)(2) == 0f && got(2L)(3) == 1f && got(2L)(4) == 0f)
    // non-decodable image payload falls back to the stub, same shape
    assert(got(3L).length == Multimodal.StubCodec.FeatureDim)
    assert(got(3L).toSeq == Multimodal.StubCodec.decode("not an image".getBytes).toSeq)
  }

  test("real WAV decode through the full MediaRecord → features path") {
    // Deterministic in-test WAV (javax.sound.sampled is in the JDK): a
    // 440 Hz sine, 16-bit PCM mono @ 8 kHz, 0.5 s — pushed through the
    // SAME distributed extractFeatures pipeline as every other asset.
    def wav(sampleRate: Float, freq: Double, nSamples: Int): Array[Byte] = {
      val fmt = new javax.sound.sampled.AudioFormat(sampleRate, 16, 1, true, false)
      val data = new Array[Byte](nSamples * 2)
      for (i <- 0 until nSamples) {
        val s = (math.sin(2 * math.Pi * freq * i / sampleRate) * 32000).toInt.toShort
        data(2 * i) = (s & 0xFF).toByte
        data(2 * i + 1) = ((s >> 8) & 0xFF).toByte
      }
      val ais = new javax.sound.sampled.AudioInputStream(
        new java.io.ByteArrayInputStream(data), fmt, nSamples.toLong)
      val bos = new java.io.ByteArrayOutputStream()
      javax.sound.sampled.AudioSystem.write(ais, javax.sound.sampled.AudioFileFormat.Type.WAVE, bos)
      bos.toByteArray
    }
    val media = Seq(
      Multimodal.MediaRecord(1L, "audio", wav(8000f, 440.0, 4000), 0, 0, 500L),
      Multimodal.MediaRecord(2L, "audio", "not audio".getBytes, 0, 0, 0L)).toDF()
    val got = Multimodal.extractFeatures(spark, media)
      .collect().map(f => f.media_id -> f.features).toMap
    // [sample rate, channels, duration s, RMS, zero-crossing rate, 0, 0, 0]
    assert(got(1L)(0) == 8000f && got(1L)(1) == 1f)
    assert(math.abs(got(1L)(2) - 0.5f) < 1e-6)
    // full-scale-ish sine: RMS ≈ (32000/32768)/√2; crossings ≈ 2f/sr
    assert(math.abs(got(1L)(3) - 0.6905f) < 0.01, got(1L)(3))
    assert(math.abs(got(1L)(4) - 2 * 440.0 / 8000) < 0.005, got(1L)(4))
    // non-decodable audio payload falls back to the stub, same shape
    assert(got(2L).toSeq == Multimodal.StubCodec.decode("not audio".getBytes).toSeq)
  }

  test("stub codec checksum changes with payload") {
    assert(Multimodal.StubCodec.checksum("abc".getBytes) !=
      Multimodal.StubCodec.checksum("abd".getBytes))
  }

  test("MP4 box walk recovers real container metadata, no codec needed") {
    import graft.multimodal.Mp4
    val payload = "hello video".getBytes
    val bytes = Mp4.build(timescale = 600L, durationTicks = 1800L,
      width = 640, height = 360, audioTrack = true, payload = payload)
    val m = Mp4.tryParse(bytes).get
    assert(m.brand == "isom")
    assert(m.timescale == 600L && m.duration_ms == 3000L)
    assert(m.n_tracks == 2 && m.width == 640 && m.height == 360)
    assert(m.has_video && m.has_audio)
    val m2 = Mp4.tryParse(Mp4.build(1000L, 500L, 320, 240, audioTrack = false, payload)).get
    assert(m2.n_tracks == 1 && m2.duration_ms == 500L && m2.has_video && !m2.has_audio)
    // Malformed inputs parse to None, never throw.
    assert(Mp4.tryParse(bytes.take(30)).isEmpty)
    assert(Mp4.tryParse("plain text, not a container".getBytes).isEmpty)
    assert(Mp4.tryParse(Array.empty[Byte]).isEmpty)
  }

  test("MP4 walk handles largesize (64-bit) boxes and version-1 movie headers") {
    import graft.multimodal.Mp4
    def be32(v: Long) = Array(((v >> 24) & 0xFF).toByte, ((v >> 16) & 0xFF).toByte,
      ((v >> 8) & 0xFF).toByte, (v & 0xFF).toByte)
    def be64(v: Long) = be32(v >>> 32) ++ be32(v & 0xFFFFFFFFL)
    // mvhd version 1: 64-bit creation/modification/duration times.
    val mvhd = be32(40) ++ "mvhd".getBytes("ISO-8859-1") ++
      Array[Byte](1, 0, 0, 0) ++ new Array[Byte](16) ++ be32(600) ++ be64(1200)
    // moov wrapped in a size==1 largesize header (16-byte header).
    val moov = be32(1) ++ "moov".getBytes("ISO-8859-1") ++
      be64(16L + mvhd.length) ++ mvhd
    val m = Mp4.tryParse(moov).get
    assert(m.timescale == 600L && m.duration_ms == 2000L)
    assert(m.n_tracks == 0 && !m.has_video && !m.has_audio && m.brand == "")
  }

  test("image header walk: PNG/GIF/JPEG round-trip, real-ImageIO cross-check, malformed → None") {
    import graft.multimodal.ImageHeaders
    val payload = "opaque body".getBytes
    val png = ImageHeaders.tryParse(ImageHeaders.buildPng(640, 360, 16, payload)).get
    assert(png == ImageHeaders.Meta("png", 640, 360, 16))
    val gif = ImageHeaders.tryParse(ImageHeaders.buildGif(1023, 7, 5, payload)).get
    assert(gif == ImageHeaders.Meta("gif", 1023, 7, 5))
    val jpg = ImageHeaders.tryParse(ImageHeaders.buildJpeg(4096, 2160, payload)).get
    assert(jpg == ImageHeaders.Meta("jpeg", 4096, 2160, 8))
    // Sizes match the q219 oracle arithmetic.
    assert(ImageHeaders.buildPng(1, 1, 8, payload).length == 57 + payload.length)
    assert(ImageHeaders.buildGif(1, 1, 1, payload).length == 14 + payload.length)
    assert(ImageHeaders.buildJpeg(1, 1, payload).length == 23 + payload.length)
    // Third-party writer cross-check: a REAL ImageIO PNG parses to the
    // same dimensions the encoder was given (bit depth 8, RGB).
    val img = new java.awt.image.BufferedImage(12, 5, java.awt.image.BufferedImage.TYPE_INT_RGB)
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", bos)
    val real = ImageHeaders.tryParse(bos.toByteArray).get
    assert(real.format == "png" && real.width == 12 && real.height == 5 && real.bit_depth == 8)
    // Malformed inputs parse to None, never throw.
    assert(ImageHeaders.tryParse("plain text".getBytes).isEmpty)
    assert(ImageHeaders.tryParse(Array.empty[Byte]).isEmpty)
    assert(ImageHeaders.tryParse(ImageHeaders.buildPng(9, 9, 8, payload).take(20)).isEmpty)
  }

  test("MP4 container metadata flows through the video branch of extractFeatures") {
    import graft.multimodal.Mp4
    val mp4 = Mp4.build(timescale = 1000L, durationTicks = 2500L,
      width = 320, height = 240, audioTrack = true, payload = "frames".getBytes)
    val media = Seq(
      Multimodal.MediaRecord(1L, "video", mp4, 320, 240, 2500L),
      Multimodal.MediaRecord(2L, "video", "not a container".getBytes, 0, 0, 0L)).toDF()
    val got = Multimodal.extractFeatures(spark, media)
      .collect().map(f => f.media_id -> f.features).toMap
    // [duration s, timescale, n_tracks, w, h, has_video, has_audio, 0]
    assert(got(1L).toSeq == Seq(2.5f, 1000f, 2f, 320f, 240f, 1f, 1f, 0f))
    // non-container video payloads still fall back to the stub, same shape
    assert(got(2L).toSeq == Multimodal.StubCodec.decode("not a container".getBytes).toSeq)
  }
}
