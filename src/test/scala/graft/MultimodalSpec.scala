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

  test("stub codec checksum changes with payload") {
    assert(Multimodal.StubCodec.checksum("abc".getBytes) !=
      Multimodal.StubCodec.checksum("abd".getBytes))
  }
}
