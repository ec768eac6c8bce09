package graft.jobs

import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark
import graft.synth.Pages

class MultimodalSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  private lazy val media =
    Multimodal.mediaFromPages(spark, Pages.generate(spark, 500)).cache()

  test("media table has the multimodal shape: binary payload + typed meta") {
    val schema = media.schema
    assert(schema("bytes").dataType.simpleString == "binary")
    assert(schema("meta").dataType.simpleString.startsWith("struct<width:int"))
    assert(media.count() == 500)
    val kinds = media.collect().map(_.kind).toSet
    assert(kinds == Set("image", "audio", "video"))
  }

  test("batched feature extraction is deterministic at any parallelism") {
    val f1 = Multimodal.extractFeatures(media).collect()
      .map(f => f.mediaId -> f.feature.toSeq).toMap
    val f2 = Multimodal.extractFeatures(media.repartition(7)).collect()
      .map(f => f.mediaId -> f.feature.toSeq).toMap
    assert(f1 == f2)
    assert(f1.values.forall(_.length == Multimodal.FeatureDim))
    // features depend on payload bytes: distinct payloads → distinct features
    assert(f1.values.toSeq.distinct.length > 400)
  }

  test("frame sampling fan-out matches metadata") {
    val frames = Multimodal.sampleFrames(media, everyNth = 2).collect()
    val videos = media.filter(_.kind == "video").collect()
    assert(frames.length ==
      videos.map(v => (v.meta.nFrames + 1) / 2).sum)
    assert(frames.forall(_.frameBytes.length <= 8))
  }
}
