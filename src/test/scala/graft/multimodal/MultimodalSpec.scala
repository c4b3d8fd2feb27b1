package graft.multimodal

import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestSession

class MultimodalSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  test("binary ingest + batched feature extraction is deterministic and total") {
    val df = Seq(
      (1L, "payload-one", "image"),
      (2L, "payload-two", "audio"),
      (3L, "", "video"))
      .toDF("id", "payload", "mt")
      .withColumn("content", org.apache.spark.sql.functions.col("payload").cast("binary"))
    val media = Multimodal.fromBinary(df, "id", "content", "mt")
    val feats = Multimodal.extractFeatures(media, dim = 8, batchSize = 2)
      .collect().map(f => f.id -> f).toMap
    assert(feats.size == 3)
    assert(feats.values.forall(_.features.length == 8))
    assert(feats(3L).features.forall(_ == 0f), "empty content → zero features")
    // determinism: same content → same features
    val again = Multimodal.extractFeatures(media, dim = 8, batchSize = 64)
      .collect().map(f => f.id -> f.features.toSeq).toMap
    assert(again(1L) == feats(1L).features.toSeq)
    // distinct content → distinct features
    assert(again(1L) != again(2L))
  }

  test("stub frame sampler keeps every nth block") {
    val content = Array.tabulate[Byte](64)(_.toByte)
    val frames = Multimodal.FakeDecoder.sampleFrames(content, everyN = 2)
    assert(frames.size == 2)
    assert(frames.head.head == 0.toByte && frames(1).head == 32.toByte)
  }

  test("stub resize: strided subsample hits the target size, deterministic") {
    val content = Array.tabulate[Byte](100)(_.toByte)
    val small = Multimodal.FakeDecoder.resize(content, 4, 4)
    assert(small.length == 16)
    assert(small.head == 0.toByte && small(1) == 6.toByte) // stride 100/16 = 6
    // upscale request larger than the source keeps every byte
    assert(Multimodal.FakeDecoder.resize(content, 20, 20).length == 100)
    assert(Multimodal.FakeDecoder.resize(Array.emptyByteArray, 4, 4).isEmpty)
    // determinism
    assert(Multimodal.FakeDecoder.resize(content, 4, 4).toSeq == small.toSeq)
  }
}
