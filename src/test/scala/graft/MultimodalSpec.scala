package graft

import graft.multimodal.Multimodal
import org.apache.spark.sql.functions._

class MultimodalSpec extends SparkSpec {
  import spark.implicits._

  private def media = Multimodal.ingest(
    Seq((1L, "hello", "text/plain"), (2L, "world!", "text/plain"))
      .toDF("id", "payload", "mt")
      .withColumn("payload", col("payload").cast("binary")),
    "id", "payload", "mt")

  test("ingest produces binary payload + metadata struct") {
    val schema = media.schema
    assert(schema("payload").dataType.typeName == "binary")
    assert(schema("meta").dataType.typeName == "struct")
    assert(media.count() == 2)
  }

  test("frame sampling yields strided fixed-size frames") {
    val frames = Multimodal.sampleFrames(spark, media, frameSize = 2, stride = 2)
      .collect().sortBy(f => (f.mediaId, f.frameIdx))
    // "hello" (5 bytes, frames of 2: [he][ll][o]) -> stride 2 keeps idx 0, 2
    val m1 = frames.filter(_.mediaId == 1L)
    assert(m1.map(_.frameIdx).toSeq == Seq(0, 2))
    assert(new String(m1.head.frame) == "he" && new String(m1(1).frame) == "o")
  }

  test("feature extraction is deterministic and fixed-width") {
    val f1 = Multimodal.extractFeatures(spark, media).collect()
      .sortBy(_.mediaId)
    val f2 = Multimodal.extractFeatures(spark, media).collect()
      .sortBy(_.mediaId)
    assert(f1.map(_.checksum).toSeq == f2.map(_.checksum).toSeq)
    assert(f1.forall(_.features.length == 8))
    assert(f1(0).nBytes == 5 && f1(1).nBytes == 6)
    assert(f1(0).checksum != f1(1).checksum)
  }
}
