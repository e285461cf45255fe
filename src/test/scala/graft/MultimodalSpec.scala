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
