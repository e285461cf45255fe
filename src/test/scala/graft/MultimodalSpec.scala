package graft

import graft.multimodal.{Audio, Images, Multimodal}
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

  // --- content sniffer -------------------------------------------------

  private val pngMagic =
    Array(0x89, 'P', 'N', 'G', 0x0D, 0x0A, 0x1A, 0x0A).map(_.toByte)

  private def riff(tag: String): Array[Byte] =
    ("RIFF" + "0000" + tag).getBytes("ISO-8859-1")

  test("sniffMediaType recognizes each supported magic") {
    assert(Multimodal.sniffMediaType(
      Images.deterministicPng("x".getBytes)) == "image/png")
    assert(Multimodal.sniffMediaType(
      Array(0xFF, 0xD8, 0xFF, 0xE0).map(_.toByte)) == "image/jpeg")
    assert(Multimodal.sniffMediaType(
      "GIF89a......".getBytes("ISO-8859-1")) == "image/gif")
    assert(Multimodal.sniffMediaType(
      "GIF87a......".getBytes("ISO-8859-1")) == "image/gif")
    assert(Multimodal.sniffMediaType(
      Audio.deterministicWav("x".getBytes, nFrames = 64)) == "audio/wav")
  }

  test("sniffMediaType routes real encoder output for every ImageIO format") {
    val img = new java.awt.image.BufferedImage(
      4, 4, java.awt.image.BufferedImage.TYPE_INT_RGB)
    for (x <- 0 until 4; y <- 0 until 4)
      img.setRGB(x, y, (x * 60) << 16 | (y * 60) << 8)
    for ((fmt, expected) <- Seq("png" -> "image/png", "jpg" -> "image/jpeg",
        "gif" -> "image/gif", "bmp" -> "image/bmp")) {
      val out = new java.io.ByteArrayOutputStream()
      javax.imageio.ImageIO.write(img, fmt, out)
      val bytes = out.toByteArray
      assert(Multimodal.sniffMediaType(bytes) == expected,
        s"format $fmt should sniff as $expected")
      assert(Images.decode(bytes).isDefined, s"format $fmt should decode")
    }
  }

  test("sniffMediaType rejects look-alikes, junk, short and null payloads") {
    // RIFF container that is not WAVE (e.g. AVI)
    assert(Multimodal.sniffMediaType(riff("AVI ")) ==
      "application/octet-stream")
    // text starting with 'BM' must not pass the DIB-header guard
    assert(Multimodal.sniffMediaType(
      "BMW dealers on Main St report record sales".getBytes) ==
      "application/octet-stream")
    assert(Multimodal.sniffMediaType("plain old text".getBytes) ==
      "application/octet-stream")
    assert(Multimodal.sniffMediaType(Array[Byte](0x42, 0x4D)) ==
      "application/octet-stream") // too short
    assert(Multimodal.sniffMediaType(Array.emptyByteArray) ==
      "application/octet-stream")
    assert(Multimodal.sniffMediaType(null) == "application/octet-stream")
  }

  // --- content-routed decode -------------------------------------------

  test("routedFeatures routes by bytes, not declared type, with audit rows") {
    val png = Images.deterministicPng("routed png".getBytes)
    val wav = Audio.deterministicWav("routed wav".getBytes, nFrames = 512)
    val rows = Seq(
      (1L, png, "image/png"),                    // honest image
      (2L, wav, "audio/wav"),                    // honest audio
      (3L, "just some text".getBytes, "text/plain"), // digest path
      (4L, png, "audio/wav"),                    // declared type LIES
      (5L, pngMagic, "image/png"),               // truncated: magic, no body
      (6L, riff("WAVE") ++ Array.fill(16)(0x7F.toByte), "audio/wav"),
      (7L, null.asInstanceOf[Array[Byte]], "text/plain"))
    val media = Multimodal.ingest(
      rows.toDF("id", "payload", "mt"), "id", "payload", "mt")
    val out = Multimodal.routedFeatures(spark, media)
      .collect().map(f => f.mediaId -> f).toMap
    assert(out.size == 7)

    val img = out(1L)
    assert(img.sniffedType == "image/png" && img.decoded)
    assert(img.width == 8 && img.height == 8 && img.digest.isEmpty)
    assert(img.aHash != 0L || img.dHash != 0L)

    val aud = out(2L)
    assert(aud.sniffedType == "audio/wav" && aud.decoded)
    assert(aud.sampleRate == 8000 && aud.channels == 1 && aud.nFrames == 512)
    assert(aud.rms > 0.0)

    val txt = out(3L)
    assert(txt.sniffedType == "application/octet-stream" && txt.decoded)
    assert(txt.digest.length == 8 && txt.width == 0 && txt.nFrames == 0L)

    // content routing wins over the lying declared type
    val liar = out(4L)
    assert(liar.declaredType == "audio/wav" && liar.sniffedType == "image/png")
    assert(liar.decoded && liar.width == 8 && liar.sampleRate == 0)

    // sniffs as media but fails decode -> audit row, not task failure
    val trunc = out(5L)
    assert(trunc.sniffedType == "image/png" && !trunc.decoded)
    assert(trunc.width == 0 && trunc.digest.isEmpty)

    val badWav = out(6L)
    assert(badWav.sniffedType == "audio/wav" && !badWav.decoded)

    val nul = out(7L)
    assert(nul.sniffedType == "application/octet-stream" && nul.decoded)
    assert(nul.nBytes == 0L && nul.digest.length == 8)
  }

  test("routedFeatures rejects non-positive digestDims on the driver") {
    intercept[IllegalArgumentException] {
      Multimodal.routedFeatures(spark, media, digestDims = 0)
    }
  }
}
