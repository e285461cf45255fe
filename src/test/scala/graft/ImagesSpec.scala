package graft

import java.awt.image.BufferedImage

import graft.multimodal.{Images, Multimodal}
import org.apache.spark.sql.functions._

class ImagesSpec extends SparkSpec {
  import spark.implicits._

  private def rgb(r: Int, g: Int, b: Int): Int = (r << 16) | (g << 8) | b

  private def fill(w: Int, h: Int)(px: (Int, Int) => Int): BufferedImage = {
    val img = new BufferedImage(w, h, BufferedImage.TYPE_INT_RGB)
    for (y <- 0 until h; x <- 0 until w) img.setRGB(x, y, px(x, y))
    img
  }

  test("png encode -> decode roundtrip preserves pixels exactly") {
    val img = fill(5, 3)((x, y) => rgb(x * 40, y * 80, (x + y) * 20))
    val back = Images.decode(Images.encodePng(img)).get
    assert(back.getWidth == 5 && back.getHeight == 3)
    for (y <- 0 until 3; x <- 0 until 5)
      assert((back.getRGB(x, y) & 0xFFFFFF) == (img.getRGB(x, y) & 0xFFFFFF))
  }

  test("jpeg decodes with correct dimensions") {
    val img = fill(12, 7)((_, _) => rgb(120, 60, 200))
    val out = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "jpg", out)
    val back = Images.decode(out.toByteArray)
    assert(back.exists(i => i.getWidth == 12 && i.getHeight == 7))
  }

  test("corrupt / non-image bytes decode to None") {
    assert(Images.decode("not a png".getBytes).isEmpty)
    assert(Images.decode(Array.emptyByteArray).isEmpty)
    assert(Images.decode(null).isEmpty)
    // a truncated PNG (valid magic, cut body) must not throw
    val png = Images.encodePng(fill(8, 8)((_, _) => rgb(1, 2, 3)))
    assert(Images.decode(png.take(20)).isEmpty)
  }

  test("grayGrid(1,1) is the exact whole-image mean luma") {
    val uniform = fill(10, 10)((_, _) => rgb(100, 100, 100))
    // luma of gray(100) = 100 * (0.299 + 0.587 + 0.114) = 100
    assert(math.abs(Images.grayGrid(uniform, 1, 1)(0) - 100.0) < 1e-9)
  }

  test("aHash of a half-black/half-white image is the right-half bit pattern") {
    val img = fill(16, 16)((x, _) => if (x < 8) 0 else rgb(255, 255, 255))
    // cells 4-7 of each 8-cell row are >= mean -> byte 0xF0 per row
    assert(Images.aHash(img) == 0xF0F0F0F0F0F0F0F0L)
  }

  test("dHash of a strict left-to-right gradient sets every bit") {
    val img = fill(18, 8)((x, _) => rgb(x * 14, x * 14, x * 14))
    assert(Images.dHash(img) == -1L) // all 64 comparisons brighter to the right
  }

  test("dHash is invariant to global brightness shift") {
    val base = fill(16, 8)((x, y) => rgb(x * 10, x * 10 + y, x * 10))
    val brighter = fill(16, 8)((x, y) =>
      rgb(x * 10 + 40, x * 10 + y + 40, x * 10 + 40))
    assert(Images.dHash(base) == Images.dHash(brighter))
  }

  test("resizePng box-averages to the target grid") {
    val img = fill(16, 16)((x, _) => if (x < 8) 0 else rgb(255, 255, 255))
    val resized = Images.resizePng(Images.encodePng(img), 4, 4).get
    val back = Images.decode(resized).get
    assert(back.getWidth == 4 && back.getHeight == 4)
    for (y <- 0 until 4; x <- 0 until 4) {
      val expected = if (x < 2) 0 else 0xFFFFFF
      assert((back.getRGB(x, y) & 0xFFFFFF) == expected)
    }
    assert(Images.resizePng("garbage".getBytes, 4, 4).isEmpty)
  }

  test("deterministicPng: equal seeds give identical bytes, different seeds differ") {
    val a1 = Images.deterministicPng("seed-a".getBytes)
    val a2 = Images.deterministicPng("seed-a".getBytes)
    val b = Images.deterministicPng("seed-b".getBytes)
    assert(a1.sameElements(a2))
    assert(!a1.sameElements(b))
    assert(Images.decode(a1).exists(i => i.getWidth == 8 && i.getHeight == 8))
  }

  test("brighten re-encodes with scaled channels; dHash nearly invariant") {
    val base = Images.deterministicPng("some document text".getBytes, size = 16)
    val bright = Images.brighten(base, 1.06).get
    assert(!base.sameElements(bright)) // different bytes (exact dedup misses it)
    val dhBase = Images.dHash(Images.decode(base).get)
    val dhBright = Images.dHash(Images.decode(bright).get)
    assert(java.lang.Long.bitCount(dhBase ^ dhBright) <= 3)
    assert(Images.brighten("not an image".getBytes, 1.06).isEmpty)
  }

  test("phashPairs finds perturbed copies, not distinct images, skips junk") {
    val a = Images.deterministicPng("doc alpha".getBytes, size = 16)
    val aCopy = Images.brighten(a, 1.06).get
    val b = Images.deterministicPng("completely different beta".getBytes, size = 16)
    val media = Seq(
      (1L, a), (2L, aCopy), (3L, b),
      (4L, "junk bytes, undecodable".getBytes))
      .toDF("media_id", "payload")
    val pairs = Images.phashPairs(spark, media, maxHamming = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs.contains((1L, 2L)))
    assert(!pairs.exists { case (x, y) => x == 3L || y == 3L || x == 4L || y == 4L })
    intercept[IllegalArgumentException] {
      Images.phashPairs(spark, media, maxHamming = 9)
    }
  }

  test("phashPairs: exact-dup clump pairs at hamming 0, plus cross-sig variant") {
    val a = Images.deterministicPng("clumped doc".getBytes, size = 16)
    val aCopy = Images.brighten(a, 1.06).get
    // 4 byte-identical uploads of a + one brightness re-encode + one other
    val media = (Seq.tabulate(4)(i => (i.toLong + 1, a)) ++
        Seq((10L, aCopy),
          (20L, Images.deterministicPng("unrelated".getBytes, size = 16))))
      .toDF("media_id", "payload")
    val rows = Images.phashPairs(spark, media, maxHamming = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2)))
    val pairs = rows.map(p => (p._1, p._2)).toSet
    // all 6 intra-clump pairs present, at exact distance 0
    val clump = for (i <- 1L to 4L; j <- (i + 1) to 4L) yield (i, j)
    clump.foreach { p => assert(pairs.contains(p), s"missing clump pair $p") }
    assert(rows.filter(p => p._1 <= 4 && p._2 <= 4).forall(_._3 == 0))
    // the variant pairs against EVERY clump member (sig-pair expansion)
    (1L to 4L).foreach { i => assert(pairs.contains((i, 10L))) }
    assert(!pairs.exists(p => p._1 == 20L || p._2 == 20L))
    // no duplicate pair rows from the multi-band union
    assert(rows.length == rows.map(p => (p._1, p._2)).distinct.length)
  }

  test("phashPairs maxBucket drops saturated buckets loudly, audit sees them") {
    val a = Images.deterministicPng("doc alpha".getBytes, size = 16)
    val aCopy = Images.brighten(a, 1.06).get
    val b = Images.deterministicPng("doc beta".getBytes, size = 16)
    val bCopy = Images.brighten(b, 1.06).get
    val media = Seq((1L, a), (2L, aCopy), (3L, b), (4L, bCopy))
      .toDF("media_id", "payload")
    // cap 2: every bucket holds at most the 4 distinct sigs; a cap of
    // 2 keeps pairs only where <=2 distinct sigs share the bucket.
    // The brightness variant is within hamming 3 of its base, so each
    // (base, copy) sig pair shares >=1 band — with all four sigs
    // distinct, buckets holding just the matching pair survive cap=2.
    val capped = Images.phashPairs(spark, media, maxHamming = 3, maxBucket = 2)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(capped.contains((1L, 2L)) && capped.contains((3L, 4L)))
    // audit: with a generous cap nothing is dropped...
    assert(Images.droppedPhashBuckets(spark, media, maxBucket = 100).isEmpty)
    // ...and any bucket above the cap surfaces as a warning row
    val dropped = Images.droppedPhashBuckets(spark, media, maxBucket = 1)
      .collect()
    assert(dropped.forall(_.getString(0) == "warning"))
    assert(dropped.forall(_.getLong(4) > 1))
  }

  test("imageFeatures: real decode for images, decoded=false fallback for junk") {
    val img = fill(16, 16)((x, _) => if (x < 8) 0 else rgb(255, 255, 255))
    val media = Multimodal.ingest(
      Seq((1L, Images.encodePng(img), "image/png"),
          (2L, "definitely not an image".getBytes, "image/png"))
        .toDF("id", "payload", "mt"),
      "id", "payload", "mt")
    val feats = Images.imageFeatures(spark, media).collect().sortBy(_.mediaId)
    assert(feats.length == 2)
    val ok = feats(0)
    assert(ok.decoded && ok.width == 16 && ok.height == 16)
    assert(ok.aHash == 0xF0F0F0F0F0F0F0F0L)
    assert(math.abs(ok.meanLuma - 127.5) < 1e-9)
    val bad = feats(1)
    assert(!bad.decoded && bad.width == 0 && bad.aHash == 0L)
  }
}
