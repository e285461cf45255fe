package graft.multimodal

import java.awt.image.BufferedImage
import java.io.{ByteArrayInputStream, ByteArrayOutputStream}

import javax.imageio.ImageIO

import graft.operators.SigPairs
import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

import scala.util.control.NonFatal

/** Real image decode / perceptual-hash / resize over binary payload
  * columns, using only the JDK's `javax.imageio` (PNG/JPEG/BMP/GIF —
  * no external media libraries needed). This replaces the labeled
  * decode stub for the image modality; non-image or undecodable
  * payloads fall through with `decoded = false` so a 100 TB corpus
  * with stray corrupt files degrades to audit rows, not task
  * failures (mirrors the reference's per-file error-swallowing
  * watcher loops, e.g. pattern_based_cleaner_watcher.py:178's broad
  * except-continue).
  *
  * All pixel math is hand-rolled box averaging — deterministic
  * across JVMs by construction (no Graphics2D interpolation, whose
  * rounding is implementation-defined). Every op is row-local
  * (mapPartitions, no shuffle): at scale, decode parallelism is
  * exactly scan parallelism.
  */
object Images {

  /** Per-image features: dimensions, exact mean luma, and two 64-bit
    * perceptual hashes (average-hash and difference-hash) — the
    * standard near-duplicate-image keys; Hamming distance on them is
    * the image analogue of SimHash on text.
    */
  case class ImageFeatures(mediaId: Long, decoded: Boolean,
                           width: Int, height: Int,
                           meanLuma: Double, aHash: Long, dHash: Long)

  /** ImageIO's disk-backed stream cache is pure overhead for
    * in-memory byte arrays (and a temp-dir dependency on executors).
    */
  private lazy val imageIoInit: Unit = ImageIO.setUseCache(false)

  def decode(bytes: Array[Byte]): Option[BufferedImage] =
    if (bytes == null || bytes.length == 0) None
    else {
      imageIoInit
      try Option(ImageIO.read(new ByteArrayInputStream(bytes)))
      catch { case NonFatal(_) => None }
    }

  def encodePng(img: BufferedImage): Array[Byte] = {
    imageIoInit
    val out = new ByteArrayOutputStream()
    ImageIO.write(img, "png", out)
    out.toByteArray
  }

  private def lumaOf(rgb: Int): Double = {
    val r = (rgb >> 16) & 0xFF
    val g = (rgb >> 8) & 0xFF
    val b = rgb & 0xFF
    0.299 * r + 0.587 * g + 0.114 * b
  }

  /** Box-average grayscale downscale to a gw x gh grid. Each source
    * pixel lands in exactly one cell (floor(x*gw/w), floor(y*gh/h)),
    * so the grid is an exact partition of the image — `grayGrid(img,
    * 1, 1)(0)` is the exact whole-image mean luma. Deterministic:
    * integer cell assignment + double accumulation in raster order.
    */
  def grayGrid(img: BufferedImage, gw: Int, gh: Int): Array[Double] = {
    val w = img.getWidth
    val h = img.getHeight
    val sum = new Array[Double](gw * gh)
    val cnt = new Array[Int](gw * gh)
    var y = 0
    while (y < h) {
      val gy = (y.toLong * gh / h).toInt
      var x = 0
      while (x < w) {
        val gx = (x.toLong * gw / w).toInt
        val i = gy * gw + gx
        sum(i) += lumaOf(img.getRGB(x, y))
        cnt(i) += 1
        x += 1
      }
      y += 1
    }
    var i = 0
    while (i < sum.length) {
      if (cnt(i) > 0) sum(i) /= cnt(i)
      i += 1
    }
    sum
  }

  /** Average hash: 8x8 grayscale grid, bit i set iff cell i >= grid
    * mean. Bit order is raster order (row-major, LSB = top-left).
    */
  def aHash(img: BufferedImage): Long = {
    val g = grayGrid(img, 8, 8)
    val mean = g.sum / g.length
    var bits = 0L
    var i = 0
    while (i < 64) {
      if (g(i) >= mean) bits |= (1L << i)
      i += 1
    }
    bits
  }

  /** Difference hash: 9x8 grid, bit set iff the right neighbour is
    * brighter — robust to global brightness shifts that flip aHash.
    */
  def dHash(img: BufferedImage): Long = {
    val g = grayGrid(img, 9, 8)
    var bits = 0L
    var i = 0
    var y = 0
    while (y < 8) {
      var x = 0
      while (x < 8) {
        if (g(y * 9 + x + 1) > g(y * 9 + x)) bits |= (1L << i)
        i += 1
        x += 1
      }
      y += 1
    }
    bits
  }

  /** Box-average color resize to (tw, th), re-encoded as PNG. The
    * inverse grid of grayGrid: each source pixel contributes to
    * exactly one target cell, per-channel averages. Deterministic.
    */
  def resizePng(bytes: Array[Byte], tw: Int, th: Int): Option[Array[Byte]] =
    decode(bytes).map { img =>
      val w = img.getWidth
      val h = img.getHeight
      val n = tw * th
      val rs = new Array[Double](n)
      val gs = new Array[Double](n)
      val bs = new Array[Double](n)
      val cnt = new Array[Int](n)
      var y = 0
      while (y < h) {
        val ty = (y.toLong * th / h).toInt
        var x = 0
        while (x < w) {
          val tx = (x.toLong * tw / w).toInt
          val i = ty * tw + tx
          val rgb = img.getRGB(x, y)
          rs(i) += (rgb >> 16) & 0xFF
          gs(i) += (rgb >> 8) & 0xFF
          bs(i) += rgb & 0xFF
          cnt(i) += 1
          x += 1
        }
        y += 1
      }
      val out = new BufferedImage(tw, th, BufferedImage.TYPE_INT_RGB)
      var i = 0
      while (i < n) {
        val c = math.max(cnt(i), 1)
        val r = math.round(rs(i) / c).toInt
        val g = math.round(gs(i) / c).toInt
        val b = math.round(bs(i) / c).toInt
        out.setRGB(i % tw, i / tw, (r << 16) | (g << 8) | b)
        i += 1
      }
      encodePng(out)
    }

  /** Deterministic 8x8 RGB PNG from a seed — a fixture generator for
    * exercising the real encode->decode path where the test corpus
    * has no image bytes (a real corpus brings its own payloads).
    * Pixels tile the md5 of the seed, so equal seeds give identical
    * images and hashes.
    *
    * The digest index mixes the ROW into the stride (`3x + y`). The
    * obvious tiling `digest((i*3) % 16)` looks varied but is
    * constant down each column — `i = 16y + x` makes `(3i) % 16`
    * independent of y — and row-identical images collapse dHash
    * (row-wise neighbour comparisons) to ~8 bits of entropy: a 60 k
    * image corpus produced only 251 distinct hashes, turning the
    * band LSH's buckets quadratic and benchmarking a pathology no
    * real corpus has (real dHashes are diverse). The diagonal shift
    * keeps equal seeds byte-identical while distinct seeds get
    * near-unique hashes.
    */
  def deterministicPng(seed: Array[Byte], size: Int = 8): Array[Byte] = {
    val digest = java.security.MessageDigest.getInstance("MD5").digest(seed)
    val img = new BufferedImage(size, size, BufferedImage.TYPE_INT_RGB)
    var i = 0
    while (i < size * size) {
      val x = i % size
      val y = i / size
      val base = (3 * x + y) % 16
      val r = digest(base) & 0xFF
      val g = digest((base + 5) % 16) & 0xFF
      val b = digest((base + 11) % 16) & 0xFF
      img.setRGB(x, y, (r << 16) | (g << 8) | b)
      i += 1
    }
    encodePng(img)
  }

  /** Multiplicative brightness change (each channel scaled and
    * clipped, PNG re-encoded) — the canonical "same image, different
    * file" perturbation: bytes and aHash change, but dHash (ordering
    * of neighbouring cells) is nearly invariant because scaling is
    * monotonic — only near-tie comparisons can flip under rounding.
    */
  def brighten(bytes: Array[Byte], factor: Double): Option[Array[Byte]] =
    decode(bytes).map { img =>
      val out = new BufferedImage(img.getWidth, img.getHeight,
        BufferedImage.TYPE_INT_RGB)
      var y = 0
      while (y < img.getHeight) {
        var x = 0
        while (x < img.getWidth) {
          val rgb = img.getRGB(x, y)
          def scale(c: Int): Int =
            math.min(255, math.round(c * factor).toInt)
          out.setRGB(x, y,
            (scale((rgb >> 16) & 0xFF) << 16) |
              (scale((rgb >> 8) & 0xFF) << 8) |
              scale(rgb & 0xFF))
          x += 1
        }
        y += 1
      }
      encodePng(out)
    }

  /** Near-duplicate IMAGE pairs via dHash banding — the image
    * analogue of [[graft.operators.Dedup.simhashPairs]], same
    * pigeonhole guarantee. dHash (not aHash) is the key: re-encoded
    * / brightness-shifted copies of an image keep their cell
    * ordering, so they land at distance ~0 while distinct images
    * scatter. Undecodable payloads are excluded (they have no hash;
    * mm_dedup's byte-hash path covers exact binary dups).
    *
    * The pairing kernel (exact-signature collapse, occupancy-gated
    * band join, sig-pair expansion) is the modality-independent
    * [[graft.operators.SigPairs.hammingPairs]] — see its doc for the
    * scale shape. What stays here is the image-specific part: decode
    * once into a persisted skinny (id, sig) frame, with decode
    * parallelism equal to the INPUT's partitioning — payload bytes
    * are never shuffled (at corpus scale that would dominate, and a
    * real scan is already wide). If `media` comes from a few fat
    * files, repartition the skinny id+payload projection before
    * calling (see mm_phash_dedup).
    */
  def phashPairs(spark: SparkSession, media: DataFrame,
                 maxHamming: Int = 3, maxBucket: Int = 100000): DataFrame =
    SigPairs.hammingPairs(dhashFeats(spark, media).persist(),
      maxHamming, maxBucket)

  /** GROUP-contract near-dup image edges — [[phashPairs]]' scale
    * form, via [[graft.operators.SigPairs.hammingStarEdges]]: per
    * dHash one canonical image plus star edges, one edge per
    * verified hash pair. Output is O(images + hash pairs) even when
    * a single image has a million re-encoded copies (identical
    * dHash, different bytes — the clump exact byte dedup cannot
    * pre-collapse); connected components and resolve survivorship
    * are identical to the all-pairs form. This is the contract
    * mm_phash_dedup ships.
    */
  def phashStarEdges(spark: SparkSession, media: DataFrame,
                     maxHamming: Int = 3, maxBucket: Int = 100000): DataFrame =
    SigPairs.hammingStarEdges(dhashFeats(spark, media).persist(),
      maxHamming, maxBucket)

  /** The skinny (id, sig=dHash) frame the pairing kernels and the
    * bucket audit consume — decode output projected to 16 bytes per
    * image. NOT persisted: the caller owns the lifecycle. Persist it
    * once and share it between [[graft.operators.SigPairs
    * .hammingStarEdges]] and [[droppedPhashBuckets]] so pairing and
    * audit pay ONE decode, and unpersist after materializing the
    * results. (The media-taking conveniences above persist
    * internally and leave release to LRU /
    * `spark.catalog.clearCache()` — fine for one-shot queries, a
    * leak if called in a loop; loops should use this form.)
    */
  def dhashFeats(spark: SparkSession, media: DataFrame): DataFrame =
    imageFeatures(spark, media).toDF()
      .filter(col("decoded"))
      .select(col("mediaId").as("id"), col("dHash").as("sig"))

  /** Audit of the band buckets the pairing kernels drop for
    * exceeding `maxBucket` distinct signatures — one
    * failure-log-shaped row per over-full (band, bucket). Pass the
    * same persisted [[dhashFeats]] frame the pairing call used:
    * audit and pairing then share one decode and cannot drift.
    */
  def droppedPhashBuckets(feats: DataFrame, maxBucket: Int): DataFrame =
    SigPairs.droppedBuckets(feats, maxBucket, reason = "phash_bucket_dropped")

  /** Convenience form re-deriving the feats frame from `media` —
    * re-decodes; prefer the feats-taking overload when a pairing
    * call already decoded.
    */
  def droppedPhashBuckets(spark: SparkSession, media: DataFrame,
                          maxBucket: Int = 100000): DataFrame =
    droppedPhashBuckets(dhashFeats(spark, media), maxBucket)

  /** Partition-wise real decode -> feature extraction. Undecodable
    * payloads (corrupt, truncated, or not an image at all) yield a
    * `decoded = false` row with zeroed features instead of failing
    * the task — filter on `decoded` downstream, count the rest as
    * the corpus's corrupt-file audit. No shuffle.
    */
  def imageFeatures(spark: SparkSession, media: DataFrame): Dataset[ImageFeatures] = {
    import spark.implicits._
    media.select(col("media_id"), col("payload"))
      .as[(Long, Array[Byte])]
      .mapPartitions { it =>
        it.map { case (id, bytes) =>
          decode(bytes) match {
            case Some(img) =>
              ImageFeatures(id, decoded = true, img.getWidth, img.getHeight,
                grayGrid(img, 1, 1)(0), aHash(img), dHash(img))
            case None =>
              ImageFeatures(id, decoded = false, 0, 0, 0.0, 0L, 0L)
          }
        }
      }
  }
}
