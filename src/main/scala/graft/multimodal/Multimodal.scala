package graft.multimodal

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal column plumbing (SURVEY §2): media payloads travel as
  * opaque `binary` columns with a typed metadata struct; decode /
  * feature-extraction runs per-partition over the typed Dataset so a
  * real decoder plugs in without touching the plumbing.
  *
  * The IMAGE modality has a REAL decoder: [[Images]] (JDK
  * `javax.imageio` — PNG/JPEG/BMP/GIF decode, perceptual hashes,
  * box-average resize; no external libraries). So does AUDIO:
  * [[Audio]] (hand-rolled RIFF/WAV PCM parser, level stats,
  * energy-delta perceptual hash). Only the GENERIC byte-digest
  * decode here remains a deterministic stand-in (`FakeDecoder` —
  * for payload types with no in-container codec, e.g. video).
  * Everything around it — schema, encoders,
  * partition-wise batching, feature schema — is real and tested.
  * At scale the binary payload stays columnar in parquet, the
  * metadata struct supports predicate pushdown (e.g. filter on
  * media_type or width without touching bytes), and decode
  * parallelism is per-partition with no shuffle.
  */
object Multimodal {

  case class MediaMeta(mediaType: String, width: Int, height: Int,
                       sampleRateHz: Int)
  case class MediaRecord(mediaId: Long, meta: MediaMeta, payload: Array[Byte])
  case class MediaFeatures(mediaId: Long, mediaType: String, nBytes: Long,
                           checksum: Long, features: Array[Float])

  /** Deterministic stand-in for a real decoder: features are a fixed-
    * width digest of the payload bytes. Swap with a real
    * image/audio decode; the signature is the contract.
    */
  object FakeDecoder {
    def decode(payload: Array[Byte], dims: Int = 8): Array[Float] = {
      val out = new Array[Float](dims)
      var i = 0
      while (i < payload.length) {
        out(i % dims) += (payload(i) & 0xFF) / 255.0f
        i += 1
      }
      out
    }

    def checksum(payload: Array[Byte]): Long = {
      var h = 1125899906842597L
      var i = 0
      while (i < payload.length) { h = 31 * h + payload(i); i += 1 }
      h
    }
  }

  /** Wrap raw rows (id, bytes + metadata cols) into the typed media
    * schema. Binary stays a single column; metadata is a struct.
    */
  def ingest(df: DataFrame, idCol: String, payloadCol: String,
             mediaTypeCol: String): DataFrame =
    df.select(
      col(idCol).cast("long").as("media_id"),
      struct(
        col(mediaTypeCol).as("media_type"),
        lit(0).as("width"), lit(0).as("height"),
        lit(0).as("sample_rate_hz")).as("meta"),
      col(payloadCol).cast("binary").as("payload"))

  /** Content-based payload type detection by magic numbers — the
    * content-true form of the reference's filename-pattern dispatch
    * (`pattern_based_watcher.py:31` routes on extension; a renamed
    * `.jpg` inside a tar lies, leading bytes don't). Checks are
    * strict on purpose: a full 8-byte PNG signature, RIFF+WAVE (not
    * just RIFF), GIF87a/GIF89a, and BMP only when the DIB header
    * size field is a known value — so arbitrary text/binary payloads
    * essentially never false-positive into a decoder.
    */
  def sniffMediaType(bytes: Array[Byte]): String = {
    if (bytes == null || bytes.length < 3) return "application/octet-stream"
    def u8(i: Int) = bytes(i) & 0xFF
    // JPEG: FF D8 FF (SOI + first marker byte)
    if (u8(0) == 0xFF && u8(1) == 0xD8 && u8(2) == 0xFF) return "image/jpeg"
    if (bytes.length >= 8 &&
      u8(0) == 0x89 && u8(1) == 'P' && u8(2) == 'N' && u8(3) == 'G' &&
      u8(4) == 0x0D && u8(5) == 0x0A && u8(6) == 0x1A && u8(7) == 0x0A)
      return "image/png"
    if (bytes.length >= 6 && u8(0) == 'G' && u8(1) == 'I' && u8(2) == 'F' &&
      u8(3) == '8' && (u8(4) == '7' || u8(4) == '9') && u8(5) == 'a')
      return "image/gif"
    if (bytes.length >= 12 &&
      u8(0) == 'R' && u8(1) == 'I' && u8(2) == 'F' && u8(3) == 'F' &&
      u8(8) == 'W' && u8(9) == 'A' && u8(10) == 'V' && u8(11) == 'E')
      return "audio/wav"
    // BMP: 'BM' alone is two printable chars — require a known DIB
    // header size at offset 14 (BITMAPCOREHEADER..BITMAPV5HEADER)
    if (bytes.length >= 18 && u8(0) == 'B' && u8(1) == 'M') {
      val dib = u8(14).toLong | (u8(15).toLong << 8) |
        (u8(16).toLong << 16) | (u8(17).toLong << 24)
      if (dib == 12L || dib == 40L || dib == 52L || dib == 56L ||
        dib == 64L || dib == 108L || dib == 124L) return "image/bmp"
    }
    "application/octet-stream"
  }

  /** One row per payload from the content-routed decode: the sniffed
    * type, whether the routed decoder succeeded, and that decoder's
    * features (image fields for image types, audio fields for audio/wav,
    * digest for everything else; non-applicable fields are zeroed
    * and `decoded` + `sniffedType` say which block is live).
    */
  case class RoutedFeatures(mediaId: Long, declaredType: String,
                            sniffedType: String, decoded: Boolean,
                            nBytes: Long,
                            width: Int, height: Int, meanLuma: Double,
                            aHash: Long, dHash: Long,
                            sampleRate: Int, channels: Int, nFrames: Long,
                            durationSec: Double, rms: Double, eHash: Long,
                            digest: Array[Float])

  /** Content-routed decode: sniff each payload's real type from its
    * leading bytes and send it to the matching REAL decoder —
    * [[Images.decode]] for any image type, [[Audio.decodeWav]] for
    * audio/wav, the generic byte-digest for anything else. This
    * retires the old digest-everything path: a mixed-modality corpus
    * (e.g. a crawl dump where extensions lie) gets per-payload
    * perceptual features without any caller-side routing. Row-local
    * mapPartitions, no shuffle; a payload that sniffs as a media
    * type but fails its decoder yields `decoded = false` (the audit
    * path, never a task failure). The generic digest always
    * succeeds, so its rows carry `decoded = true`.
    */
  def routedFeatures(spark: SparkSession, media: DataFrame,
                     digestDims: Int = 8): Dataset[RoutedFeatures] = {
    require(digestDims > 0, s"digestDims must be positive, got $digestDims")
    import spark.implicits._
    media.select(col("media_id"), col("meta.media_type").as("media_type"),
        col("payload"))
      .as[(Long, String, Array[Byte])]
      .mapPartitions { it =>
        it.map { case (id, declared, bytes) =>
          val safe = if (bytes == null) Array.emptyByteArray else bytes
          val sniffed = sniffMediaType(safe)
          val zero = RoutedFeatures(id, declared, sniffed, decoded = false,
            safe.length.toLong, 0, 0, 0.0, 0L, 0L, 0, 0, 0L, 0.0, 0.0, 0L,
            Array.emptyFloatArray)
          sniffed match {
            case t if t.startsWith("image/") =>
              Images.decode(safe) match {
                case Some(img) =>
                  zero.copy(decoded = true,
                    width = img.getWidth, height = img.getHeight,
                    meanLuma = Images.grayGrid(img, 1, 1)(0),
                    aHash = Images.aHash(img), dHash = Images.dHash(img))
                case None => zero
              }
            case "audio/wav" =>
              val wav = try Audio.decodeWav(safe)
              catch { case scala.util.control.NonFatal(_) => None }
              wav match {
                case Some(w) =>
                  val f = Audio.features(id, w)
                  zero.copy(decoded = true, sampleRate = f.sampleRate,
                    channels = f.channels, nFrames = f.nFrames,
                    durationSec = f.durationSec, rms = f.rms,
                    eHash = f.eHash)
                case None => zero
              }
            case _ =>
              zero.copy(decoded = true,
                digest = FakeDecoder.decode(safe, digestDims))
          }
        }
      }
  }

  case class Frame(mediaId: Long, frameIdx: Int, offset: Long,
                   frame: Array[Byte])

  /** Frame/window sampling over binary payloads: split each payload
    * into fixed-size frames and keep every `stride`-th one — the
    * video-frame-sampling shape with the codec stubbed (a real
    * implementation swaps the byte-slicing for codec keyframe
    * extraction; the fan-out plumbing is identical). One row in,
    * O(len/frameSize/stride) rows out, no shuffle.
    */
  def sampleFrames(spark: SparkSession, media: DataFrame,
                   frameSize: Int = 1024, stride: Int = 2): Dataset[Frame] = {
    import spark.implicits._
    media.select(col("media_id"), col("payload"))
      .as[(Long, Array[Byte])]
      .flatMap { case (id, bytes) =>
        Iterator.range(0, math.max(bytes.length, 1), frameSize)
          .zipWithIndex
          .collect { case (off, idx) if idx % stride == 0 =>
            Frame(id, idx, off.toLong,
              bytes.slice(off, math.min(off + frameSize, bytes.length)))
          }
      }
  }

  /** Partition-wise decode -> feature extraction over the typed
    * Dataset (the Scala analogue of a pandas-batch UDF): no shuffle,
    * decoder instantiated once per partition.
    */
  def extractFeatures(spark: SparkSession, media: DataFrame,
                      dims: Int = 8): Dataset[MediaFeatures] = {
    import spark.implicits._
    media.select(col("media_id"), col("meta.media_type").as("media_type"),
        col("payload"))
      .as[(Long, String, Array[Byte])]
      .mapPartitions { it =>
        // per-partition setup would construct the real decoder here
        it.map { case (id, mt, bytes) =>
          MediaFeatures(id, mt, bytes.length.toLong,
            FakeDecoder.checksum(bytes), FakeDecoder.decode(bytes, dims))
        }
      }
  }
}
