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
