package graft.multimodal

import graft.operators.SigPairs
import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Real audio decode over binary payload columns: a hand-rolled
  * RIFF/WAV PCM parser (pure JVM byte walking — no audio libraries
  * needed, and none exist in this container; `javax.sound.sampled`
  * is deliberately avoided because its provider-dependent decode
  * paths are not deterministic across JVMs). This replaces the
  * labeled decode stub for the audio modality the same way
  * [[Images]] did for images (reference behavior: the watchers hand
  * every dropped file to a typed reader and swallow per-file
  * failures, pattern_based_cleaner_watcher.py:178).
  *
  * Non-WAV / non-PCM / corrupt payloads yield `decoded = false`
  * audit rows instead of task failures, so a 100 TB corpus with
  * stray junk degrades to audit counts. A `data` chunk whose
  * declared size overruns the actual bytes (truncated upload — the
  * common partial-write artifact) is clamped to the last whole
  * frame and still decodes: at drop-zone scale a truncated tail is
  * data loss already, not a reason to lose the readable prefix.
  *
  * All ops are row-local (mapPartitions, no shuffle): decode
  * parallelism is exactly scan parallelism.
  */
object Audio {

  /** Raw decoded WAV: interleaved integer sample codes
    * (channel-major within a frame), exactly as stored.
    */
  case class Wav(sampleRate: Int, channels: Int, bitsPerSample: Int,
                 samples: Array[Int]) {
    def nFrames: Int = samples.length / channels
  }

  /** Per-clip features: format, exact duration, level stats over the
    * channel-mixed normalized signal, and a 64-bit energy-delta
    * perceptual hash ([[eHash]]) — the audio analogue of the image
    * dHash; Hamming distance on it is the near-dup-audio key.
    */
  case class AudioFeatures(mediaId: Long, decoded: Boolean,
                           sampleRate: Int, channels: Int,
                           bitsPerSample: Int, nFrames: Long,
                           durationSec: Double, rms: Double,
                           peak: Double, clipRatio: Double, eHash: Long)

  private def u16(b: Array[Byte], i: Int): Int =
    (b(i) & 0xFF) | ((b(i + 1) & 0xFF) << 8)

  private def u32(b: Array[Byte], i: Int): Long =
    (b(i) & 0xFFL) | ((b(i + 1) & 0xFFL) << 8) |
      ((b(i + 2) & 0xFFL) << 16) | ((b(i + 3) & 0xFFL) << 24)

  private def tagAt(b: Array[Byte], i: Int, tag: String): Boolean =
    b(i) == tag.charAt(0).toByte && b(i + 1) == tag.charAt(1).toByte &&
      b(i + 2) == tag.charAt(2).toByte && b(i + 3) == tag.charAt(3).toByte

  /** Parse a RIFF/WAVE container: walk chunks (word-aligned, odd
    * sizes padded), require a PCM `fmt ` (format code 1; 8, 16, 24
    * or 32 bits) before `data`. Returns None for anything else —
    * float PCM (3), ADPCM, extensible (0xFFFE), MP3-in-WAV all land
    * on the audit path rather than silently mis-decoding.
    */
  def decodeWav(bytes: Array[Byte]): Option[Wav] = {
    if (bytes == null || bytes.length < 44) return None
    if (!tagAt(bytes, 0, "RIFF") || !tagAt(bytes, 8, "WAVE")) return None
    var pos = 12
    var fmt: Option[(Int, Int, Int, Int)] = None // (channels, rate, bits, blockAlign)
    while (pos + 8 <= bytes.length) {
      val size = u32(bytes, pos + 4)
      val body = pos + 8
      if (tagAt(bytes, pos, "fmt ")) {
        if (body + 16 > bytes.length || size < 16) return None
        val audioFormat = u16(bytes, body)
        val channels = u16(bytes, body + 2)
        val rate = u32(bytes, body + 4)
        val bits = u16(bytes, body + 14)
        val blockAlign = u16(bytes, body + 12)
        if (audioFormat != 1 ||
            (bits != 8 && bits != 16 && bits != 24 && bits != 32)) return None
        if (channels < 1 || channels > 64 || rate <= 0 || rate > Int.MaxValue)
          return None
        if (blockAlign != channels * (bits / 8)) return None
        fmt = Some((channels, rate.toInt, bits, blockAlign))
      } else if (tagAt(bytes, pos, "data")) {
        val (channels, rate, bits, blockAlign) = fmt.getOrElse(return None)
        // clamp a declared size that overruns the payload (truncated
        // upload) to the last whole frame
        val avail = math.min(size, (bytes.length - body).toLong).toInt
        val nFrames = avail / blockAlign
        val n = nFrames * channels
        val out = new Array[Int](n)
        var i = 0
        bits match {
          case 16 =>
            while (i < n) {
              out(i) = (u16(bytes, body + 2 * i) << 16) >> 16 // sign-extend
              i += 1
            }
          case 8 =>
            while (i < n) {
              out(i) = bytes(body + i) & 0xFF // 8-bit WAV is unsigned
              i += 1
            }
          case 24 =>
            while (i < n) {
              val o = body + 3 * i
              out(i) = ((bytes(o) & 0xFF) | ((bytes(o + 1) & 0xFF) << 8) |
                (bytes(o + 2) << 16)) // top byte sign-extends for free
              i += 1
            }
          case _ => // 32
            while (i < n) {
              out(i) = u32(bytes, body + 4 * i).toInt
              i += 1
            }
        }
        return Some(Wav(rate, channels, bits, out))
      }
      // Advance in LONG: size is attacker-controlled u32 (up to 2^32-1)
      // and body + size.toInt wraps negative near Int.MaxValue — the
      // loop guard stays true for negative pos and u32/tagAt then index
      // with a negative offset. A next-offset beyond the payload means
      // the remaining chunks are unreadable anyway: stop cleanly.
      val next = body.toLong + size + (size & 1L) // chunks are word-aligned
      if (next <= pos || next > bytes.length) return None
      pos = next.toInt
    }
    None
  }

  /** Encode interleaved 16-bit sample codes as a minimal PCM WAV. */
  def encodeWav16(samples: Array[Int], sampleRate: Int,
                  channels: Int): Array[Byte] = {
    require(channels >= 1 && samples.length % channels == 0,
      s"${samples.length} samples do not tile $channels channels")
    val dataLen = samples.length * 2
    val out = new Array[Byte](44 + dataLen)
    def putTag(i: Int, tag: String): Unit = {
      var k = 0
      while (k < 4) { out(i + k) = tag.charAt(k).toByte; k += 1 }
    }
    def put16(i: Int, v: Int): Unit = {
      out(i) = (v & 0xFF).toByte; out(i + 1) = ((v >> 8) & 0xFF).toByte
    }
    def put32(i: Int, v: Long): Unit = {
      var k = 0
      while (k < 4) { out(i + k) = ((v >> (8 * k)) & 0xFF).toByte; k += 1 }
    }
    putTag(0, "RIFF"); put32(4, 36L + dataLen); putTag(8, "WAVE")
    putTag(12, "fmt "); put32(16, 16L)
    put16(20, 1); put16(22, channels); put32(24, sampleRate.toLong)
    put32(28, sampleRate.toLong * channels * 2) // byte rate
    put16(32, channels * 2); put16(34, 16)      // block align, bits
    putTag(36, "data"); put32(40, dataLen.toLong)
    var i = 0
    while (i < samples.length) {
      val v = math.max(-32768, math.min(32767, samples(i)))
      put16(44 + 2 * i, v & 0xFFFF)
      i += 1
    }
    out
  }

  /** Normalize a raw code to [-1, 1]: 16/24/32-bit are signed,
    * 8-bit WAV is unsigned around 128.
    */
  private def norm(code: Int, bits: Int): Double = bits match {
    case 16 => code / 32768.0
    case 8  => (code - 128) / 128.0
    case 24 => code / 8388608.0
    case _  => code / 2147483648.0
  }

  private def isFullScale(code: Int, bits: Int): Boolean = bits match {
    case 16 => code == 32767 || code == -32768
    case 8  => code == 255 || code == 0
    case 24 => code == 8388607 || code == -8388608
    case _  => code == Int.MaxValue || code == Int.MinValue
  }

  /** 64-bit energy-delta hash: the mono signal is cut into 65
    * equal-share windows (`floor(i*65/n)` — the same exact-partition
    * assignment as [[Images.grayGrid]]), bit i set iff window i+1
    * has higher mean |amplitude| than window i. Like dHash, the bit
    * is an ORDER comparison, so any monotonic gain change (volume
    * normalization, the canonical "same audio, different file"
    * re-encode) preserves it exactly up to quantization rounding —
    * re-encoded copies land at Hamming ~0 while distinct clips
    * scatter.
    */
  def eHash(mono: Array[Double]): Long = {
    val n = mono.length
    if (n == 0) return 0L
    val sum = new Array[Double](65)
    val cnt = new Array[Int](65)
    var i = 0
    while (i < n) {
      val w = (i.toLong * 65 / n).toInt
      sum(w) += math.abs(mono(i))
      cnt(w) += 1
      i += 1
    }
    var w = 0
    while (w < 65) {
      if (cnt(w) > 0) sum(w) /= cnt(w)
      w += 1
    }
    var bits = 0L
    var b = 0
    while (b < 64) {
      if (sum(b + 1) > sum(b)) bits |= (1L << b)
      b += 1
    }
    bits
  }

  /** Features from a decoded clip: one pass for the mono mix and
    * clipping count, then level stats + [[eHash]] on the mix.
    */
  def features(mediaId: Long, wav: Wav): AudioFeatures = {
    val ch = wav.channels
    val nf = wav.nFrames
    val mono = new Array[Double](nf)
    var clipped = 0
    var f = 0
    while (f < nf) {
      var s = 0.0
      var anyClip = false
      var c = 0
      while (c < ch) {
        val code = wav.samples(f * ch + c)
        s += norm(code, wav.bitsPerSample)
        anyClip ||= isFullScale(code, wav.bitsPerSample)
        c += 1
      }
      mono(f) = s / ch
      if (anyClip) clipped += 1
      f += 1
    }
    var sumSq = 0.0
    var peak = 0.0
    f = 0
    while (f < nf) {
      sumSq += mono(f) * mono(f)
      peak = math.max(peak, math.abs(mono(f)))
      f += 1
    }
    AudioFeatures(mediaId, decoded = true, wav.sampleRate, ch,
      wav.bitsPerSample, nf, nf.toDouble / wav.sampleRate,
      if (nf == 0) 0.0 else math.sqrt(sumSq / nf), peak,
      if (nf == 0) 0.0 else clipped.toDouble / nf, eHash(mono))
  }

  /** Partition-wise real decode -> feature extraction; mirrors
    * [[Images.imageFeatures]]. Undecodable payloads yield a
    * `decoded = false` row with zeroed features — the corrupt-file
    * audit, not a task failure. No shuffle.
    */
  def audioFeatures(spark: SparkSession, media: DataFrame): Dataset[AudioFeatures] = {
    import spark.implicits._
    media.select(col("media_id"), col("payload"))
      .as[(Long, Array[Byte])]
      .mapPartitions { it =>
        it.map { case (id, bytes) =>
          // NonFatal guard mirrors Images.decode: the documented
          // contract is decoded=false audit rows for corrupt input,
          // never a task failure — even if a future parser edge case
          // throws instead of returning None
          val wav = try decodeWav(bytes)
          catch { case scala.util.control.NonFatal(_) => None }
          wav match {
            case Some(w) => features(id, w)
            case None =>
              AudioFeatures(id, decoded = false, 0, 0, 0, 0L, 0.0, 0.0,
                0.0, 0.0, 0L)
          }
        }
      }
  }

  /** Near-duplicate AUDIO pairs via [[eHash]] banding — decode once
    * into a persisted skinny (id, sig) frame, then the shared
    * modality-independent kernel [[graft.operators.SigPairs
    * .hammingPairs]] (exact-signature collapse, occupancy-gated band
    * join, sig-pair expansion — see its doc for the scale shape).
    * Payload bytes are never shuffled; if `media` comes from a few
    * fat files, repartition the skinny id+payload projection before
    * calling (see mm_phash_dedup's note).
    */
  def audioPairs(spark: SparkSession, media: DataFrame,
                 maxHamming: Int = 3, maxBucket: Int = 100000): DataFrame =
    SigPairs.hammingPairs(ehashFeats(spark, media).persist(),
      maxHamming, maxBucket)

  /** GROUP-contract near-dup audio edges — [[audioPairs]]' scale
    * form, via [[graft.operators.SigPairs.hammingStarEdges]]: per
    * eHash one canonical clip plus star edges, one edge per verified
    * hash pair. Output is O(clips + hash pairs) even for a
    * million-copy re-encoded clump (identical eHash, different
    * bytes); connected components and resolve survivorship are
    * identical to the all-pairs form. This is the contract
    * mm_audio_dedup ships.
    */
  def audioStarEdges(spark: SparkSession, media: DataFrame,
                     maxHamming: Int = 3, maxBucket: Int = 100000): DataFrame =
    SigPairs.hammingStarEdges(ehashFeats(spark, media).persist(),
      maxHamming, maxBucket)

  /** The skinny (id, sig=eHash) frame the pairing kernels and the
    * bucket audit consume. NOT persisted: the caller owns the
    * lifecycle — persist once, share between pairing and
    * [[droppedAudioBuckets]] (one decode), unpersist after
    * materializing. (The media-taking conveniences persist
    * internally and leave release to LRU /
    * `spark.catalog.clearCache()`; loops should use this form.)
    */
  def ehashFeats(spark: SparkSession, media: DataFrame): DataFrame =
    audioFeatures(spark, media).toDF()
      .filter(col("decoded"))
      .select(col("mediaId").as("id"), col("eHash").as("sig"))

  /** Audit of the band buckets the pairing kernels drop for
    * exceeding `maxBucket` distinct signatures. Pass the same
    * persisted [[ehashFeats]] frame the pairing call used: audit and
    * pairing share one decode and cannot drift.
    */
  def droppedAudioBuckets(feats: DataFrame, maxBucket: Int): DataFrame =
    SigPairs.droppedBuckets(feats, maxBucket, reason = "audio_bucket_dropped")

  /** Convenience form re-deriving the feats frame from `media` —
    * re-decodes; prefer the feats-taking overload when a pairing
    * call already decoded.
    */
  def droppedAudioBuckets(spark: SparkSession, media: DataFrame,
                          maxBucket: Int = 100000): DataFrame =
    droppedAudioBuckets(ehashFeats(spark, media), maxBucket)

  /** Deterministic mono 16-bit WAV from a seed — the audio fixture
    * generator (the test corpus has no audio bytes; a real corpus
    * brings its own). A fixed-frequency sine carrier under a
    * 65-segment amplitude envelope drawn from an md5-seeded LCG:
    * envelope segments align with [[eHash]] windows, so distinct
    * seeds produce near-unique hashes (full 64-bit entropy from the
    * LCG) — the lesson of the dHash-degenerate image fixture
    * ([[Images.deterministicPng]]'s doc) applied from the start.
    * Equal seeds give byte-identical files.
    */
  def deterministicWav(seed: Array[Byte], nFrames: Int = 4096,
                       sampleRate: Int = 8000): Array[Byte] = {
    val digest = java.security.MessageDigest.getInstance("MD5").digest(seed)
    var state = 0L
    var k = 0
    while (k < 8) { state = (state << 8) | (digest(k) & 0xFFL); k += 1 }
    def nextLcg(): Long = {
      state = state * 6364136223846793005L + 1442695040888963407L
      state >>> 11
    }
    // carrier: 400-1200 Hz — >= 3 cycles per 65th-window at 8 kHz,
    // so every window's mean |sin| is phase-stable
    val freq = 400.0 + (nextLcg() % 801L)
    val env = Array.fill(65)(0.10 + 0.85 * ((nextLcg() % 10000L) / 9999.0))
    val samples = new Array[Int](nFrames)
    var i = 0
    while (i < nFrames) {
      val w = (i.toLong * 65 / nFrames).toInt
      val v = env(w) * math.sin(2 * math.Pi * freq * i / sampleRate)
      samples(i) = math.round(30000 * v).toInt // headroom: never clips
      i += 1
    }
    encodeWav16(samples, sampleRate, channels = 1)
  }

  /** Sample-rate conversion by linear interpolation, re-encoded as
    * 16-bit PCM — the audio analogue of [[Images.resizePng]]
    * (training pipelines normalize sample rate before feature
    * extraction the way image ones normalize dimensions).
    * Deterministic: output frame t samples the source at position
    * `t * srcRate / dstRate` with exact double arithmetic between
    * the two neighbouring frames, per channel. Row-local; any PCM
    * input width (normalized codes re-quantized to 16-bit).
    */
  def resample(bytes: Array[Byte], targetRate: Int): Option[Array[Byte]] = {
    require(targetRate > 0, s"targetRate must be > 0, got $targetRate")
    decodeWav(bytes).filter(_.nFrames > 0).map { wav =>
      val ch = wav.channels
      val srcN = wav.nFrames
      val dstN = math.max(1,
        math.round(srcN.toLong * targetRate.toDouble / wav.sampleRate).toInt)
      val out = new Array[Int](dstN * ch)
      var t = 0
      while (t < dstN) {
        val pos = t.toDouble * wav.sampleRate / targetRate
        val i0 = math.min(srcN - 1, pos.toInt)
        val i1 = math.min(srcN - 1, i0 + 1)
        val frac = pos - i0
        var c = 0
        while (c < ch) {
          val v0 = norm(wav.samples(i0 * ch + c), wav.bitsPerSample)
          val v1 = norm(wav.samples(i1 * ch + c), wav.bitsPerSample)
          val v = v0 + (v1 - v0) * frac
          out(t * ch + c) = math.max(-32768,
            math.min(32767, math.round(v * 32768.0).toInt))
          c += 1
        }
        t += 1
      }
      encodeWav16(out, targetRate, ch)
    }
  }

  /** Gain change with clipping, re-encoded — the canonical "same
    * audio, different file" perturbation: bytes change, RMS scales,
    * but [[eHash]] (ordering of neighbouring window energies) is
    * nearly invariant because gain is monotonic — only near-tie
    * comparisons can flip under 16-bit rounding. 16-bit input only
    * (the fixture's format); output is 16-bit.
    */
  def gainScale(bytes: Array[Byte], factor: Double): Option[Array[Byte]] =
    decodeWav(bytes).filter(_.bitsPerSample == 16).map { wav =>
      val out = new Array[Int](wav.samples.length)
      var i = 0
      while (i < out.length) {
        out(i) = math.max(-32768,
          math.min(32767, math.round(wav.samples(i) * factor).toInt))
        i += 1
      }
      encodeWav16(out, wav.sampleRate, wav.channels)
    }
}
