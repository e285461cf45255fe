package graft

import graft.multimodal.{Audio, Multimodal}
import org.apache.spark.sql.functions._

class AudioSpec extends SparkSpec {
  import spark.implicits._

  test("wav encode -> decode roundtrip preserves codes exactly") {
    val codes = Array(0, 100, -100, 32767, -32768, 5, -5)
    // 7 samples do not tile 2 channels
    intercept[IllegalArgumentException] {
      Audio.encodeWav16(codes, 8000, channels = 2)
    }
    val wav = Audio.decodeWav(Audio.encodeWav16(codes, 8000, channels = 1)).get
    assert(wav.sampleRate == 8000 && wav.channels == 1 && wav.bitsPerSample == 16)
    assert(wav.samples.sameElements(codes))
  }

  test("decodeWav rejects junk, non-PCM, and malformed containers") {
    assert(Audio.decodeWav("not a wav at all, just text".getBytes).isEmpty)
    assert(Audio.decodeWav(Array.emptyByteArray).isEmpty)
    assert(Audio.decodeWav(null).isEmpty)
    val good = Audio.encodeWav16(Array.fill(64)(1000), 8000, 1)
    // flip the fmt audio-format code to 3 (IEEE float) -> loud reject
    val float = good.clone(); float(20) = 3
    assert(Audio.decodeWav(float).isEmpty)
    // data chunk before any fmt chunk -> reject
    val headerless = good.clone()
    headerless(12) = 'j'; headerless(13) = 'u'; headerless(14) = 'n'; headerless(15) = 'k'
    assert(Audio.decodeWav(headerless).isEmpty)
  }

  test("bogus chunk size near Int.MaxValue returns None, never throws") {
    // a crafted chunk declaring size 0x7FFFFFF0: body + size wraps an
    // Int negative, the pos+8 loop guard stays true for negative pos,
    // and the next u32/tagAt would index with a negative offset —
    // regression for the Long-advance fix
    val evil = new Array[Byte](64)
    "RIFF".getBytes.copyToArray(evil, 0)
    "WAVE".getBytes.copyToArray(evil, 8)
    "JUNK".getBytes.copyToArray(evil, 12)
    evil(16) = 0xF0.toByte; evil(17) = 0xFF.toByte
    evil(18) = 0xFF.toByte; evil(19) = 0x7F.toByte
    assert(Audio.decodeWav(evil).isEmpty)
    // declared size just past the payload end: clean stop, None
    val overrun = evil.clone()
    overrun(16) = 60; overrun(17) = 0; overrun(18) = 0; overrun(19) = 0
    assert(Audio.decodeWav(overrun).isEmpty)
    // and through the distributed path: an audit row, not a task failure
    val media = Multimodal.ingest(
      Seq((1L, evil, "audio/wav")).toDF("id", "payload", "mt"),
      "id", "payload", "mt")
    val rows = Audio.audioFeatures(spark, media).collect()
    assert(rows.length == 1 && !rows.head.decoded)
  }

  test("truncated data chunk clamps to the last whole frame, still decodes") {
    val full = Audio.encodeWav16(Array.tabulate(100)(i => i * 10), 8000, 1)
    // cut mid-sample: 44-byte header + 31 data bytes = 15 whole frames
    val wav = Audio.decodeWav(full.take(44 + 31)).get
    assert(wav.nFrames == 15)
    assert(wav.samples.sameElements(Array.tabulate(15)(i => i * 10)))
  }

  test("decodeWav skips unknown chunks (word-aligned) before data") {
    val base = Audio.encodeWav16(Array.tabulate(16)(i => i), 8000, 1)
    // splice an odd-sized LIST chunk between fmt and data; its 5-byte
    // body must be read as 6 (padded) for the data chunk to be found
    val list = Array[Byte]('L', 'I', 'S', 'T', 5, 0, 0, 0, 1, 2, 3, 4, 5, 0)
    val spliced = base.take(36) ++ list ++ base.drop(36)
    val wav = Audio.decodeWav(spliced).get
    assert(wav.samples.sameElements(Array.tabulate(16)(i => i)))
  }

  test("features: exact duration, rms, peak, clipping on a known signal") {
    // mono square wave at half scale: |mono| = 0.5 everywhere
    val codes = Array.tabulate(8000)(i => if (i % 2 == 0) 16384 else -16384)
    val f = Audio.features(7L, Audio.decodeWav(
      Audio.encodeWav16(codes, 8000, 1)).get)
    assert(f.decoded && f.nFrames == 8000 && f.sampleRate == 8000)
    assert(math.abs(f.durationSec - 1.0) < 1e-12)
    assert(math.abs(f.rms - 0.5) < 1e-9)
    assert(math.abs(f.peak - 0.5) < 1e-9)
    assert(f.clipRatio == 0.0)
    // constant signal -> every eHash window equal -> no bit set
    assert(Audio.eHash(Array.fill(650)(0.25)) == 0L)
  }

  test("features: stereo mixes channels, full-scale codes count as clipped") {
    // L = +32767 (clipped), R = -32767 -> mono ~ 0; half the frames clip
    val codes = Array.tabulate(200) { i =>
      if (i / 2 % 2 == 0) { if (i % 2 == 0) 32767 else -32767 }
      else { if (i % 2 == 0) 1000 else 1000 }
    }
    val f = Audio.features(1L, Audio.decodeWav(
      Audio.encodeWav16(codes, 8000, 2)).get)
    assert(f.channels == 2 && f.nFrames == 100)
    assert(math.abs(f.clipRatio - 0.5) < 1e-9)
    // mixed clipped frames cancel to ~0, unclipped to 1000/32768
    assert(math.abs(f.peak - 1000.0 / 32768) < 1e-6)
  }

  test("8-bit unsigned wav decodes and normalizes around 128") {
    // hand-build an 8-bit mono wav: values 128 (zero) and 255/0 (full scale)
    val data = Array[Byte](128.toByte, 255.toByte, 0.toByte, 128.toByte)
    val out = new java.io.ByteArrayOutputStream()
    def tag(s: String) = out.write(s.getBytes, 0, 4)
    def u32(v: Int) = (0 to 3).foreach(k => out.write((v >> (8 * k)) & 0xFF))
    def u16(v: Int) = (0 to 1).foreach(k => out.write((v >> (8 * k)) & 0xFF))
    tag("RIFF"); u32(36 + data.length); tag("WAVE")
    tag("fmt "); u32(16); u16(1); u16(1); u32(4000); u32(4000); u16(1); u16(8)
    tag("data"); u32(data.length); out.write(data, 0, data.length)
    val f = Audio.features(1L, Audio.decodeWav(out.toByteArray).get)
    assert(f.bitsPerSample == 8 && f.nFrames == 4)
    assert(math.abs(f.peak - 1.0) < 1e-9)       // |0 - 128| / 128
    assert(math.abs(f.clipRatio - 0.5) < 1e-9)  // 255 and 0 are full scale
  }

  test("24-bit and 32-bit PCM decode with exact sign extension and full-scale detection") {
    def wav(bits: Int, data: Array[Byte]): Array[Byte] = {
      val out = new java.io.ByteArrayOutputStream()
      def tag(s: String) = out.write(s.getBytes, 0, 4)
      def u32(v: Int) = (0 to 3).foreach(k => out.write((v >> (8 * k)) & 0xFF))
      def u16(v: Int) = (0 to 1).foreach(k => out.write((v >> (8 * k)) & 0xFF))
      tag("RIFF"); u32(36 + data.length); tag("WAVE")
      tag("fmt "); u32(16); u16(1); u16(1); u32(8000); u32(8000 * bits / 8)
      u16(bits / 8); u16(bits)
      tag("data"); u32(data.length); out.write(data, 0, data.length)
      out.toByteArray
    }
    // 24-bit codes: -4194304 (half negative scale), 8388607 (max), -8388608 (min)
    def le24(v: Int) = Array[Byte]((v & 0xFF).toByte, ((v >> 8) & 0xFF).toByte,
      ((v >> 16) & 0xFF).toByte)
    val w24 = Audio.decodeWav(wav(24,
      le24(-4194304) ++ le24(8388607) ++ le24(-8388608))).get
    assert(w24.bitsPerSample == 24 && w24.samples.sameElements(
      Array(-4194304, 8388607, -8388608)))
    val f24 = Audio.features(1L, w24)
    assert(math.abs(f24.peak - 1.0) < 1e-9)
    assert(math.abs(f24.clipRatio - 2.0 / 3) < 1e-9)
    // 32-bit codes: min, half scale, a small value
    def le32(v: Int) = Array[Byte]((v & 0xFF).toByte, ((v >> 8) & 0xFF).toByte,
      ((v >> 16) & 0xFF).toByte, ((v >> 24) & 0xFF).toByte)
    val w32 = Audio.decodeWav(wav(32,
      le32(Int.MinValue) ++ le32(1 << 30) ++ le32(-12345))).get
    assert(w32.bitsPerSample == 32 && w32.samples.sameElements(
      Array(Int.MinValue, 1 << 30, -12345)))
    val f32 = Audio.features(2L, w32)
    assert(math.abs(f32.peak - 1.0) < 1e-9)
    assert(math.abs(f32.clipRatio - 1.0 / 3) < 1e-9)
    // 20-bit (non-byte-aligned) still rejects loudly
    assert(Audio.decodeWav(wav(20, new Array[Byte](10))).isEmpty)
  }

  test("eHash: rising staircase sets every bit; gain scaling preserves it") {
    val rising = Array.tabulate(650)(i => 0.001 * (i / 10 + 1))
    assert(Audio.eHash(rising) == -1L)
    assert(Audio.eHash(Array.emptyByteArray.map(_.toDouble)) == 0L)
    val mono = Array.tabulate(1300)(i => math.sin(i * 0.37) * (1 + i % 97 / 50.0))
    assert(Audio.eHash(mono) == Audio.eHash(mono.map(_ * 0.43)))
  }

  test("deterministicWav: equal seeds identical bytes; distinct seeds diverse hashes") {
    val a1 = Audio.deterministicWav("seed-a".getBytes)
    val a2 = Audio.deterministicWav("seed-a".getBytes)
    val b = Audio.deterministicWav("seed-b".getBytes)
    assert(a1.sameElements(a2))
    assert(!a1.sameElements(b))
    // fixture-entropy guard (the dHash-degeneracy lesson): 200 seeds
    // must give (near-)200 distinct hashes, none clipped
    val feats = (0 until 200).map { i =>
      Audio.features(i.toLong, Audio.decodeWav(
        Audio.deterministicWav(s"doc $i".getBytes)).get)
    }
    assert(feats.map(_.eHash).distinct.size >= 198)
    assert(feats.forall(_.clipRatio == 0.0))
  }

  test("gainScale: different bytes, rms scales, eHash within hamming 3") {
    val base = Audio.deterministicWav("some document text".getBytes)
    val quiet = Audio.gainScale(base, 0.7).get
    assert(!base.sameElements(quiet)) // exact byte dedup misses it
    val fb = Audio.features(1L, Audio.decodeWav(base).get)
    val fq = Audio.features(2L, Audio.decodeWav(quiet).get)
    assert(math.abs(fq.rms - 0.7 * fb.rms) < 1e-3)
    assert(java.lang.Long.bitCount(fb.eHash ^ fq.eHash) <= 3)
    assert(Audio.gainScale("not audio".getBytes, 0.7).isEmpty)
  }

  test("resample: frame count scales with rate, duration and signal preserved") {
    val base = Audio.deterministicWav("resample me".getBytes) // 4096 @ 8 kHz
    val up = Audio.decodeWav(Audio.resample(base, 16000).get).get
    assert(up.sampleRate == 16000 && up.nFrames == 8192 && up.channels == 1)
    // duration invariant, and the upsampled signal passes through the
    // original samples at even positions (linear interp endpoints)
    val src = Audio.decodeWav(base).get
    assert(math.abs(up.nFrames.toDouble / 16000 - src.nFrames.toDouble / 8000) < 1e-9)
    val maxErr = (0 until src.nFrames).map(i =>
      math.abs(up.samples(2 * i) - src.samples(i))).max
    assert(maxErr <= 1, s"even-position passthrough off by $maxErr")
    val down = Audio.decodeWav(Audio.resample(base, 4000).get).get
    assert(down.sampleRate == 4000 && down.nFrames == 2048)
    // level statistics survive the rate change (same waveform)
    val fSrc = Audio.features(1L, src)
    val fDown = Audio.features(2L, down)
    assert(math.abs(fSrc.rms - fDown.rms) < 0.01)
    assert(math.abs(fSrc.durationSec - fDown.durationSec) < 1e-9)
    assert(Audio.resample("junk".getBytes, 16000).isEmpty)
    intercept[IllegalArgumentException] { Audio.resample(base, 0) }
  }

  test("audioFeatures: real decode over media frame, decoded=false for junk") {
    val media = Multimodal.ingest(
      Seq((1L, Audio.deterministicWav("clip one".getBytes), "audio/wav"),
          (2L, "definitely not audio".getBytes, "audio/wav"))
        .toDF("id", "payload", "mt"),
      "id", "payload", "mt")
    val feats = Audio.audioFeatures(spark, media).collect().sortBy(_.mediaId)
    assert(feats.length == 2)
    assert(feats(0).decoded && feats(0).sampleRate == 8000 &&
      feats(0).nFrames == 4096 && feats(0).rms > 0)
    assert(!feats(1).decoded && feats(1).nFrames == 0 && feats(1).eHash == 0L)
  }

  test("audioPairs: exact clump at hamming 0, gain variant via band join, junk skipped") {
    val a = Audio.deterministicWav("clumped clip".getBytes)
    val aQuiet = Audio.gainScale(a, 0.7).get
    val other = Audio.deterministicWav("unrelated clip".getBytes)
    val media = (Seq.tabulate(3)(i => (i.toLong + 1, a)) ++
        Seq((10L, aQuiet), (20L, other), (30L, "junk".getBytes)))
      .toDF("media_id", "payload")
    val rows = Audio.audioPairs(spark, media, maxHamming = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2)))
    val pairs = rows.map(p => (p._1, p._2)).toSet
    val clump = for (i <- 1L to 3L; j <- (i + 1) to 3L) yield (i, j)
    clump.foreach(p => assert(pairs.contains(p), s"missing clump pair $p"))
    assert(rows.filter(p => p._1 <= 3 && p._2 <= 3).forall(_._3 == 0))
    (1L to 3L).foreach(i => assert(pairs.contains((i, 10L))))
    assert(!pairs.exists(p => Set(p._1, p._2).intersect(Set(20L, 30L)).nonEmpty))
    assert(rows.length == rows.map(p => (p._1, p._2)).distinct.length)
    intercept[IllegalArgumentException] {
      Audio.audioPairs(spark, media, maxHamming = 9)
    }
  }

  test("droppedAudioBuckets: generous cap silent, cap=1 surfaces warnings") {
    val media = Seq(
      (1L, Audio.deterministicWav("x".getBytes)),
      (2L, Audio.gainScale(Audio.deterministicWav("x".getBytes), 0.8).get),
      (3L, Audio.deterministicWav("y".getBytes)))
      .toDF("media_id", "payload")
    assert(Audio.droppedAudioBuckets(spark, media, maxBucket = 100).isEmpty)
    val dropped = Audio.droppedAudioBuckets(spark, media, maxBucket = 1).collect()
    assert(dropped.forall(r => r.getString(0) == "warning" &&
      r.getString(1) == "audio_bucket_dropped" && r.getLong(4) > 1))
  }
}
