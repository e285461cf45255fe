package graft.operators

import graft.functions.{HashFunctions => H}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Near-duplicate pairs over 64-bit perceptual signatures — the
  * modality-independent kernel behind
  * [[graft.multimodal.Images.phashPairs]] (image dHash) and
  * [[graft.multimodal.Audio.audioPairs]] (audio energy-delta hash).
  * Input is a skinny (id: long, sig: long) frame; the decode that
  * produced the signatures stays with the modality.
  *
  * Scale shape, in candidate-volume order (same pigeonhole family as
  * [[Dedup.simhashPairs]] — 4 x 16-bit bands: two signatures within
  * Hamming distance 3 share at least one identical band):
  *
  *  1. EXACT-SIGNATURE COLLAPSE: the band join runs over DISTINCT
  *     signatures, not items. Identical items (exact re-uploads —
  *     the dominant clump in a dedup corpus) pair at distance 0 via
  *     one sig-partitioned self-join and never enter the band join,
  *     so a million-copy clump contributes ONE row per band bucket
  *     instead of a million² join rows. Recall-lossless.
  *  2. Banded candidates over distinct sigs carry the two 8-byte
  *     sigs through the (band, bucket) shuffle (16 B/row — skinny),
  *     Hamming-verify, then expand verified SIG pairs back to item
  *     pairs by joining members on both sides — output-bound by
  *     construction.
  *  3. `maxBucket` occupancy gate (same pattern as
  *     [[FuzzyMatch.pairs]]): a band bucket holding more than
  *     `maxBucket` DISTINCT sigs — 16-bit buckets saturate once the
  *     distinct-hash count approaches 2^16·cap — is dropped loudly
  *     rather than joined quadratically; [[droppedBuckets]] audits
  *     what was dropped. A dropped pair is only LOST if the pair
  *     shares no other band.
  */
object SigPairs {

  /** All (id_a, id_b, hamming) pairs with hamming <= maxHamming.
    * `feats` must have columns (id: long, sig: long); persist it
    * before calling if computing it is expensive (it is read three
    * times: intra pairs, banding, expansion).
    */
  def hammingPairs(feats: DataFrame, maxHamming: Int = 3,
                   maxBucket: Int = 100000): DataFrame = {
    require(maxHamming >= 0 && maxHamming <= 3,
      s"4-band pigeonhole guarantees recall only to hamming 3, got $maxHamming")
    require(maxBucket > 1, s"maxBucket must be > 1, got $maxBucket")
    // intra-sig: identical signatures pair at distance 0 without any
    // banding — one hash-partitioned self-join on sig
    val intra = feats.select(col("sig"), col("id").as("id_a"))
      .join(feats.select(col("sig"), col("id").as("id_b")), Seq("sig"))
      .filter(col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b"), lit(0).cast("int").as("hamming"))
    // cross-sig: band join over DISTINCT sigs, occupancy-gated
    val sigs = feats.select(col("sig")).distinct()
    val banded = sigs
      .select(col("sig"), explode(H.simhashBands(col("sig"))).as("b"))
      .select(col("sig"), col("b.band"), col("b.bucket"))
    val gated = banded.join(
      banded.groupBy(col("band"), col("bucket"))
        .agg(count(lit(1)).as("__bn"))
        .filter(col("__bn") <= maxBucket)
        .select(col("band"), col("bucket")),
      Seq("band", "bucket"), "left_semi")
    val sigPairs = gated
      .select(col("band"), col("bucket"), col("sig").as("sig_a"))
      .join(gated.select(col("band"), col("bucket"), col("sig").as("sig_b")),
        Seq("band", "bucket"))
      .filter(col("sig_a") < col("sig_b"))
      .select(col("sig_a"), col("sig_b"))
      .distinct()
      .withColumn("hamming", H.hamming64(col("sig_a"), col("sig_b")))
      .filter(col("hamming") <= maxHamming)
    val cross = sigPairs
      .join(feats.select(col("sig").as("sig_a"), col("id").as("ida")), Seq("sig_a"))
      .join(feats.select(col("sig").as("sig_b"), col("id").as("idb")), Seq("sig_b"))
      .select(least(col("ida"), col("idb")).as("id_a"),
        greatest(col("ida"), col("idb")).as("id_b"),
        col("hamming").cast("int").as("hamming"))
    intra.unionByName(cross)
  }

  /** Audit of the band buckets [[hammingPairs]] drops for exceeding
    * `maxBucket` distinct signatures — one failure-log-shaped row per
    * over-full (band, bucket) (mirrors
    * [[FuzzyMatch.droppedBlocks]]). Recompute `feats` identically to
    * the pairing call so the two can't drift.
    */
  def droppedBuckets(feats: DataFrame, maxBucket: Int = 100000,
                     reason: String = "sig_bucket_dropped"): DataFrame =
    feats
      .select(col("sig")).distinct()
      .select(explode(H.simhashBands(col("sig"))).as("b"))
      .select(col("b.band"), col("b.bucket"))
      .groupBy(col("band"), col("bucket"))
      .agg(count(lit(1)).as("n_sigs"))
      .filter(col("n_sigs") > maxBucket)
      .select(lit("warning").as("status"),
        lit(reason).as("error_message"),
        col("band"), col("bucket"), col("n_sigs"))
}
