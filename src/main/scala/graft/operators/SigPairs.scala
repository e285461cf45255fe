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
  *     the dominant clump in a dedup corpus) never enter the band
  *     join, so a million-copy clump contributes ONE row per band
  *     bucket instead of a million² join rows. Recall-lossless.
  *  2. Banded candidates over distinct sigs carry the two 8-byte
  *     sigs through the (band, bucket) shuffle (16 B/row — skinny),
  *     Hamming-verify, then map verified SIG pairs back to items.
  *  3. `maxBucket` occupancy gate (same pattern as
  *     [[FuzzyMatch.pairs]]): a band bucket holding more than
  *     `maxBucket` DISTINCT sigs — 16-bit buckets saturate once the
  *     distinct-hash count approaches 2^16·cap — is dropped loudly
  *     rather than joined quadratically; [[droppedBuckets]] audits
  *     what was dropped. A dropped pair is only LOST if the pair
  *     shares no other band.
  *
  * TWO OUTPUT CONTRACTS, one kernel:
  *
  *  - [[hammingStarEdges]] (the default for dedup): a GROUP
  *    contract — per-signature canonical representative (min id)
  *    with star edges, one edge per non-canonical member plus one
  *    edge per verified signature pair. Output is O(items +
  *    sig pairs) BY CONSTRUCTION: an m-copy clump emits m−1 rows,
  *    a verified sig pair emits 1 row regardless of how many items
  *    carry each sig. Connectivity (hence connected components,
  *    hence [[Dedup.resolve]] survivorship) is identical to the
  *    all-pairs form — components only consume edges, and every
  *    member reaches its representative at distance 0.
  *  - [[hammingPairs]] (for bounded verification/reporting sets):
  *    every (id_a, id_b, hamming) pair. The intra-clump self-join
  *    and the member expansion are inherently quadratic in clump
  *    size — at corpus scale a million-re-encode meme (identical
  *    sig, different bytes, so exact byte dedup can't pre-collapse
  *    it) would emit ~5·10¹¹ rows. Use it only where the caller
  *    needs the explicit pair list and the input is already bounded.
  */
object SigPairs {

  /** Verified near-duplicate SIGNATURE pairs (sig_a, sig_b, hamming),
    * hamming <= maxHamming, sig_a < sig_b: distinct sigs -> 16-bit
    * band explode -> occupancy-gated bucket self-join -> exact
    * Hamming verify. The shared core of both output contracts; item
    * multiplicity never enters.
    */
  private def verifiedSigPairs(feats: DataFrame, maxHamming: Int,
                               maxBucket: Int): DataFrame = {
    require(maxHamming >= 0 && maxHamming <= 3,
      s"4-band pigeonhole guarantees recall only to hamming 3, got $maxHamming")
    require(maxBucket > 1, s"maxBucket must be > 1, got $maxBucket")
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
    gated
      .select(col("band"), col("bucket"), col("sig").as("sig_a"))
      .join(gated.select(col("band"), col("bucket"), col("sig").as("sig_b")),
        Seq("band", "bucket"))
      .filter(col("sig_a") < col("sig_b"))
      .select(col("sig_a"), col("sig_b"))
      .distinct()
      .withColumn("hamming", H.hamming64(col("sig_a"), col("sig_b")))
      .filter(col("hamming") <= maxHamming)
  }

  /** GROUP-contract near-dup edges (id_a, id_b, hamming), O(items +
    * verified sig pairs) output rows — see the object doc. Per sig,
    * the canonical representative is the MINIMUM id, so star edges
    * already satisfy id_a < id_b; cross edges connect the two
    * representatives. Same connected components as [[hammingPairs]]
    * (spec'd), a fraction of the rows on clumped corpora.
    *
    * `feats` must have columns (id: long, sig: long); persist it
    * before calling if computing it is expensive (it is read three
    * times: representatives, star expansion, banding).
    */
  def hammingStarEdges(feats: DataFrame, maxHamming: Int = 3,
                       maxBucket: Int = 100000): DataFrame = {
    // one row per distinct sig: the canonical member
    val reps = feats.groupBy(col("sig")).agg(min(col("id")).as("rep"))
    // star edges: member -> representative, distance 0 (identical
    // sig). m-copy clump => m-1 rows; rep < member by construction.
    val intra = feats.join(reps, Seq("sig"))
      .filter(col("id") =!= col("rep"))
      .select(col("rep").as("id_a"), col("id").as("id_b"),
        lit(0).cast("int").as("hamming"))
    // cross edges: ONE row per verified sig pair — representative to
    // representative, regardless of member counts on either side
    val cross = verifiedSigPairs(feats, maxHamming, maxBucket)
      .join(reps.select(col("sig").as("sig_a"), col("rep").as("__ra")),
        Seq("sig_a"))
      .join(reps.select(col("sig").as("sig_b"), col("rep").as("__rb")),
        Seq("sig_b"))
      .select(least(col("__ra"), col("__rb")).as("id_a"),
        greatest(col("__ra"), col("__rb")).as("id_b"),
        col("hamming").cast("int").as("hamming"))
    intra.unionByName(cross)
  }

  /** All (id_a, id_b, hamming) pairs with hamming <= maxHamming —
    * the explicit pair-list contract, QUADRATIC in clump size (see
    * the object doc; prefer [[hammingStarEdges]] for dedup).
    * `feats` must have columns (id: long, sig: long); persist it
    * before calling if computing it is expensive (it is read three
    * times: intra pairs, banding, expansion).
    */
  def hammingPairs(feats: DataFrame, maxHamming: Int = 3,
                   maxBucket: Int = 100000): DataFrame = {
    // intra-sig: identical signatures pair at distance 0 without any
    // banding — one hash-partitioned self-join on sig
    val intra = feats.select(col("sig"), col("id").as("id_a"))
      .join(feats.select(col("sig"), col("id").as("id_b")), Seq("sig"))
      .filter(col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b"), lit(0).cast("int").as("hamming"))
    // cross-sig: expand each verified sig pair to its member pairs
    val cross = verifiedSigPairs(feats, maxHamming, maxBucket)
      .join(feats.select(col("sig").as("sig_a"), col("id").as("ida")), Seq("sig_a"))
      .join(feats.select(col("sig").as("sig_b"), col("id").as("idb")), Seq("sig_b"))
      .select(least(col("ida"), col("idb")).as("id_a"),
        greatest(col("ida"), col("idb")).as("id_b"),
        col("hamming").cast("int").as("hamming"))
    intra.unionByName(cross)
  }

  /** Audit of the band buckets the pairing kernels drop for exceeding
    * `maxBucket` distinct signatures — one failure-log-shaped row per
    * over-full (band, bucket) (mirrors
    * [[FuzzyMatch.droppedBlocks]]). Takes the same skinny (id, sig)
    * frame as the kernels: pass the PERSISTED frame the pairing call
    * used and audit and pairing share one decode.
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
