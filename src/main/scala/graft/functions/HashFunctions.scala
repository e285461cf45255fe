package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** MinHash and SimHash signatures as pure column expressions.
  *
  * Both signatures are computed row-locally in one pass (no shuffle,
  * no fitted model): the k "hash functions" of classic MinHash are
  * xxhash64 salted with the permutation index. Candidate generation
  * then needs exactly ONE shuffle on (band, bucket-hash) — the
  * standard LSH plan that stays O(n·bands) at 100 TB instead of the
  * O(n²) all-pairs comparison.
  */
object HashFunctions {

  /** MinHash signature over a string-array column: for each of
    * `perms` salted hash functions, the minimum hash over the set
    * elements. Returns array<long> of length `perms`.
    */
  def minhashSignature(set: Column, perms: Int): Column =
    transform(sequence(lit(0), lit(perms - 1)),
      i => array_min(transform(set, x => xxhash64(i, x))))

  /** LSH band buckets for a MinHash signature: hash of each
    * contiguous `rowsPerBand`-slice. Returns array<struct<band:int,
    * bucket:bigint>> ready to explode + shuffle on.
    */
  def minhashBands(sig: Column, bands: Int, rowsPerBand: Int): Column =
    transform(sequence(lit(0), lit(bands - 1)),
      b => struct(
        b.cast("int").as("band"),
        xxhash64(slice(sig, b * rowsPerBand + 1, lit(rowsPerBand))).as("bucket")))

  /** Estimated Jaccard similarity = fraction of agreeing signature
    * positions.
    */
  def minhashEstimate(sigA: Column, sigB: Column, perms: Int): Column =
    size(filter(zip_with(sigA, sigB, (a, b) => a === b), x => x))
      .cast("double") / lit(perms.toDouble)

  /** 64-bit SimHash over a token-array column: per bit j, sum +-1
    * over token hashes' j-th bit, then pack the sign vector. Near-
    * duplicate texts differ in few bits (small hamming distance).
    */
  def simhash64(tokens: Column): Column =
    aggregate(
      transform(sequence(lit(0), lit(63)), j => {
        val bitSum = aggregate(tokens, lit(0),
          (acc, w) => acc +
            when(call_function("shiftright", xxhash64(w), j.cast("int")).bitwiseAND(lit(1L)) === 1L, 1)
              .otherwise(-1))
        when(bitSum > 0, call_function("shiftleft", lit(1L), j.cast("int"))).otherwise(lit(0L))
      }),
      lit(0L), (acc, x) => acc.bitwiseOR(x))

  /** Hamming distance between two packed 64-bit signatures. */
  def hamming64(a: Column, b: Column): Column = bit_count(a.bitwiseXOR(b))

  /** 16-bit band values of a 64-bit simhash (4 bands): two signatures
    * within hamming distance 3 share at least one identical band
    * (pigeonhole), so bucketing by band finds all such pairs with one
    * shuffle.
    */
  def simhashBands(sig: Column): Column =
    transform(sequence(lit(0), lit(3)),
      b => struct(
        b.cast("int").as("band"),
        call_function("shiftright", sig, b.cast("int") * 16).bitwiseAND(lit(0xFFFFL)).as("bucket")))

  /** Rolling polynomial fingerprint of a token array (base-31 mod
    * 2^61-1), a cheap order-sensitive document fingerprint.
    */
  def rollingFingerprint(tokens: Column): Column =
    aggregate(tokens, lit(0L),
      (acc, w) => pmod(acc * lit(1000003L) + xxhash64(w), lit(2305843009213693951L)))
}
