package graft

import graft.operators.{Dedup, SigPairs}
import org.apache.spark.sql.functions._

/** The modality-independent signature pair kernel, and in particular
  * the GROUP output contract: a same-signature clump must contribute
  * O(m) output rows (star edges), not m(m−1)/2 intra pairs and not
  * m_a×m_b expansion rows — while leaving connected components (and
  * therefore resolve survivorship) exactly what the all-pairs
  * contract produces.
  */
class SigPairsSpec extends SparkSpec {
  import spark.implicits._

  // sig values chosen on band structure (4 x 16-bit bands):
  // CLUMP ^ NEAR differ only in the low band (hamming 3) -> collide
  // in 3 bands; FAR differs everywhere.
  private val CLUMP = 0x1111222233334444L
  private val NEAR = CLUMP ^ 0x7L // hamming 3
  private val FAR = 0x7777888899990000L

  test("10k-copy clump emits O(n) star edges, not quadratic pairs") {
    // 10,000 ids share one signature (the million-re-encode meme in
    // miniature: identical perceptual hash, distinct ids); 5 ids on a
    // hamming-3 neighbour sig; 2 on an unrelated sig. The all-pairs
    // contract would emit 10_000*9_999/2 ≈ 5·10⁷ intra rows plus
    // 10_000*5 expansion rows for the verified sig pair.
    val feats = (
      (0L until 10000L).map(i => (i, CLUMP)) ++
        (20000L until 20005L).map(i => (i, NEAR)) ++
        Seq((30000L, FAR), (30001L, FAR))
      ).toDF("id", "sig").repartition(4).persist()
    val edges = SigPairs.hammingStarEdges(feats, maxHamming = 3).persist()
    // stars: 9_999 (clump) + 4 (near) + 1 (far) ; cross: ONE edge for
    // the verified (CLUMP, NEAR) sig pair, rep-to-rep
    assert(edges.count() === 9999L + 4L + 1L + 1L)
    assert(edges.filter(col("hamming") === 0).count() === 9999L + 4L + 1L)
    val cross = edges.filter(col("hamming") > 0).collect()
    assert(cross.length === 1)
    assert(cross.head.getLong(0) === 0L && cross.head.getLong(1) === 20000L)
    assert(cross.head.getInt(2) === 3)
    // contract invariant: id_a < id_b on every row
    assert(edges.filter(col("id_a") >= col("id_b")).isEmpty)
    // downstream resolve: one component spans clump+near (min id 0),
    // FAR is its own group — survivors are exactly {0, 30000}
    val docs = feats.select(col("id"))
    val resolved = Dedup.resolve(docs, edges, "id")
    assert(resolved.filter(col("is_survivor")).select(col("id"))
      .as[Long].collect().sorted.sameElements(Array(0L, 30000L)))
    assert(resolved.count() === 10007L)
    edges.unpersist(); feats.unpersist()
  }

  test("star edges and all-pairs produce identical connected components") {
    // a clumpy corpus small enough that all-pairs is feasible: 12
    // signature families, members at hamming 0/1/2 within a family,
    // 2-7 ids per signature
    val rng = new scala.util.Random(42)
    val rows = (0 until 12).flatMap { g =>
      val base = rng.nextLong()
      // three sigs per family within hamming <= 3 of each other
      Seq(base, base ^ 1L, base ^ 6L).zipWithIndex.flatMap { case (sig, j) =>
        (0 until 2 + rng.nextInt(6)).map { k =>
          (g * 1000L + j * 100L + k, sig)
        }
      }
    }
    val feats = rows.toDF("id", "sig").repartition(4).persist()
    val pairs = SigPairs.hammingPairs(feats, maxHamming = 3)
    val edges = SigPairs.hammingStarEdges(feats, maxHamming = 3)
    // the group contract emits strictly fewer rows on a clumped corpus
    val (nPairs, nEdges) = (pairs.count(), edges.count())
    assert(nEdges < nPairs, s"expected star edges ($nEdges) < pairs ($nPairs)")
    val byPairs = Dedup.components(pairs).as[(Long, Long)].collect().toSet
    val byEdges = Dedup.components(edges).as[(Long, Long)].collect().toSet
    assert(byPairs === byEdges)
    feats.unpersist()
  }

  test("maxBucket gate and audit apply to the star form identically") {
    // 40 distinct sigs that all share every band (differ only in 3
    // low bits of one band is impossible for 40 — instead vary bits
    // within ONE band so the other three bands are identical hot
    // buckets holding all 40 distinct sigs)
    val feats = (0 until 40).map(i => (i.toLong, CLUMP ^ i.toLong))
      .toDF("id", "sig").persist()
    val gatedOut = SigPairs.hammingStarEdges(feats, maxHamming = 3, maxBucket = 10)
    // every cross edge must survive only via non-saturated bands; the
    // audit names the saturated ones
    val audit = SigPairs.droppedBuckets(feats, maxBucket = 10)
    assert(audit.count() >= 3) // the three unchanged bands hold 33+ sigs
    assert(audit.select(col("error_message")).distinct().as[String]
      .collect().sameElements(Array("sig_bucket_dropped")))
    // gate only DROPS candidates, never invents: all surviving edges
    // are within hamming 3 or are stars
    assert(gatedOut.filter(col("hamming") > 3).isEmpty)
    feats.unpersist()
  }
}
