package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.functions.{TextFunctions => T}
import graft.operators.Dedup

/** Exclusive A/B of the incremental-dedup shapes on the documents
  * corpus at a scale rung: plain fingerprint left-anti join (the
  * naive form — batch and corpus both shuffle on fp) vs
  * [[Dedup.incrementalNew]]'s broadcast Bloom prefilter + broadcast
  * verify (nothing shuffles). Same split as the dedup_incremental
  * query: even ids are the corpus, odd ids + 20 re-submissions are
  * the batch. The sketch build is timed separately — it is the
  * once-per-epoch cost a deployment amortizes across batches, while
  * `bloom_s` is what every batch pays.
  *
  * `runMain graft.IncrAb <sfDir> [iters]` — idle machine, one
  * untimed warm-up per form, median of `iters` (default 3) timed
  * passes, same procedure as [[StarAb]]. One JSON line on stdout.
  *
  * Dev tool for scaling experiments — not part of the library surface.
  */
object IncrAb {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val iters = if (args.length > 1) args(1).toInt else 3
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val docs = Tables.documents(spark, sfDir)
    val corpus = docs.filter(col("doc_id") % 2 === 0)
    val batch = docs.filter(col("doc_id") % 2 === 1)
      .select(col("doc_id"), col("text"))
      .union(corpus.filter(col("doc_id") < 40)
        .select((col("doc_id") + 300000).as("doc_id"), col("text")))
    val nCorpus = corpus.count()
    val nBatch = batch.count()

    def timed(body: => Long): (Double, Long) = {
      val warm = body
      val samples = (1 to iters).map { _ =>
        val t0 = System.nanoTime()
        val n = body
        ((System.nanoTime() - t0) / 1e9, n)
      }
      (samples.map(_._1).sorted.apply(samples.length / 2), warm)
    }

    // naive: both sides shuffle on fp (sort-merge / shuffled-hash)
    def plain(): Long = batch.filter(col("text").isNotNull)
      .select(col("doc_id"), T.fingerprint(col("text")).as("fp"))
      .join(corpus.filter(col("text").isNotNull)
        .select(T.fingerprint(col("text")).as("fp")),
        Seq("fp"), "left_anti")
      .count()
    val (plainSec, plainRows) = timed(plain())

    // once-per-epoch sketch (timed separately), then the per-batch path
    val t0 = System.nanoTime()
    val sketch = spark.sparkContext.broadcast(
      Dedup.corpusSketch(corpus, "text", expectedItems = math.max(nCorpus, 1024)))
    val sketchSec = (System.nanoTime() - t0) / 1e9
    def bloom(): Long = {
      val batchFp = batch.filter(col("text").isNotNull)
        .select(col("doc_id"), T.fingerprint(col("text")).as("fp"))
      val matched = Dedup.matchedFingerprints(
        corpus, "text", batchFp.select(col("fp")), sketch)
      batchFp.join(broadcast(matched), Seq("fp"), "left_anti").count()
    }
    val (bloomSec, bloomRows) = timed(bloom())

    // r10: prefix-sharded sketch (16 shards) — the past-the-broadcast-
    // ceiling form; build timed separately like the single sketch,
    // probe adds the batch-sized shard repartition
    val t1 = System.nanoTime()
    val sharded = Dedup.corpusSketchSharded(corpus, "text", shards = 16,
      expectedItems = math.max(nCorpus, 1024))
    val shardedBuildSec = (System.nanoTime() - t1) / 1e9
    def bloomSharded(): Long = {
      val batchFp = batch.filter(col("text").isNotNull)
        .select(col("doc_id"), T.fingerprint(col("text")).as("fp"))
      val matched = Dedup.matchedFingerprintsSharded(
        corpus, "text", batchFp.select(col("fp")), sharded, shards = 16)
      batchFp.join(broadcast(matched), Seq("fp"), "left_anti").count()
    }
    val (shardedSec, shardedRows) = timed(bloomSharded())

    println(
      s"""{"sf":"$sfDir","iters":$iters,"n_corpus":$nCorpus,"n_batch":$nBatch,""" +
        f""""plain_s":$plainSec%.3f,"plain_rows":$plainRows,""" +
        f""""sketch_build_s":$sketchSec%.3f,""" +
        f""""bloom_s":$bloomSec%.3f,"bloom_rows":$bloomRows,""" +
        f""""sharded_build_s":$shardedBuildSec%.3f,""" +
        f""""sharded_s":$shardedSec%.3f,"sharded_rows":$shardedRows}""")
    spark.stop()
  }
}
