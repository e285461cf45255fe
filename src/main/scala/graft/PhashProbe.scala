package graft

import graft.functions.{HashFunctions => H}
import graft.multimodal.Images
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev tool for SCALING.md: splits mm_phash_dedup's cost into its
  * phases — synthetic payload generation + real PNG decode (the
  * row-local CPU work), dHash banding, the skinny bucket self-join's
  * candidate volume, and the Hamming verify — and reports per-band
  * bucket occupancy, the lever that decides whether 16-bit bands
  * still prune at a given corpus size.
  * `runMain graft.PhashProbe <sfDir>`.
  */
object PhashProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._
    def timed[A](f: => A): (A, Double) = {
      val t0 = System.nanoTime()
      val a = f
      (a, (System.nanoTime() - t0) / 1e9)
    }
    val variantOffset = 100000000L
    val payloads = Tables.documents(spark, sfDir)
      .select(col("doc_id"), col("text"))
      .repartition(spark.sparkContext.defaultParallelism, col("doc_id"))
      .as[(Long, String)]
      .mapPartitions { it =>
        it.flatMap { case (id, text) =>
          val seed = Option(text).getOrElse("").getBytes("UTF-8")
          val base = Images.deterministicPng(seed, size = 16)
          val variant =
            if (id % 5 == 0)
              Images.brighten(base, 1.06).iterator
                .map(b => (variantOffset + id, b))
            else Iterator.empty
          Iterator((id, base)) ++ variant
        }
      }
      .toDF("media_id", "payload")
    val feats = Images.imageFeatures(spark, payloads).toDF()
      .filter(col("decoded"))
      .select(col("mediaId").as("id"), col("dHash").as("sig"))
      .persist()
    val (nFeats, decodeSec) = timed(feats.count())
    println(f"PROBE decode: $nFeats images in $decodeSec%.2f s")
    val nSigs = feats.select("sig").distinct().count()
    println(s"PROBE distinct sigs: $nSigs")
    val banded = feats
      .select(col("id"), explode(H.simhashBands(col("sig"))).as("b"))
      .select(col("id"), col("b.band"), col("b.bucket"))
      .persist()
    banded.count()
    val occ = banded.groupBy("band", "bucket").count().persist()
    occ.agg(count(lit(1)).as("n_buckets"), max("count").as("max_occ"),
        avg("count").as("avg_occ"),
        expr("percentile(count, 0.999)").as("p999_occ"))
      .show(truncate = false)
    // expected self-join fan-out: sum over buckets of occ^2/2
    occ.agg(round(sum(col("count") * col("count")) / 2e6, 1)
        .as("join_rows_millions")).show()
    val cands = banded.select(col("band"), col("bucket"), col("id").as("id_a"))
      .join(banded.select(col("band"), col("bucket"), col("id").as("id_b")),
        Seq("band", "bucket"))
      .filter(col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b"))
    val (nCandRaw, candSec) = timed(cands.count())
    println(f"PROBE raw cand rows: $nCandRaw in $candSec%.2f s")
    val (nCand, distinctSec) = timed(cands.distinct().count())
    println(f"PROBE distinct cands: $nCand in $distinctSec%.2f s")
    val (nPairs, verifySec) = timed(
      Images.phashPairs(spark, payloads, maxHamming = 3).count())
    println(f"PROBE full phashPairs: $nPairs pairs in $verifySec%.2f s (incl re-decode)")
    spark.stop()
  }
}
