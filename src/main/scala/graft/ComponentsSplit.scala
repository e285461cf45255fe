package graft

import graft.operators.Dedup
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev tool for SCALING.md: splits dedup_components' cost into the
  * exact O(n^2) pair kernel (the DECLARED all-pairs baseline —
  * embeddingPairs at minCosine 0.4) vs the large-star/small-star
  * label-propagation loop, and counts the edges the generator's
  * identity-copy embeddings produce (threshold pairs grow
  * quadratically with SF by design, mirroring the driver's ladder).
  * `runMain graft.ComponentsSplit <sfDir>`.
  */
object ComponentsSplit {
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
    def timed[A](f: => A): (A, Double) = {
      val t0 = System.nanoTime()
      val a = f
      (a, (System.nanoTime() - t0) / 1e9)
    }
    val emb = Tables.embeddings(spark, sfDir)
    val nVec = emb.count()
    // warm the scan so the kernel timing isn't also first-read I/O
    val pairsDf = Dedup.embeddingPairs(emb, "vec_id", "embedding", minCosine = 0.4)
    val (nEdges, kernelSec) = timed(pairsDf.count())
    val pairs = pairsDf.persist()
    pairs.count() // materialize outside the loop timing
    val (nComponents, loopSec) =
      timed(Dedup.components(pairs, strategy = "loop")
        .select(col("label")).distinct().count())
    println(
      f"""{"sf":"$sfDir","n_vectors":$nVec,"n_edges":$nEdges,""" +
        f""""kernel_sec":$kernelSec%.2f,"loop_sec":$loopSec%.2f,""" +
        f""""components":$nComponents}""")
    spark.stop()
  }
}
