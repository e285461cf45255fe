package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.operators.Dedup

/** Prices [[Dedup.components]]' strategy crossover (the r14 adaptive
  * path): the SAME persisted edge frame the dedup_components /
  * dedup_resolve gate queries consume, labeled by
  *
  *   - loop  — the distributed large-star/small-star alternation
  *             (~10 Spark jobs of per-round fixed cost; the 100 TB
  *             path, where the dup graph never fits one machine)
  *   - local — ONE job materializes the deduped edge checkpoint, the
  *             driver union-finds it (O(E α(E))), labels return as a
  *             LocalRelation
  *
  * The two label tables are asserted IDENTICAL before any timing is
  * reported. Median of `iters` steady passes after one warm-up per
  * mode, [[StarAb]] discipline. The auto threshold
  * (localEdgeThreshold = 1e6 edges ≈ 40 MB of specialized collected
  * tuples + ~50 MB of union-find state on the driver — JVM headers
  * counted, see componentsLocal) sits far right of the crossover this
  * measures — the loop's ~10-job fixed cost only amortizes once
  * rounds carry real shuffle volume.
  *
  * `runMain graft.R14StratAb <sfDir> [iters]` on an idle machine.
  * Output: one JSON line (also to SPARK_GRAFT_AB_OUT if set).
  *
  * Dev tool for scaling experiments — not part of the library surface.
  */
object R14StratAb {
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

    val edgeDir = java.nio.file.Files
      .createTempDirectory("graft_strat_ab_edges").toString
    Dedup.embeddingPairs(Tables.embeddings(spark, sfDir),
        "vec_id", "embedding", minCosine = 0.4)
      .write.mode("overwrite").parquet(edgeDir)
    val edges = spark.read.parquet(edgeDir)
    val nEdges = edges.count()

    def checksum(strategy: String): (Long, Long, Long) = {
      val lab = Dedup.components(edges, strategy = strategy)
      val row = lab.agg(count(lit(1)), sum(col("id") * 31 + col("label")),
        sum(col("label"))).collect()(0)
      (row.getLong(0), row.getAs[Number](1).longValue(),
        row.getAs[Number](2).longValue())
    }
    def timed(strategy: String): (Double, Seq[Double]) = {
      checksum(strategy) // warm-up
      val samples = (1 to iters).map { _ =>
        val t0 = System.nanoTime()
        checksum(strategy)
        (System.nanoTime() - t0) / 1e9
      }
      (samples.sorted.apply(samples.length / 2), samples)
    }

    val loop = checksum("loop")
    val local = checksum("local")
    require(loop == local,
      s"label tables diverge between strategies: $loop vs $local")

    val (loopSec, loopAll) = timed("loop")
    val (localSec, localAll) = timed("local")
    val line = ("{" +
      s""""probe":"strat_ab","sf":"$sfDir","edges":$nEdges,""" +
      s""""labels":${loop._1},"iters":$iters,""" +
      s""""loop_sec":${f"$loopSec%.3f"},""" +
      s""""local_sec":${f"$localSec%.3f"},""" +
      s""""speedup":${f"${loopSec / localSec}%.2f"},""" +
      s""""loop_all":[${loopAll.map(v => f"$v%.3f").mkString(",")}],""" +
      s""""local_all":[${localAll.map(v => f"$v%.3f").mkString(",")}]}""")
    println(line)
    sys.env.get("SPARK_GRAFT_AB_OUT").foreach { p =>
      java.nio.file.Files.writeString(java.nio.file.Paths.get(p), line + "\n")
    }
    spark.stop()
  }
}
