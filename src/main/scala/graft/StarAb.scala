package graft

import org.apache.spark.sql.SparkSession

import graft.operators.SigPairs
import graft.multimodal.{Audio, Images}
import graft.queries.SourceQueries

/** Exclusive A/B of the SigPairs output forms on the mm bench
  * corpora: pair-list ([[graft.operators.SigPairs.hammingPairs]]) vs
  * star-edge GROUP contract
  * ([[graft.operators.SigPairs.hammingStarEdges]]), per modality.
  *
  * `runMain graft.StarAb <sfDir> [iters]` — run on an idle machine
  * (CPU contention inflates results 45%, r5 measurement). The
  * (id, sig) feats frame is computed ONCE per modality, persisted and
  * materialized before any timing starts, so the decode cost —
  * identical by construction between the two forms — is excluded and
  * the measured delta is the kernel alone. One untimed warm-up per
  * form, then the median of `iters` (default 3) timed passes, same
  * steady-state procedure as [[Bench]]. Output: one JSON line on
  * stdout, also written to SPARK_GRAFT_AB_OUT if set.
  *
  * Dev tool for scaling experiments — not part of the library surface.
  */
object StarAb {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val iters = if (args.length > 1) args(1).toInt else 3
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.skewJoin.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    // median-of-iters steady-state timing; returns (seconds, rows)
    def timed(body: => Long): (Double, Long) = {
      val warm = body
      val samples = (1 to iters).map { _ =>
        val t0 = System.nanoTime()
        val n = body
        ((System.nanoTime() - t0) / 1e9, n)
      }
      (samples.map(_._1).sorted.apply(samples.length / 2), warm)
    }

    def modality(buildFeats: => org.apache.spark.sql.DataFrame)
        : Map[String, Any] = {
      val feats = buildFeats.persist()
      val t0 = System.nanoTime()
      val nFeats = feats.count()
      val featsSec = (System.nanoTime() - t0) / 1e9
      val (pairsSec, pairsRows) =
        timed(SigPairs.hammingPairs(feats, maxHamming = 3).count())
      val (starSec, starRows) =
        timed(SigPairs.hammingStarEdges(feats, maxHamming = 3).count())
      feats.unpersist(blocking = true)
      spark.catalog.clearCache()
      Map(
        "n_feats" -> nFeats, "feats_build_s" -> featsSec,
        "pairs_s" -> pairsSec, "pairs_rows" -> pairsRows,
        "star_s" -> starSec, "star_rows" -> starRows)
    }

    val image = modality(
      Images.dhashFeats(spark, SourceQueries.imageDedupPayloads(spark, sfDir)))
    val audio = modality(
      Audio.ehashFeats(spark, SourceQueries.audioDedupPayloads(spark, sfDir)))

    def json(m: Map[String, Any]): String =
      m.map {
        case (k, v: Double) => s""""$k":${"%.3f".format(v)}"""
        case (k, v) => s""""$k":$v"""
      }.mkString("{", ",", "}")
    val line =
      s"""{"sf":"$sfDir","iters":$iters,"image":${json(image)},"audio":${json(audio)}}"""
    println(line)
    sys.env.get("SPARK_GRAFT_AB_OUT").foreach { p =>
      try java.nio.file.Files.write(java.nio.file.Paths.get(p),
        (line + "\n").getBytes("UTF-8"))
      catch {
        case e: Throwable =>
          System.err.println(s"[starab] could not write $p: ${e.getMessage}")
      }
    }
    spark.stop()
  }
}
