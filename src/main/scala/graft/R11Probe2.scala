package graft

import graft.multimodal.{Audio, Images}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Round-11 multimodal planted-recovery probe (dev tool): on the
  * fixed gate corpora, how many of the planted re-encode pairs
  * (base id, 1e8 + id for every 5th doc) land in the SAME connected
  * component of the perceptual star-edge frame — the data for
  * deciding whether mm_phash_dedup / mm_audio_dedup can carry a
  * planted-recovery contract oracle (full equality or a floored
  * share). `tools/runmain.sh graft.R11Probe2 [sfDir]`.
  */
object R11Probe2 {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.01")
    val spark = SparkSession.builder().master("local[16]")
      .config("spark.sql.shuffle.partitions", "16")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    graft.plans.GraftExtensions.ensureRegistered(spark)
    def recovery(name: String, edges: org.apache.spark.sql.DataFrame): Unit = {
      val (nPlanted, co) =
        graft.queries.SourceQueries.plantedRecovery(spark, dir, edges)
      println(s"[probe] $name: planted=$nPlanted co-component=$co")
    }
    recovery("phash",
      Images.phashStarEdges(spark,
        graft.queries.SourceQueries.imageDedupPayloads(spark, dir),
        maxHamming = 3))
    recovery("audio",
      Audio.audioStarEdges(spark,
        graft.queries.SourceQueries.audioDedupPayloads(spark, dir),
        maxHamming = 3))
    spark.stop()
  }
}
