package graft

import graft.operators.{Dedup, SigPairs}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Phase probe for the SigPairs-backed simhash path (dev tool, the
  * PhashProbe pattern): times signature computation, the intra
  * clump join, the banded cross join, and the expansion separately
  * against a testdata dir, so a kernel-level slowdown can be
  * attributed to a phase instead of guessed at.
  * `tools/runmain.sh graft.SimhashProbe <sfDir>`.
  */
object SimhashProbe {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/repo/testdata-sf1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def t(label: String)(f: => Long): Unit = {
      val t0 = System.nanoTime()
      val n = f
      println(f"[probe] $label%-28s ${(System.nanoTime() - t0) / 1e9}%8.2f s  ($n rows)")
    }
    val docs = Tables.documents(spark, dir)
    val sigs = Dedup.simhashSignatures(docs, "doc_id", "text").persist()
    t("signatures (pin cache)") { sigs.count() }
    t("signatures (cached reread)") { sigs.count() }
    val intra = sigs.select(col("sig"), col("id").as("id_a"))
      .join(sigs.select(col("sig"), col("id").as("id_b")), Seq("sig"))
      .filter(col("id_a") < col("id_b"))
    t("intra clump join") { intra.count() }
    val distinctSigs = sigs.select(col("sig")).distinct()
    t("distinct sigs") { distinctSigs.count() }
    t("full hammingPairs") {
      SigPairs.hammingPairs(sigs, maxHamming = 3).count()
    }
    t("full simhashPairs (query)") {
      Dedup.simhashPairs(docs, "doc_id", "text").count()
    }
    spark.stop()
  }
}
