package graft

import graft.operators.Similarity
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Round-11 LSH recall probe (dev tool): measures, on the fixed gate
  * corpus, the recall of lshTopK / lshIndexTopK vs the exact
  * brute-force top-10 across (planes, maxBitDiff) settings — the data
  * for choosing parameters that honestly meet the >= k/2
  * recall-contract floor (the r10 ann_ivf oracle pattern).
  * `tools/runmain.sh graft.R11Probe [sfDir]`.
  */
object R11Probe {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.01")
    val spark = SparkSession.builder().master("local[16]")
      .config("spark.sql.shuffle.partitions", "16")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    graft.plans.GraftExtensions.ensureRegistered(spark)
    val embs = Tables.embeddings(spark, dir)
    val corpus = embs.filter(col("vec_id") =!= 0)
    val q = embs.filter(col("vec_id") === 0)
    val exact = Similarity.bruteForceTopK(corpus, q, "vec_id", "embedding",
        k = 10).select("vec_id", "cos").collect()
      .map(r => (r.getLong(0), r.getDouble(1)))
    println(s"[probe] exact top-10 cos range: ${exact.map(_._2).min} .. " +
      s"${exact.map(_._2).max}")
    val truth = exact.map(_._1).toSet
    for (planes <- Seq(6, 8, 10, 12); bd <- Seq(1, 2, 3, 4)) {
      val ids = Similarity.lshTopK(corpus, q, "vec_id", "embedding",
          k = 10, planes = planes, maxBitDiff = bd)
        .select("vec_id").collect().map(_.getLong(0)).toSet
      val hits = (ids & truth).size
      println(f"[probe] lshTopK planes=$planes%2d maxBitDiff=$bd " +
        f"n_found=${ids.size}%2d hits=$hits%2d")
    }
    // stored index is built at planes=6 by the gate query
    val idxDir = java.nio.file.Files.createTempDirectory("probe_lsh").toString
    Similarity.buildLshIndex(corpus, "vec_id", "embedding", idxDir, planes = 6)
    for (bd <- Seq(1, 2, 3, 4)) {
      val ids = Similarity.lshIndexTopK(spark, idxDir, q, "vec_id",
          "embedding", k = 10, maxBitDiff = bd)
        .select("vec_id").collect().map(_.getLong(0)).toSet
      val hits = (ids & truth).size
      println(f"[probe] lshIndexTopK planes=6 maxBitDiff=$bd " +
        f"n_found=${ids.size}%2d hits=$hits%2d")
    }
    spark.stop()
  }
}
