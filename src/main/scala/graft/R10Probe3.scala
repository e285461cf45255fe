package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** r10 follow-up: LSH top-k recall vs exact brute force at the gate
  * corpus — decides whether ann_lsh/ann_lsh_indexed can carry the
  * ann_ivf-style recall-contract oracle.
  * `tools/runmain.sh graft.R10Probe3 [sfDir]`.
  */
object R10Probe3 {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.01")
    val spark = SparkSession.builder().master("local[16]")
      .config("spark.sql.shuffle.partitions", "16")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    graft.plans.GraftExtensions.ensureRegistered(spark)
    val embs = Tables.embeddings(spark, dir)
    val others = embs.filter(col("vec_id") =!= 0)
    val q = embs.filter(col("vec_id") === 0)
    def ids(df: org.apache.spark.sql.DataFrame): Set[Long] =
      df.select(col("vec_id").cast("long")).collect().map(_.getLong(0)).toSet
    val bf = ids(graft.operators.Similarity.bruteForceTopK(
      others, q, "vec_id", "embedding", k = 10))
    val lsh = ids(graft.operators.Similarity.lshTopK(
      others, q, "vec_id", "embedding", k = 10))
    println(s"[probe] ann_lsh: found=${lsh.size} hits=${(lsh intersect bf).size}/10")
    val idxDir = java.nio.file.Files.createTempDirectory("p3_lsh").toString
    graft.operators.Similarity.buildLshIndex(others, "vec_id", "embedding",
      idxDir, planes = 6)
    val lshIdx = ids(graft.operators.Similarity.lshIndexTopK(spark, idxDir,
      q, "vec_id", "embedding", k = 10, maxBitDiff = 2))
    println(s"[probe] ann_lsh_indexed: found=${lshIdx.size} hits=${(lshIdx intersect bf).size}/10")
    spark.stop()
  }
}
