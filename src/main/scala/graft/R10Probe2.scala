package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Round-10 follow-up probe: is knn_join's best_cos the TRUE nearest
  * neighbor cosine for every id (recall@1 == 1.0 on the gate corpus)?
  * And per-k neighbor-set recall vs exact. `tools/runmain.sh graft.R10Probe2 [sfDir]`.
  */
object R10Probe2 {
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
    val knn = graft.operators.Ann.knnJoin(embs, "vec_id", "embedding", k = 3)
      .groupBy(col("id_a"))
      .agg(max(col("cos")).as("best_cos"))
    // exact best neighbor per id via the block-pair kernel at a low
    // threshold (catches everything): max cos per id over all pairs
    val pairs = graft.operators.Dedup.embeddingPairs(embs, "vec_id", "embedding",
      minCosine = -0.999)
    val exactBest = pairs.select(col("id_a").as("id"), col("cos"))
      .union(pairs.select(col("id_b").as("id"), col("cos")))
      .groupBy(col("id")).agg(max(col("cos")).as("exact_best"))
    val joined = knn.join(exactBest, knn("id_a") === exactBest("id"))
      .select(col("id_a"), col("best_cos"), col("exact_best"))
    val n = joined.count()
    val nEq = joined.filter(col("best_cos") === col("exact_best")).count()
    println(s"[probe] knn_join best_cos == exact nearest: $nEq / $n")
    joined.filter(col("best_cos") =!= col("exact_best"))
      .orderBy((col("exact_best") - col("best_cos")).desc).show(10)
    spark.stop()
  }
}
