package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Manual scale probe (not a spec): runs the pair-generation-heavy
  * operators on a 10x self-union of the sf0.1 tables to smoke-check
  * that nothing blows up quadratically beyond the inherent pair
  * volume. `sbt "Test/runMain graft.ScaleProbe"`. Numbers are noisy
  * run-to-run (shared JVM, GC) — read them as order-of-magnitude.
  */

object ScaleProbe {
  def time[T](label: String)(f: => T): T = {
    val t0 = System.nanoTime(); val r = f
    println(f"TIMING $label ${(System.nanoTime() - t0) / 1e9}%.2f s"); r
  }
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", 32).getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val d = "/root/testdata/sf0.1"
    // 10x documents (50k docs) with distinct ids
    val docs0 = Tables.documents(spark, d).select(col("doc_id"), col("text"))
    val docs = (0 until 10).map(i =>
      docs0.select((col("doc_id") + lit(i * 1000000L)).as("doc_id"), col("text")))
      .reduce(_ union _)
    println("docs " + docs.count())
    time("minhash_pairs_10x")(graft.operators.Dedup.minhashPairs(docs, "doc_id", "text").filter(col("est_jaccard") >= 0.5).count())
    // 10x embeddings (20k vecs)
    val e0 = Tables.embeddings(spark, d).select(col("vec_id"), col("embedding"))
    val embs = (0 until 10).map(i =>
      e0.select((col("vec_id") + lit(i * 1000000L)).as("vec_id"), col("embedding")))
      .reduce(_ union _)
    println("embs " + embs.count())
    time("embedding_lsh_10x")(graft.operators.Dedup.embeddingPairsLsh(embs, "vec_id", "embedding", 0.4, 0.98).count())
    time("embedding_exact_10x")(graft.operators.Dedup.embeddingPairs(embs, "vec_id", "embedding", 0.4).count())
    time("knn_join_10x")(graft.operators.Ann.knnJoin(embs, "vec_id", "embedding", k = 3).count())
    spark.stop()
  }
}
