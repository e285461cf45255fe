package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Probe: smallest PQ re-rank shortlist that covers the exact top-10
  * at a rung (dev measurement harness — the evidence behind ann_pq's
  * corpus-proportional shortlist; see SimilarityQueries).
  * Usage: runMain graft.PqShortlistProbe [sfDir]
  */
object PqShortlistProbe {
  def main(args: Array[String]): Unit = {
    val d = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val embs = Tables.embeddings(spark, d).filter(col("vec_id") =!= 0)
    val n = embs.count()
    val cb = graft.operators.Pq.train(embs, "embedding", m = 16, ksub = 32, iters = 10)
    val encoded = graft.operators.Pq.encode(embs, "vec_id", "embedding", cb)
    val q = Tables.embeddings(spark, d).filter(col("vec_id") === 0)
    val exact = graft.operators.Similarity
      .bruteForceTopK(embs, q, "vec_id", "embedding", k = 10)
      .select("vec_id").collect().map(_.getLong(0)).toSet
    for (sl <- (Seq(100L, 150L, n / 20, n / 10, n / 5)
        .map(math.max(100L, _)).distinct.sorted)) {
      val got = graft.operators.Pq
        .searchRefined(encoded, embs, q, "vec_id", "embedding", cb,
          k = 10, shortlist = sl.toInt)
        .select("vec_id").collect().map(_.getLong(0)).toSet
      println(s"[pqprobe] n=$n shortlist=$sl covered=${(exact & got).size}/10 " +
        s"exactmatch=${got == exact}")
    }
    spark.stop()
  }
}
