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
    // knnJoin recall: single-bucket vs multi-probe (bitDiff <= 1),
    // measured against exact per-id top-3 (the gate query's k)
    {
      import org.apache.spark.sql.expressions.Window
      import spark.implicits._
      val sample = corpus.limit(2000).persist(); sample.count()
      val w = Window.partitionBy(col("id_a"))
        .orderBy(col("cos").desc, col("id_b"))
      def pairsOf(df: org.apache.spark.sql.DataFrame) = df
        .select(col("id_a"), col("id_b")).as[(Long, Long)].collect().toSet
      // exact: brute-force all-pairs on the 200-row sample
      val ex = sample.select(col("vec_id").as("id_a"), col("embedding").as("va"))
        .crossJoin(sample.select(col("vec_id").as("id_b"), col("embedding").as("vb")))
        .filter(col("id_a") =!= col("id_b"))
        .select(col("id_a"), col("id_b"),
          expr("graft_cosine(va, vb)").as("cos"))
        .filter(!isnan(col("cos")))
        .withColumn("rk", row_number().over(w)).filter(col("rk") <= 3)
      val truth = pairsOf(ex)
      for (pb <- Seq(0, 1)) {
        val got = pairsOf(graft.operators.Ann.knnJoin(
          sample, "vec_id", "embedding", k = 3, probeBits = pb))
        val rec = (got & truth).size.toDouble / truth.size
        println(f"[probe] knnJoin probeBits=$pb recall@3=$rec%.3f " +
          f"(pairs=${got.size})")
      }
      sample.unpersist(blocking = false)
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
