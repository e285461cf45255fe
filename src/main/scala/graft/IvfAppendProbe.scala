package graft

import graft.operators.{Ann, Similarity}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** IVF append-lifecycle measurement (dev tool, r10 judge ask #5):
  * builds an index on half the corpus, appends the rest in 10
  * batches against the FROZEN quantizer, and at checkpoints measures
  *  - per-list file proliferation (the probe-side cost of appends),
  *  - recall@10 of the frozen-quantizer index vs brute force,
  *  - recall@10 of an index REBUILT (retrained) on the same rows —
  *    the drift the frozen quantizer trades for append cheapness,
  * then compacts the appended index and re-checks file counts and
  * probe identity. Results land in SCALING.md.
  * `tools/runmain.sh graft.IvfAppendProbe [sfDir]`.
  */
object IvfAppendProbe {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/repo/testdata-sf10")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    graft.plans.GraftExtensions.ensureRegistered(spark)
    // vec_ids are NOT contiguous at the ladder rungs (ScaleUp shifts
    // them) — split by hash bucket, not id value
    val embs = Tables.embeddings(spark, dir)
      .withColumn("__b", pmod(xxhash64(col("vec_id")), lit(20)))
      .persist()
    val n = embs.count()
    println(s"[probe] corpus $dir: $n vectors")
    val qIds = embs.orderBy(col("vec_id")).limit(8)
      .select("vec_id").collect().map(_.getLong(0))
    val qFrames = qIds.map(id => id -> embs.filter(col("vec_id") === id))

    def fileCount(path: String): Long = {
      val root = new org.apache.hadoop.fs.Path(path)
      val fs = root.getFileSystem(spark.sparkContext.hadoopConfiguration)
      fs.listStatus(root)
        .filter(d => d.isDirectory && d.getPath.getName.startsWith("list_id="))
        .map(d => fs.listStatus(d.getPath)
          .count(f => f.isFile && f.getPath.getName.endsWith(".parquet")).toLong)
        .sum
    }
    // recall@10 averaged over the query set, against brute force on
    // `corpus` (the rows visible at this point in the lifecycle)
    def recall(probe: DataFrame => DataFrame, corpus: DataFrame): Double = {
      val scores = qFrames.map { case (id, q) =>
        val exact = Similarity.bruteForceTopK(
            corpus.filter(col("vec_id") =!= id), q, "vec_id", "embedding", 10)
          .select("vec_id").collect().map(_.getLong(0)).toSet
        val got = probe(q).select("vec_id").collect().map(_.getLong(0)).toSet
        (got intersect exact).size / 10.0
      }
      scores.sum / scores.length
    }

    val idxDir = java.nio.file.Files.createTempDirectory("ivfap_idx").toString
    val initial = embs.filter(col("__b") < 10).drop("__b")
    val t0 = System.nanoTime()
    Ann.buildIvfIndex(initial, "vec_id", "embedding", idxDir, nlist = 16)
    println(f"[probe] initial build (${initial.count()} rows): ${(System.nanoTime()-t0)/1e9}%.1f s, files=${fileCount(idxDir)}")

    for (b <- 0 until 10) {
      val batch = embs.filter(col("__b") === 10 + b).drop("__b")
      val tb = System.nanoTime()
      Ann.appendIvfIndex(batch, "vec_id", "embedding", idxDir)
      val appendSecs = (System.nanoTime() - tb) / 1e9
      val visible = embs.filter(col("__b") <= 10 + b).drop("__b")
      if (b == 0 || b == 4 || b == 9) {
        val rFrozen = recall(q => Ann.ivfIndexTopK(spark, idxDir, q,
          "vec_id", "embedding", k = 10, nprobe = 8)
          .filter(!col("vec_id").isin(qIds: _*)), visible)
        val rebuildDir = java.nio.file.Files.createTempDirectory("ivfap_rb").toString
        Ann.buildIvfIndex(visible, "vec_id", "embedding", rebuildDir, nlist = 16)
        val rRebuilt = recall(q => Ann.ivfIndexTopK(spark, rebuildDir, q,
          "vec_id", "embedding", k = 10, nprobe = 8)
          .filter(!col("vec_id").isin(qIds: _*)), visible)
        println(f"[probe] after batch ${b + 1}: append $appendSecs%.2f s, " +
          f"files=${fileCount(idxDir)}, recall frozen=$rFrozen%.3f rebuilt=$rRebuilt%.3f")
      }
    }
    val outDir = java.nio.file.Files.createTempDirectory("ivfap_cmp").toString
    val tc = System.nanoTime()
    val stats = Ann.compactIvfIndex(spark, idxDir, outDir)
    val filesIn = stats.map(_._2.filesIn).sum
    val filesOut = stats.map(_._2.filesOut).sum
    val q0 = qFrames.head._2
    val a = Ann.ivfIndexTopK(spark, idxDir, q0, "vec_id", "embedding", 10, 8)
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
    val bb = Ann.ivfIndexTopK(spark, outDir, q0, "vec_id", "embedding", 10, 8)
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
    println(f"[probe] compact: ${(System.nanoTime()-tc)/1e9}%.1f s, " +
      f"files $filesIn -> $filesOut, probe identical=${a == bb}")
    spark.stop()
  }
}
