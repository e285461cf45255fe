package graft

import graft.operators.{Ann, Similarity}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** IVF frozen-quantizer drift under a SHIFTED append distribution
  * (dev tool, r11 judge ask #5). The r10 lifecycle measured
  * stationary appends and found no drift — the case the contract
  * predicts is safe. This probe measures the unsafe case: appended
  * vectors are drawn from a region the quantizer never saw
  * (base vectors offset by +1.5 in the first 8 dims — a new cluster
  * direction), queries come from the SAME shifted region (the
  * fresh-data-queries-fresh-data regime that exposes drift), and at
  * checkpoints we compare recall@10 of the frozen index vs an index
  * RETRAINED on the visible rows, plus the occupancy skew of the
  * frozen lists (shifted mass crowds into few lists — the
  * probe-cost face of the same drift). Results land in SCALING.md;
  * the derived retrain trigger goes into Ann's scaladoc.
  * `tools/runmain.sh graft.R11DriftProbe [sfDir]`.
  */
object R11DriftProbe {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/repo/testdata-sf10")
    val nprobe = args.drop(1).headOption.map(_.toInt).getOrElse(4)
    val mag = args.drop(2).headOption.map(_.toDouble).getOrElse(1.5)
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    graft.plans.GraftExtensions.ensureRegistered(spark)

    // columns normalized up front: the index and every append batch
    // must share one schema (the raw table carries a label column)
    val base = Tables.embeddings(spark, dir)
      .select(col("vec_id"), col("embedding")).persist()
    val nBase = base.count()
    println(s"[probe] base corpus $dir: $nBase vectors, nprobe=$nprobe/16, shift=$mag")

    // shifted distribution: +1.5 on the first 8 dims — a direction no
    // base cluster occupies, so the frozen quantizer has no list "for"
    // it; id offset derived from the observed max (ladder rungs shift
    // ids into the billions — a fixed 1e9 offset collided at sf100)
    val idBase = base.agg(max(col("vec_id"))).head().getLong(0) + 1L
    def shifted(src: DataFrame, batchNo: Int): DataFrame = src.select(
      // orig < idBase, so idBase-spaced blocks cannot collide across
      // batches or with the base population
      (col("vec_id") + idBase * (batchNo + 1).toLong).as("vec_id"),
      expr("transform(embedding, (x, i) -> " +
        s"CAST(x + CASE WHEN i < 8 THEN $mag ELSE 0.0 END AS FLOAT))")
        .as("embedding"))

    // 10 append batches of 5% of base each, all from the shifted
    // distribution (hash-split so batches are disjoint)
    val bucketed = base.withColumn("__b", pmod(xxhash64(col("vec_id")), lit(20)))
    def batch(b: Int): DataFrame =
      shifted(bucketed.filter(col("__b") === b).drop("__b"), b)

    // queries: 8 fixed vectors from the shifted region (batch 0 ids)
    val qIds = batch(0).orderBy(col("vec_id")).limit(8)
      .select("vec_id").collect().map(_.getLong(0))

    // returns (mean recall@10, total probe seconds for the 8 queries)
    // — the probe TIME is the cost face of drift: a crowded frozen
    // list makes every probe scan it, recall or no recall
    def recallAndCost(idxDir: String, visible: DataFrame): (Double, Double) = {
      var probeSecs = 0.0
      val scores = qIds.map { id =>
        val q = visible.filter(col("vec_id") === id)
        val exact = Similarity.bruteForceTopK(
            visible.filter(col("vec_id") =!= id), q, "vec_id", "embedding", 10)
          .select("vec_id").collect().map(_.getLong(0)).toSet
        val tp = System.nanoTime()
        val got = Ann.ivfIndexTopK(spark, idxDir, q, "vec_id", "embedding",
            k = 10, nprobe = nprobe)
          .filter(col("vec_id") =!= id)
          .select("vec_id").collect().map(_.getLong(0)).toSet
        probeSecs += (System.nanoTime() - tp) / 1e9
        (got intersect exact).size / 10.0
      }
      (scores.sum / scores.length, probeSecs)
    }
    // occupancy share of the fullest list — the skew face of drift
    def maxListShare(idxDir: String): Double = {
      val occ = spark.read.parquet(idxDir)
        .groupBy(col("list_id")).agg(count(lit(1)).as("n"))
        .select("n").collect().map(_.getLong(0))
      occ.max.toDouble / occ.sum
    }

    val idxDir = java.nio.file.Files.createTempDirectory("drift_idx").toString
    val t0 = System.nanoTime()
    Ann.buildIvfIndex(base, "vec_id", "embedding", idxDir, nlist = 16)
    println(f"[probe] frozen index built on base: ${(System.nanoTime()-t0)/1e9}%.1f s, maxListShare=${maxListShare(idxDir)}%.3f")

    var visible = base
    for (b <- 0 until 10) {
      val bat = batch(b).persist()
      Ann.appendIvfIndex(bat, "vec_id", "embedding", idxDir)
      visible = visible.unionByName(bat)
      if (Seq(0, 2, 4, 9).contains(b)) {
        val vis = visible.persist(); val nVis = vis.count()
        val (rF, cF) = recallAndCost(idxDir, vis)
        val rebuildDir =
          java.nio.file.Files.createTempDirectory("drift_rb").toString
        Ann.buildIvfIndex(vis, "vec_id", "embedding", rebuildDir, nlist = 16)
        val (rR, cR) = recallAndCost(rebuildDir, vis)
        val shiftedShare = 1.0 - nBase.toDouble / nVis
        println(f"[probe] after batch ${b + 1}: shifted mass " +
          f"${shiftedShare * 100}%.1f%% of $nVis rows; recall@10 " +
          f"frozen=$rF%.3f rebuilt=$rR%.3f; probe 8q frozen=$cF%.2f s " +
          f"rebuilt=$cR%.2f s; maxListShare frozen=" +
          f"${maxListShare(idxDir)}%.3f rebuilt=${maxListShare(rebuildDir)}%.3f")
      }
    }
    spark.stop()
  }
}
