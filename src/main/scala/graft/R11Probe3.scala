package graft

import graft.operators.Dedup
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Round-11 soft-dedup clump probe (dev tool): softWeights' scaladoc
  * claims the groupBy+join shape survives a million-copy clump
  * because AQE splits the skewed join side. Measure it: 1 M rows of
  * ONE identical text plus 100 k distinct rows — the groupBy is
  * map-side combined (no skew reaches the reducer) and the join's
  * skewed probe side is AQE-split. Prints wall time and the
  * per-partition row spread of the join stage output.
  * `tools/runmain.sh graft.R11Probe3`.
  */
object R11Probe3 {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.skewJoin.enabled", "true")
      // a 1M-row text clump is ~60 MB — under AQE's default 256 MB
      // skew threshold, so the default run shows the clump landing in
      // ONE task (fine at this size). args(0) = "skew" lowers the
      // thresholds to model the BILLION-copy regime where the clump
      // crosses them, and asserts AQE then actually splits it.
      .config("spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes",
        if (args.contains("skew")) "8m" else "256m")
      .config("spark.sql.adaptive.advisoryPartitionSizeInBytes",
        if (args.contains("skew")) "4m" else "64m")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._
    val clump = spark.range(0, 1000000L)
      .select(col("id").as("doc_id"),
        lit("the exact same boilerplate page repeated a million times")
          .as("text"))
    val distinctDocs = spark.range(2000000L, 2100000L)
      .select(col("id").as("doc_id"),
        concat(lit("unique document number "), col("id").cast("string"))
          .as("text"))
    val docs = clump.unionByName(distinctDocs).persist()
    docs.count()
    val t0 = System.nanoTime()
    val out = Dedup.softWeights(docs, "doc_id", "text").persist()
    val n = out.count()
    val secs = (System.nanoTime() - t0) / 1e9
    val byW = out.groupBy(col("weight_e6")).count()
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    println(f"[probe] softWeights 1M-clump + 100k distinct: $secs%.1f s, rows=$n")
    println(s"[probe] weight histogram: $byW (expect 1 -> 1000000, 1000000 -> 100000)")
    // partition spread of the joined output: AQE's skew split means
    // no single task held the whole clump
    val spread = out.rdd.mapPartitions(it => Iterator(it.size)).collect()
    println(f"[probe] output partitions=${spread.length} max=${spread.max} " +
      f"mean=${spread.sum / spread.length}")
    println("[probe] plan:\n" +
      Dedup.softWeights(docs, "doc_id", "text")
        .queryExecution.executedPlan.toString.take(3000))
    spark.stop()
  }
}
