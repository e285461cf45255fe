package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.FormattedMode

/** Regenerates PLANS.md — the physical-plan audit snapshot for the
  * representative query set (`runMain graft.PlanAudit`). Dev tool;
  * replaces the old REPL script (tools/plans.sc), which hit Scala
  * console classloader bugs once the query set grew.
  */
object PlanAudit {
  val names: Seq[String] = Seq(
    "q1_agg", "q5_multijoin", "q3_topn", "asof_join", "sessionize",
    "dedup_minhash", "dedup_embedding_lsh", "knn_join", "ann_bruteforce",
    "etl_ingest_pipeline", "etl_failure_log", "sample_stratified",
    "text_chunk", "ann_bruteforce_batch", "dedup_embedding_lsh_strict",
    "etl_pattern_route", "dedup_resolve", "ann_ivf_indexed",
    "pack_windows", "mix_token_budget",
    "q4_exists", "q17_scalar", "window_range_frame",
    "freq_ngrams", "text_decontaminate", "text_repetition", "semdedup",
    "layout_partition_prune", "incr_agg", "resample_ffill",
    "cdc_apply", "text_lm_score", "ann_pq",
    "skew_join", "q18_bigcust", "window_ntile", "quality_outliers",
    "etl_profile", "window_sliding_distinct", "mix_temperature",
    "ann_pq_indexed")

  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val d = "/root/testdata/sf0.001"
    val sb = new StringBuilder(
      "# Physical plans (explain formatted) — audit snapshot, sf0.001\n\n" +
        "Regenerate with `tools/runmain.sh graft.PlanAudit` (after `sbt compile`).\n")
    names.foreach { n =>
      sb.append(s"\n## $n\n\n```\n")
      sb.append(SparkEntry.queries(n)(spark, d).queryExecution
        .explainString(FormattedMode).take(4000))
      sb.append("\n```\n")
    }
    java.nio.file.Files.writeString(
      java.nio.file.Paths.get("/root/repo/PLANS.md"), sb.toString)
    println(s"[plans] wrote ${names.length} sections")
    spark.stop()
  }
}
