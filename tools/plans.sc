import org.apache.spark.sql.SparkSession
val spark = SparkSession.builder().master("local[8]").config("spark.sql.shuffle.partitions","8").config("spark.sql.session.timeZone","UTC").config("spark.ui.enabled","false").getOrCreate()
spark.sparkContext.setLogLevel("ERROR")
val d = "/root/testdata/sf0.001"
val names = Seq("q1_agg","q5_multijoin","q3_topn","asof_join","sessionize","dedup_minhash","dedup_embedding_lsh","knn_join","ann_bruteforce","etl_ingest_pipeline","etl_failure_log","sample_stratified","text_chunk")
val sb = new StringBuilder("# Physical plans (explain formatted) — audit snapshot, sf0.001\n\nRegenerate with `sbt \"Test/console\" < tools/plans.sc`.\n")
names.foreach { n => sb.append(s"\n## $n\n\n```\n"); sb.append(graft.SparkEntry.queries(n)(spark, d).queryExecution.explainString(org.apache.spark.sql.execution.FormattedMode).take(4000)); sb.append("\n```\n") }
java.nio.file.Files.writeString(java.nio.file.Paths.get("/root/repo/PLANS.md"), sb.toString)
println("WROTE PLANS")
sys.exit(0)
