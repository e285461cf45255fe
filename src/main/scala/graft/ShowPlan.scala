package graft

import org.apache.spark.sql.SparkSession

/** Dev tool: print the executed physical plan of one gate query —
  * `runMain graft.ShowPlan <sfDir> <query> [maxChars]`.
  */
object ShowPlan {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val name = args(1)
    val maxChars = if (args.length > 2) args(2).toInt else 8000
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "16")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val df = SparkEntry.queries(name)(spark, sfDir)
    val n = df.count()
    println(s"[plan] $name rows=$n hash=${PlanHash.fingerprint(df)}")
    println(df.queryExecution.executedPlan.toString.take(maxChars))
    spark.stop()
  }
}
