package graft

import org.apache.spark.sql.SparkSession

/** Ad-hoc single-query timer: `runMain graft.TimeQuery <sfDir> <iters> <query...>`.
  * Same session shape as [[Bench]]; prints one line per timed run and
  * a median per query. Development tool — the driver-facing benchmark
  * stays [[Bench]].
  */
object TimeQuery {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val iters = args(1).toInt
    val names = args.drop(2)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.skewJoin.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    names.foreach { name =>
      val fn = SparkEntry.queries(name)
      fn(spark, sfDir).count() // warm
      val times = (1 to iters).map { i =>
        val t0 = System.nanoTime()
        val n = fn(spark, sfDir).count()
        val t = (System.nanoTime() - t0) / 1e9
        println(f"[time] $name iter=$i rows=$n sec=$t%.3f")
        t
      }
      println(f"[time] $name MEDIAN ${times.sorted.apply(times.length / 2)}%.3f")
    }
    spark.stop()
  }
}
