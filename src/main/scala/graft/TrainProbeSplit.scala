package graft

import org.apache.spark.sql.SparkSession

/** Dev tool for SCALING.md: separates quantizer TRAINING cost from
  * probe cost for the non-indexed ANN queries. With the per-(dir,
  * params) memoization in SimilarityQueries, the FIRST invocation in
  * a JVM trains + probes and every later one probes against the
  * cached quantizer — so timing call 1 vs call 2 in a fresh JVM is
  * exactly the labeled train+probe / probe split the scaling ladder
  * reports. `runMain graft.TrainProbeSplit <sfDir> [query...]`.
  */
object TrainProbeSplit {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val names = if (args.length > 1) args.drop(1).toSeq
                else Seq("ann_ivf", "ann_pq")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // one unrelated query as JVM warm-up so call 1 isn't also paying
    // first-ever codegen/classload costs
    SparkEntry.queries("q1_agg")(spark, sfDir).count()
    val parts = names.map { n =>
      val fn = SparkEntry.queries(n)
      def timed(): Double = {
        val t0 = System.nanoTime()
        fn(spark, sfDir).count()
        (System.nanoTime() - t0) / 1e9
      }
      val trainProbe = timed() // trains: quantizer cache is cold
      val probe = timed()      // cached quantizer: assign/encode + probe
      f""""$n":{"train_probe":$trainProbe%.3f,"probe":$probe%.3f}"""
    }
    println(parts.mkString("{", ",", s""","sf":"$sfDir"}"""))
    spark.stop()
  }
}
