package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.plans.GraftExtensions

/** Scratch decomposition of the R14BloomAb gap: times xxhash64-only,
  * builtin-probe-with-tiny-filter, builtin-probe-with-full-filter,
  * and the UDF probe, on the same persisted frame — isolates
  * expression overhead vs filter-size (cache-miss) cost.
  * Dev tool; superseded by whatever SCALING.md r14 records.
  */
object R14BloomProfile {
  def main(args: Array[String]): Unit = {
    val n = (if (args.length > 0) args(0).toInt else 10) * 1000000L
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    GraftExtensions.ensureRegistered(spark)

    val frame = spark.range(n)
      .select(md5(concat(lit("fp"), col("id").cast("string"))).as("fp"))
      .repartition(32).persist()
    frame.count()

    def bloomBytes(items: Long): Array[Byte] = {
      val sk = spark.range(items)
        .select(xxhash64(md5(concat(lit("fp"), col("id").cast("string")))).as("h"))
        .stat.bloomFilter("h", math.max(items, 16), 0.01)
      val bos = new java.io.ByteArrayOutputStream()
      sk.writeTo(bos); bos.toByteArray
    }
    val tiny = bloomBytes(1000)
    val full = bloomBytes(n / 2)
    val bcFull = spark.sparkContext.broadcast(
      frame.limit(1).count() match { case _ =>
        val sk = spark.range(n / 2)
          .select(md5(concat(lit("fp"), col("id").cast("string"))).as("fp"))
          .stat.bloomFilter("fp", n / 2, 0.01)
        sk
      })
    val udfProbe = udf((fp: String) => bcFull.value.mightContainString(fp))

    def t(label: String)(body: => Long): Unit = {
      body // warm
      val samples = (1 to 3).map { _ =>
        val t0 = System.nanoTime(); body; (System.nanoTime() - t0) / 1e9
      }
      println(f"$label%-28s median=${samples.sorted.apply(1)}%.3f  all=${samples.map(v => f"$v%.3f").mkString(",")}")
    }

    t("count only")(frame.count())
    t("xxhash64 parity")(frame.filter(xxhash64(col("fp")) % 2 === 0).count())
    t("builtin tiny filter")(frame.filter(
      call_function("graft_bloom_might_contain", lit(tiny), xxhash64(col("fp")))).count())
    t("builtin full filter")(frame.filter(
      call_function("graft_bloom_might_contain", lit(full), xxhash64(col("fp")))).count())
    t("udf full filter")(frame.filter(udfProbe(col("fp"))).count())
    frame.filter(call_function("graft_bloom_might_contain",
      lit(full), xxhash64(col("fp")))).explain("formatted")
    spark.stop()
  }
}
