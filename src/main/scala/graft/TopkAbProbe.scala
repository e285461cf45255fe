package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** A/B probe for the topk_group shape (dev measurement harness, not
  * library surface): the canonical WindowGroupLimit plan's per-task
  * LOCAL SORT is the suite's one measured log factor (alpha_2 = 1.06,
  * SCALING "three-decade exponent fit" — predicted 11.7x vs measured
  * 11.4x on 10x rows). This probe measures what an O(n) per-partition
  * bounded-heap kernel would buy at a given rung, and asserts the two
  * forms produce identical rows, so the decision to keep or replace
  * the canonical plan is a measured one.
  *
  * Usage: runMain graft.TopkAbProbe [sfDir] [iters]
  */
object TopkAbProbe {
  private val K = 3

  def windowForm(s: SparkSession, d: String): DataFrame = {
    val w = Window.partitionBy(col("o_orderpriority"))
      .orderBy(col("o_totalprice").desc, col("o_orderkey"))
    Tables.orders(s, d)
      .withColumn("rk", row_number().over(w).cast("long"))
      .filter(col("rk") <= K)
      .select(col("o_orderpriority"), col("rk"), col("o_orderkey"),
        round(col("o_totalprice"), 2).as("o_totalprice"))
      .orderBy(col("o_orderpriority"), col("rk"))
  }

  /** O(n) alternative: one mapPartitions pass keeps a K-bounded
    * best-first array per group per task (groups x K rows emitted per
    * task — bounded by construction), then the SAME window runs on
    * the tiny candidate frame. Exactness: the global top-K per group
    * under a deterministic total order is contained in the union of
    * per-partition top-Ks.
    */
  def heapForm(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val base = Tables.orders(s, d)
      .select(col("o_orderpriority"), col("o_totalprice"), col("o_orderkey"))
      .as[(String, Double, Long)]
    val cand = base.mapPartitions { rows =>
      import scala.collection.mutable
      // per-group arrays sorted best-first by (price desc, key asc);
      // K is single-digit, linear insertion wins over a real heap
      val tops = mutable.HashMap.empty[String, (Array[Double], Array[Long], Array[Int])]
      rows.foreach { case (g, price, key) =>
        val (ps, ks, nRef) = tops.getOrElseUpdate(g,
          (new Array[Double](K), new Array[Long](K), Array(0)))
        val n = nRef(0)
        if (n < K || price > ps(n - 1) ||
            (price == ps(n - 1) && key < ks(n - 1))) {
          var i = math.min(n, K - 1)
          while (i > 0 && (price > ps(i - 1) ||
              (price == ps(i - 1) && key < ks(i - 1)))) {
            ps(i) = ps(i - 1); ks(i) = ks(i - 1); i -= 1
          }
          ps(i) = price; ks(i) = key
          if (n < K) nRef(0) = n + 1
        }
      }
      tops.iterator.flatMap { case (g, (ps, ks, nRef)) =>
        (0 until nRef(0)).map(i => (g, ps(i), ks(i)))
      }
    }.toDF("o_orderpriority", "o_totalprice", "o_orderkey")
    val w = Window.partitionBy(col("o_orderpriority"))
      .orderBy(col("o_totalprice").desc, col("o_orderkey"))
    cand
      .withColumn("rk", row_number().over(w).cast("long"))
      .filter(col("rk") <= K)
      .select(col("o_orderpriority"), col("rk"), col("o_orderkey"),
        round(col("o_totalprice"), 2).as("o_totalprice"))
      .orderBy(col("o_orderpriority"), col("rk"))
  }

  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/repo/testdata-sf100")
    val iters = args.lift(1).map(_.toInt).getOrElse(3)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val a = windowForm(spark, dir).collect().map(_.toSeq).toSeq
    val b = heapForm(spark, dir).collect().map(_.toSeq).toSeq
    require(a == b, s"form mismatch: window=${a.take(5)} heap=${b.take(5)}")
    println(s"[topkab] forms identical (${a.length} rows)")

    def bench(name: String, f: () => Long): Unit = {
      val ts = (1 to iters).map { _ =>
        val t0 = System.nanoTime(); f(); (System.nanoTime() - t0) / 1e9
      }
      println(f"[topkab] $name median ${ts.sorted.apply(ts.length / 2)}%.2f s " +
        s"(${ts.map(t => f"$t%.2f").mkString(", ")})")
    }
    bench("window  ", () => windowForm(spark, dir).count())
    bench("heap    ", () => heapForm(spark, dir).count())
    spark.stop()
  }
}
