package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.operators.Retrieval

/** Calibrates the topic router's refresh-due metric (r14 judge ask
  * #8): the router's statistics are FROZEN at sink construction (the
  * replay contract), so the open question was the staleness story —
  * how fast does routing degrade as the corpus distribution shifts
  * away from the reference snapshot, and does the cheap per-batch
  * `df_drift_e6` metric track the degradation well enough to drive a
  * refresh cadence?
  *
  * Method: a deterministic two-topic corpus (dataeng/media
  * vocabularies + filler). The reference snapshot mixes them 50/50.
  * Shift level s ∈ {0, 0.1, …, 0.9} produces a corpus where media
  * vocabulary progressively saturates every doc (the "my crawl
  * changed under me" direction). For each level, every doc is scored
  * twice — once with the FROZEN reference stats (what the deployed
  * router does) and once with FRESH stats computed on the shifted
  * corpus itself (what a just-refreshed router would do) — and the
  * probe reports:
  *
  *   - df_drift_e6: the shipped metric (max |batch df-rate − ref
  *     df-rate| over the shared terms)
  *   - reroute_pct: % of docs whose best topic differs frozen-vs-fresh
  *     (the TRUE staleness cost)
  *   - unmatched_pct under frozen stats (the visible symptom)
  *
  * `tools/runmain.sh graft.R15TopicDriftProbe [docsPerLevel]`.
  * One JSON line; the SCALING "topic-router staleness" table and the
  * default refreshDfDriftE6 threshold derive from it. Dev tool.
  */
object R15TopicDriftProbe {
  private val dataengV = Seq("spark", "shuffle", "join", "partition", "query")
  private val mediaV = Seq("image", "audio", "pixel", "frame", "codec")
  private val filler = Seq("alpha", "beta", "gamma", "delta", "epsilon",
    "zeta", "eta", "theta", "iota", "kappa")
  private val topics = Seq("dataeng" -> dataengV.take(3), "media" -> mediaV.take(3))
  private val allTerms = topics.flatMap(_._2).distinct

  /** Doc i at shift s. Four populations, i-formula-deterministic:
    * every 5th doc is MIXED (both vocabularies, media slightly
    * heavier by count — the decision-boundary class whose argmax
    * depends on the RELATIVE idf of the two vocabularies, which is
    * exactly what staleness corrupts); the rest are the reference
    * mixture (dataeng-ish / media-ish / filler thirds), and past the
    * shift point the non-mixed population becomes media-saturated
    * (df-rate of every media term → 1, collapsing its fresh idf).
    */
  private def doc(i: Int, s: Double, n: Int): String = {
    val mixed = i % 5 == 4
    val shifted = !mixed && i < (s * n).toInt
    val words =
      if (mixed)
        // 5 dataeng + 6 media + 1 filler: media wins on tf while the
        // two vocabularies' idf is comparable, dataeng wins once
        // media idf collapses — the flip the fresh-vs-frozen diff
        // must expose
        (0 until 5).map(j => dataengV((i * 31 + j * 7) % 3)) ++
          (0 until 6).map(j => mediaV((i * 17 + j * 11) % 3)) ++
          Seq(filler(i % filler.size))
      else (0 until 12).map { j =>
        val h = i * 31 + j * 7
        if (shifted) {
          if (j % 3 == 2) filler(h % filler.size)
          else mediaV(h % mediaV.size)
        } else if (i % 3 == 2) filler(h % filler.size)
        else if (i % 2 == 0) {
          if (j % 2 == 0) dataengV(h % dataengV.size) else filler(h % filler.size)
        } else {
          if (j % 2 == 0) mediaV(h % mediaV.size) else filler(h % filler.size)
        }
      }
    words.mkString(" ")
  }

  def main(args: Array[String]): Unit = {
    val n = args.headOption.map(_.toInt).getOrElse(20000)
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "16")}]")
      .config("spark.sql.shuffle.partitions", "16")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._

    def corpus(s: Double): DataFrame =
      spark.range(n.toLong).select(col("id").as("doc_id"))
        .as[Long].map(i => (i, doc(i.toInt, s, n))).toDF("doc_id", "text")

    def stats(c: DataFrame) = Retrieval.corpusStats(
      Retrieval.withTermFrequencies(c, "text", allTerms, 64), allTerms)

    val ref = corpus(0.0)
    val frozen = stats(ref).collect()(0)
    val frozenDf = spark.createDataFrame(
      java.util.Arrays.asList(frozen), stats(ref).schema)

    def route(c: DataFrame, statsDf: DataFrame): DataFrame = {
      val scored = Retrieval.withTermFrequencies(c, "text", allTerms, 64)
        .crossJoin(broadcast(statsDf))
      val withScores = topics.foldLeft(scored) { case (acc, (name, ts)) =>
        val (sc, _) = Retrieval.scoreExprs(ts)
        acc.withColumn(s"__sc_$name", floor(sc * 1000000.0 + 0.5).cast("long"))
      }
      val (bestScore, bestTopic) = topics.tail.foldLeft(
        (col(s"__sc_${topics.head._1}"), lit(topics.head._1))) {
        case ((bs, bt), (name, _)) =>
          val sc = col(s"__sc_$name")
          (when(sc > bs, sc).otherwise(bs),
            when(sc > bs, lit(name)).otherwise(bt))
      }
      withScores.select(col("doc_id"),
        when(bestScore >= 100000L, bestTopic).otherwise(lit("unmatched"))
          .as("topic"))
    }

    val refN = frozen.getAs[Long]("n_docs").toDouble
    val rows = (0 to 9).map { lvl =>
      val s = lvl / 10.0
      val c = corpus(s).persist()
      val fresh = stats(c).collect()(0)
      val bN = math.max(1L, fresh.getAs[Long]("n_docs")).toDouble
      val drift = allTerms.map(t =>
        math.abs(fresh.getAs[Long](s"df_$t") / bN -
          frozen.getAs[Long](s"df_$t") / refN)).max
      val freshDf = spark.createDataFrame(
        java.util.Arrays.asList(fresh), stats(c).schema)
      val both = route(c, frozenDf).withColumnRenamed("topic", "t_frozen")
        .join(route(c, freshDf).withColumnRenamed("topic", "t_fresh"),
          Seq("doc_id"))
        .persist()
      val total = both.count().toDouble
      val rerouted = both.filter(col("t_frozen") =!= col("t_fresh")).count()
      val unmatched = both.filter(col("t_frozen") === "unmatched").count()
      both.unpersist(false); c.unpersist(false)
      val out = (s, math.floor(drift * 1e6 + 0.5).toLong,
        math.floor(rerouted / total * 10000 + 0.5) / 100.0,
        math.floor(unmatched / total * 10000 + 0.5) / 100.0)
      println(s"[probe] shift=$s df_drift_e6=${out._2} " +
        s"reroute_pct=${out._3} unmatched_pct=${out._4}")
      out
    }
    val table = rows.map { case (s, d, r, u) => s"""[$s,$d,$r,$u]""" }
      .mkString(",")
    println(s"""{"probe":"topic_drift","docs_per_level":$n,""" +
      s""""levels_shift_driftE6_reroutePct_unmatchedPct":[$table]}""")
    spark.stop()
  }
}
