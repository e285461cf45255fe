package graft

import graft.operators.LmScore
import org.apache.spark.sql.functions._

class LmScoreSpec extends SparkSpec {
  import spark.implicits._

  private val corpus = Seq(
    (1L, "a b a b"),
    (2L, "a b c")).toDF("id", "text")

  /** Independent reference: same math, hand-rolled from raw maps. */
  private def refScore(doc: Seq[String], ug: Map[String, Long],
                       bg: Map[String, Long], v: Long): Double = {
    val lps = doc.sliding(2).map { case Seq(w1, w2) =>
      math.log((bg.getOrElse(s"$w1 $w2", 0L) + 1.0) / (ug.getOrElse(w1, 0L) + v))
    }.toSeq
    lps.sum / lps.length
  }

  private val ug = Map("a" -> 3L, "b" -> 3L, "c" -> 1L)
  private val bg = Map("a b" -> 3L, "b a" -> 1L, "b c" -> 1L)

  test("train counts unigrams/bigrams and the exact vocabulary") {
    val m = LmScore.train(corpus, "text")
    assert(m.unigrams == ug)
    assert(m.bigrams == bg)
    assert(m.vocabSize == 3L)
  }

  test("score matches the reference model, incl. OOV backoff") {
    val m = LmScore.train(corpus, "text")
    val docs = Seq((1L, "a b a b"), (2L, "b c"), (3L, "z q")).toDF("id", "text")
    val out = LmScore.score(docs, "text", m)
      .select(col("id"), col("n_bigrams"), col("lm_score"))
      .collect().map(r => r.getLong(0) -> (r.getInt(1), r.getDouble(2))).toMap
    assert(out(1L)._1 == 3)
    assert(math.abs(out(1L)._2 - refScore(Seq("a", "b", "a", "b"), ug, bg, 3)) < 1e-12)
    assert(math.abs(out(2L)._2 - refScore(Seq("b", "c"), ug, bg, 3)) < 1e-12)
    // fully OOV: every bigram backs off to ln(1/V)
    assert(math.abs(out(3L)._2 - math.log(1.0 / 3)) < 1e-12)
  }

  test("short/empty/null docs get null score and 0 bigrams") {
    val m = LmScore.train(corpus, "text")
    val docs = Seq((1L, "solo"), (2L, ""), (3L, null.asInstanceOf[String]))
      .toDF("id", "text")
    val out = LmScore.score(docs, "text", m)
      .select(col("id"), col("n_bigrams"), col("lm_score"))
      .collect().map(r => r.getLong(0) -> (r.getInt(1), r.isNullAt(2))).toMap
    assert(out(1L) == ((0, true)))
    assert(out(2L) == ((0, true)))
    assert(out(3L) == ((0, true)))
  }

  test("streaming quality gate: batch-trained LM scores and routes a doc stream") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val m = LmScore.train(corpus, "text")
    // in-corpus text scores ln(4/6)-ish; fully-OOV gibberish scores
    // ln(1/3); a threshold between them separates deterministically
    val fluentScore = LmScore.score(Seq((0L, "a b a b")).toDF("id", "text"),
      "text", m).select("lm_score").head.getDouble(0)
    val junkScore = math.log(1.0 / 3)
    val thr = (fluentScore + junkScore) / 2
    assert(fluentScore > thr && junkScore < thr)

    val dir = java.nio.file.Files.createTempDirectory("graft_qgate").toString
    val in = MemoryStream[(Long, String)]
    val q = graft.streaming.StreamIngest.qualityGatedSink(
      in.toDF().toDF("id", "text"), "text", m, thr,
      s"$dir/pass", s"$dir/reject", s"$dir/ckpt").start()
    in.addData((1L, "a b a b"), (2L, "zz qq xx"), (3L, ""))
    q.processAllAvailable(); q.stop()

    val pass = spark.read.parquet(s"$dir/pass").select("id")
      .collect().map(_.getLong(0)).toSet
    val reject = spark.read.parquet(s"$dir/reject").select("id")
      .collect().map(_.getLong(0)).toSet
    assert(pass == Set(1L))
    assert(reject == Set(2L, 3L)) // gibberish below thr; empty unscorable

    // at-least-once REPLAY of the same batch (fresh checkpoint, same
    // data -> same batch id): the per-batch overwrite dirs must
    // clobber, not duplicate
    val in2 = MemoryStream[(Long, String)]
    val q2 = graft.streaming.StreamIngest.qualityGatedSink(
      in2.toDF().toDF("id", "text"), "text", m, thr,
      s"$dir/pass", s"$dir/reject", s"$dir/ckpt_replay").start()
    in2.addData((1L, "a b a b"), (2L, "zz qq xx"), (3L, ""))
    q2.processAllAvailable(); q2.stop()
    assert(spark.read.parquet(s"$dir/pass").count() == 1,
      "replayed batch must not duplicate passing rows")
    assert(spark.read.parquet(s"$dir/reject").count() == 2,
      "replayed batch must not duplicate rejected rows")
  }

  test("quality gate fails fast on a flat-append legacy output dir") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val m = LmScore.train(corpus, "text")
    val dir = java.nio.file.Files.createTempDirectory("graft_qgate_flat").toString
    // a pre-r5 flat-append layout: root-level parquet files in outDir
    Seq((9L, "old")).toDF("id", "text").write.parquet(s"$dir/pass")
    val in = MemoryStream[(Long, String)]
    val e = intercept[IllegalStateException] {
      graft.streaming.StreamIngest.qualityGatedSink(
        in.toDF().toDF("id", "text"), "text", m, 0.0,
        s"$dir/pass", s"$dir/reject", s"$dir/ckpt")
    }
    assert(e.getMessage.contains("flat-append"), e.getMessage)
    // the existing data was not touched
    assert(spark.read.parquet(s"$dir/pass").count() == 1)
  }

  test("maxTable truncates deterministically; tail grams back off to 0") {
    val m = LmScore.train(corpus, "text", maxTable = 1)
    // unigram tie a/b at 3 breaks lexicographically -> keep 'a';
    // bigram 'a b' (3) is the unique top
    assert(m.unigrams == Map("a" -> 3L))
    assert(m.bigrams == Map("a b" -> 3L))
    assert(m.vocabSize == 3L) // vocab counted before truncation
    val out = LmScore.score(Seq((1L, "b c")).toDF("id", "text"), "text", m)
      .select(col("lm_score")).head().getDouble(0)
    // 'b c' truncated away (c=0) and 'b' truncated away (u=0): ln(1/3)
    assert(math.abs(out - math.log(1.0 / 3)) < 1e-12)
  }
}
