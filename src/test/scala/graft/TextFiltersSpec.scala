package graft

import graft.operators.TextFilters
import org.apache.spark.sql.functions._

class TextFiltersSpec extends SparkSpec {
  import spark.implicits._

  // 12-word base doc; clones share all its 5-grams
  private val evalDoc = "alpha bravo charlie delta echo foxtrot golf hotel " +
    "india juliet kilo lima"
  private val unrelated = "mike november oscar papa quebec romeo sierra " +
    "tango uniform victor whiskey xray"
  private val paraphrase = "totally new opening here " + evalDoc

  test("decontaminate removes exact members, clones and paraphrases; keeps unrelated") {
    val bench = Seq((100L, evalDoc)).toDF("doc_id", "text")
    val corpus = Seq(
      (1L, evalDoc),      // exact leak
      (2L, paraphrase),   // prefix paraphrase leak
      (3L, unrelated),    // clean
      (4L, unrelated + " extra tail words appended here")
    ).toDF("doc_id", "text")
    val kept = TextFilters.decontaminate(corpus, bench, "doc_id", "text", n = 5)
      .select("doc_id").as[Long].collect().sorted
    assert(kept.toSeq == Seq(3L, 4L), s"kept ${kept.toSeq}")
  }

  test("decontaminate corpus side is never shuffled by the joins (broadcast semi+anti)") {
    val bench = Seq((100L, evalDoc)).toDF("doc_id", "text")
    val corpus = Seq((1L, evalDoc), (3L, unrelated)).toDF("doc_id", "text")
    val plan = TextFilters.decontaminate(corpus, bench, "doc_id", "text", n = 5)
      .queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"), plan)
    assert(!plan.toLowerCase.contains("sortmergejoin"), plan)
  }

  test("repetition stats: repeated-word doc fails, varied doc passes") {
    val repetitive = ("spam " * 10).trim + " one two three" // top word 10/13
    val varied = unrelated                                  // all distinct
    val docs = Seq((1L, repetitive), (2L, varied)).toDF("doc_id", "text")
    val out = TextFilters.repetitionStats(docs, "doc_id", "text")
      .orderBy("doc_id").collect()
    val rep = out(0)
    assert(rep.getAs[Long]("n_words") == 13L)
    assert(rep.getAs[Long]("top_word_n") == 10L)
    assert(rep.getAs[Long]("passes") == 0L)
    // dup bigrams: 12 total, distinct = {spam spam}x1 + spam one,
    // one two, two three = 4 distinct -> frac (12-4)/12
    assert(math.abs(rep.getAs[Double]("dup_2gram_frac") - 8.0 / 12.0) < 1e-3)
    val ok = out(1)
    assert(ok.getAs[Long]("passes") == 1L)
    assert(ok.getAs[Double]("dup_2gram_frac") == 0.0)
  }

  test("single-word doc: zero distinct bigrams, top fraction 1") {
    val docs = Seq((1L, "solo")).toDF("doc_id", "text")
    val r = TextFilters.repetitionStats(docs, "doc_id", "text").collect().head
    assert(r.getAs[Long]("n_words") == 1L)
    assert(r.getAs[Double]("top_word_frac") == 1.0)
    // denominator guard: greatest(n_words-1, 1) avoids 0-division
    assert(r.getAs[Double]("dup_2gram_frac") == 1.0)
  }

  test("boilerplate fraction isolates the shared shingle mass") {
    // one 3-gram ("common shared phrase") planted across 5 docs,
    // private tails keep the rest unique
    val docs = (1L to 5L).map(i =>
        (i, s"common shared phrase tail$i word$i extra$i more$i"))
      .toDF("doc_id", "text")
    val out = TextFilters
      .boilerplateFraction(docs, "doc_id", "text", n = 3, minDf = 5L)
      .orderBy("doc_id").collect()
    assert(out.length == 5)
    out.foreach { r =>
      // 5 shingles per doc (7 words), exactly 1 corpus-frequent
      assert(r.getAs[Long]("n_shingles") == 5L, r.toString)
      assert(r.getAs[Long]("n_frequent") == 1L, r.toString)
      assert(r.getAs[Double]("boilerplate_frac") == 0.2, r.toString)
    }
  }

  test("shingleDocFreq counts document frequency, not occurrence count") {
    // "dup dup dup dup" has one DISTINCT 2-gram; df must be 1 per doc
    val docs = Seq((1L, "dup dup dup dup"), (2L, "dup dup other")).toDF("doc_id", "text")
    val df = TextFilters.shingleDocFreq(docs, "text", n = 2, minDf = 1L)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(df("dup dup") == 2L)
    assert(df("dup other") == 1L)
  }
}
