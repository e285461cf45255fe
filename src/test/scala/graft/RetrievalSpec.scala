package graft

import graft.operators.Retrieval
import org.apache.spark.sql.functions._

/** BM25 keyword retrieval + reciprocal-rank fusion. The gate query
  * binds the exact scores vs DuckDB; these specs pin the RANKING
  * semantics a score-hash can't explain when it breaks: idf ordering,
  * tf monotonicity, length normalization, fusion arithmetic.
  */
class RetrievalSpec extends SparkSpec {
  import org.apache.spark.sql.DataFrame

  private def corpus: DataFrame = {
    val s = spark
    import s.implicits._
    Seq(
      (1L, "cat cat cat dog"),          // tf(cat)=3, dl=4
      (2L, "cat dog bird fish mouse"),  // tf(cat)=1, dl=5
      (3L, "cat dog"),                  // tf(cat)=1, dl=2 (shorter than 2)
      (4L, "dog dog dog dog"),          // no query terms beyond 'dog'
      (5L, "zebra yak"),                // matches nothing
      (6L, null.asInstanceOf[String]),  // dropped
      (7L, "   ")                       // dropped
    ).toDF("doc_id", "text")
  }

  test("bm25: tf monotonicity, length normalization, no-match exclusion") {
    val top = Retrieval.bm25TopK(corpus, "doc_id", "text",
      Seq("cat", "zebra"), k = 10).collect()
    val ids = top.map(_.getLong(0))
    // doc 5 (zebra, rare term: df=1 vs df(cat)=3 of 5 scored docs) must
    // outrank every cat-only doc — idf dominates
    assert(ids.head == 5L, s"rare-term doc should rank first, got ${ids.toSeq}")
    val byId = top.map(r => r.getLong(0) -> r.getLong(2)).toMap
    // tf monotonicity at comparable dl: doc1 (tf=3) > doc2 (tf=1)
    assert(byId(1L) > byId(2L))
    // length normalization: doc3 (tf=1, dl=2) > doc2 (tf=1, dl=5)
    assert(byId(3L) > byId(2L))
    // docs with zero query-term matches are excluded entirely
    assert(!byId.contains(4L) && !byId.contains(6L) && !byId.contains(7L))
    // n_terms counts matched terms: doc5 matched only 'zebra'
    assert(top.find(_.getLong(0) == 5L).get.getLong(1) == 1L)
  }

  test("bm25: deterministic under repartitioning (integer stats, fixed-order sum)") {
    val a = Retrieval.bm25TopK(corpus, "doc_id", "text", Seq("cat"), 10)
      .collect().map(r => (r.getLong(0), r.getLong(2))).toSeq
    val b = Retrieval.bm25TopK(corpus.repartition(7), "doc_id", "text", Seq("cat"), 10)
      .collect().map(r => (r.getLong(0), r.getLong(2))).toSeq
    assert(a == b)
  }

  test("graft_term_counts kernel is bit-identical to the HOF words() formulation") {
    val s = spark
    import s.implicits._
    graft.plans.GraftExtensions.ensureRegistered(spark)
    val tricky = Seq(
      "cat cat cat dog", "  leading and   trailing  ", "\tcat\ndog\r\nCATcat\f",
      "CAT Cat cAt", "\u00fanico ca\u00f1\u00f3n CAT", "catapult concat cat", "cat",
      "a\u00a0cat and cat", // NBSP is NOT Java \s: 'a\u00a0cat' stays one token
      "12345 #$%! cat-dog cat_dog", "\u00df \u0130 I i", "word " * 200 + "cat"
    ).zipWithIndex.map { case (t, i) => (i.toLong, t) }.toDF("id", "text")
    val terms = Seq("cat", "dog", "\u00fanico")
    val kernel = Retrieval.withTermFrequencies(tricky, "text", terms)
      .select(col("id"), col("dl"),
        col("tf_cat"), col("tf_dog"), col("`tf_\u00fanico`"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4))).toSet
    val w = graft.functions.TextFunctions.words(col("text"))
    val hofCols: Seq[org.apache.spark.sql.Column] =
      Seq(col("id"), size(w).cast("long").as("dl")) ++
        terms.map(t =>
          size(filter(w, x => x === lit(t))).cast("long").as(s"tf_$t"))
    val hof = tricky
      .filter(col("text").isNotNull && length(trim(col("text"))) > 0)
      .select(hofCols: _*)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4))).toSet
    assert(kernel == hof, s"kernel vs HOF diverged:\n${kernel -- hof}\n${hof -- kernel}")
    // a whitespace-containing term can never equal a token: rejected
    // loudly instead of silently counting zero forever
    val e = intercept[Exception] {
      Retrieval.withTermFrequencies(tricky, "text", Seq("a cat")).collect()
    }
    assert(e.getMessage.contains("whitespace"), e.getMessage)
  }

  test("bm25: term-count precondition is loud") {
    val many = (1 to 17).map(i => s"t$i")
    val e = intercept[IllegalArgumentException] {
      Retrieval.withTermFrequencies(corpus, "text", many)
    }
    assert(e.getMessage.contains("17"))
  }

  test("bm25BatchTopK: single-term query equals the inline-column path exactly") {
    val s = spark
    import s.implicits._
    // for ONE term the batch form's per-term e6 quantization and the
    // inline form's whole-score e6 quantization coincide, so the two
    // paths must agree to the last integer
    val q = Seq((7L, "cat")).toDF("query_id", "term")
    val batch = Retrieval.bm25BatchTopK(corpus, "doc_id", "text", q, k = 10)
      .collect().map(r => (r.getLong(1), r.getLong(2), r.getLong(3))).toSeq.sorted
    val single = Retrieval.bm25TopK(corpus, "doc_id", "text", Seq("cat"), 10)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq.sorted
    assert(batch == single)
  }

  test("bm25BatchTopK: per-query isolation, absent terms contribute nothing") {
    val s = spark
    import s.implicits._
    val q = Seq((1L, "cat"), (2L, "cat"), (2L, "qqqabsent")).toDF("query_id", "term")
    val out = Retrieval.bm25BatchTopK(corpus, "doc_id", "text", q, k = 10)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    // an absent term changes NOTHING: queries 1 and 2 rank identically
    val q1 = out.filter(_._1 == 1L).map(t => (t._2, t._3, t._4)).toSeq.sorted
    val q2 = out.filter(_._1 == 2L).map(t => (t._2, t._3, t._4)).toSeq.sorted
    assert(q1 == q2 && q1.nonEmpty)
    // rk is 1-based and dense per query
    val rks = Retrieval.bm25BatchTopK(corpus, "doc_id", "text", q, k = 10)
      .filter(col("query_id") === 1L).collect().map(_.getLong(4)).sorted
    assert(rks.toSeq == (1L to rks.length).toSeq)
  }

  test("distinctiveTerms: group-exclusive words outrank shared ones; minDf drops hapax") {
    val s = spark
    import s.implicits._
    val df = Seq(
      (1L, "a", "alpha common filler"),
      (2L, "a", "alpha common other"),
      (3L, "a", "common other filler"),
      (4L, "b", "beta common filler"),
      (5L, "b", "beta common other"),
      (6L, "b", "common hapaxword filler")
    ).toDF("doc_id", "grp", "text")
    val out = Retrieval.distinctiveTerms(df, "grp", "doc_id", "text", k = 2)
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(5)))
    // 'alpha' is exclusive to a (coverage 2/3, idf ln(6/2)); 'common'
    // covers everything but idf ln(6/6)=0 -> score 0. Exclusive wins.
    assert(out.contains(("a", "alpha", 1L)))
    assert(out.contains(("b", "beta", 1L)))
    // hapaxword has df 1 < minDf 2 and must be absent entirely
    assert(!out.exists(_._2 == "hapaxword"))
    // layout invariance
    val again = Retrieval.distinctiveTerms(df.repartition(7), "grp", "doc_id", "text", 2)
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(5)))
    assert(again.toSet == out.toSet)
  }

  test("graft_word_ngrams: multiplicity kept, document order, short doc empty") {
    val s = spark
    import s.implicits._
    graft.plans.GraftExtensions.ensureRegistered(spark)
    val df = Seq(
      (1L, "cat dog cat dog"), // 'cat dog' occurs twice (overlapping walk)
      (2L, "cat"),             // shorter than n=2 -> ZERO bigram occurrences
      (3L, "a b c")
    ).toDF("id", "text")
    val out = df.select(col("id"),
        graft.functions.TextFunctions.ngramsOfWords(
          graft.functions.TextFunctions.words(col("text")), 2).as("bg"))
      .collect().map(r => r.getLong(0) -> r.getSeq[String](1).toList).toMap
    assert(out(1L) == List("cat dog", "dog cat", "cat dog"),
      s"expected multiplicity + order, got ${out(1L)}")
    assert(out(2L) == Nil, "short doc must yield zero n-gram occurrences")
    assert(out(3L) == List("a b", "b c"))
    // contrast with the distinct shingle form: dedup + whole-text fallback
    val sh = df.select(col("id"),
        graft.functions.TextFunctions.shingles(col("text"), 2).as("sh"))
      .collect().map(r => r.getLong(0) -> r.getSeq[String](1).toList).toMap
    assert(sh(1L) == List("cat dog", "dog cat") && sh(2L) == List("cat"))
  }

  test("bm25BatchTopK: phrase terms match adjacency, not co-occurrence") {
    val s = spark
    import s.implicits._
    val docs = Seq(
      (1L, "cat dog cat dog"),   // 'cat dog' tf=2
      (2L, "cat dog bird"),      // 'cat dog' tf=1
      (3L, "cat bird dog"),      // both words, NEVER adjacent -> no match
      (4L, "dog cat")            // reverse order only -> no match
    ).toDF("doc_id", "text")
    val q = Seq((1L, "cat dog")).toDF("query_id", "term")
    val out = Retrieval.bm25BatchTopK(docs, "doc_id", "text", q, k = 10)
      .collect().map(r => (r.getLong(1), r.getLong(3)))
    val ids = out.map(_._1).toSet
    assert(ids == Set(1L, 2L), s"adjacency must decide membership, got $ids")
    // tf monotonicity carries over to the phrase grain (equal dl here
    // would be ideal; dl 4 vs 3 slightly favors doc 2, tf 2 vs 1 wins)
    val byId = out.toMap
    assert(byId(1L) > byId(2L))
    // a phrase whose words all exist but are never adjacent scores on
    // NO doc — and a mixed unigram+bigram query still ranks
    val q2 = Seq((1L, "bird cat"), (2L, "bird"), (2L, "cat dog"))
      .toDF("query_id", "term")
    val out2 = Retrieval.bm25BatchTopK(docs, "doc_id", "text", q2, k = 10)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(!out2.exists(_._1 == 1L), "never-adjacent phrase must match nothing")
    assert(out2.filter(_._1 == 2L).map(_._2).toSet == Set(1L, 2L, 3L))
  }

  test("bm25BatchTopK: phrase grain precondition is loud; unigram batches unchanged") {
    val s = spark
    import s.implicits._
    val q = Seq((1L, "a b c d e")).toDF("query_id", "term")
    val e = intercept[IllegalArgumentException] {
      Retrieval.bm25BatchTopK(corpus, "doc_id", "text", q, k = 5).collect()
    }
    assert(e.getMessage.contains("1..4"), e.getMessage)
    // an all-unigram batch must not pay any n-gram generation: the
    // analyzed plan contains no graft_word_ngrams call
    val uq = Seq((1L, "cat")).toDF("query_id", "term")
    val plan = Retrieval.bm25BatchTopK(corpus, "doc_id", "text", uq, k = 5)
      .queryExecution.analyzed.toString
    assert(!plan.contains("graft_word_ngrams"), "unigram batch grew an n-gram stream")
  }

  test("hybrid_rank_fusion_indexed gate query: IVF partition pruning + contract row") {
    val sf0001 = "/root/testdata/sf0.001"
    val df = SparkEntry.queries("hybrid_rank_fusion_indexed")(spark, sf0001)
    // the vector leg must probe the STORED index through partition
    // pruning — the nprobe list filter lands on the scan, so the
    // executed plan's index scan lists only probed directories
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters: [list_id"),
      s"vector leg not partition-pruned:\n${plan.take(4000)}")
    val row = df.collect()
    assert(row.length == 1)
    val r = row.head
    assert(r.getLong(0) == 100L)
    assert(r.getLong(1) > 0L && r.getLong(1) <= 100L, s"n_kw ${r.getLong(1)}")
    assert(r.getLong(2) == 100L, s"n_vec ${r.getLong(2)}")
    assert(r.getBoolean(3) && r.getBoolean(4), "leg ranks not a dense 1..n")
    assert(r.getBoolean(5), "vector-leg recall below the 0.5 contract floor")
  }

  test("rrfFuse: exact contributions, full-outer semantics") {
    val s = spark
    import s.implicits._
    val a = Seq((10L, 1L), (20L, 2L)).toDF("item_id", "rank")
    val b = Seq((20L, 1L), (30L, 2L)).toDF("item_id", "rank")
    val out = Retrieval.rrfFuse(a, b, "item_id").collect()
      .map(r => r.getLong(0) -> r.getLong(3)).toMap
    def e6(x: Double) = math.floor(x * 1000000.0 + 0.5).toLong
    // both legs: 1/(60+2) + 1/(60+1)
    assert(out(20L) == e6(1.0 / 62 + 1.0 / 61))
    // single leg: missing side contributes exactly 0
    assert(out(10L) == e6(1.0 / 61))
    assert(out(30L) == e6(1.0 / 62))
  }
}
