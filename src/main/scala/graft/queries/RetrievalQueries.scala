package graft.queries

import graft.Tables
import graft.operators.{Retrieval, Similarity}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Corpus-mining surface (SURVEY §2, similarity-search family): BM25
  * keyword retrieval and lexical+vector reciprocal-rank fusion — the
  * data-SELECTION primitives (find the documents about X) that
  * complement the similarity family's dedup/ANN primitives. The
  * reference has no retrieval surface (its one query is the audit
  * aggregation, `tasks_postgres.py:245`); a training-data pipeline
  * needs one for eval-set mining, topic targeting and contamination
  * triage.
  *
  * Both queries carry exact DuckDB oracles: integer corpus stats,
  * fixed-order scalar scoring, e6 quantization (see
  * operators/Retrieval.scala's determinism note).
  */
object RetrievalQueries {
  type Q = (SparkSession, String) => DataFrame

  /** Fixed query-term list: two common terms and one rare one
    * ('dup' appears in ~0.5% of docs at every rung), so the idf
    * spread is observable in the gate output.
    */
  private val Terms = Seq("hash", "window", "dup")

  /** 1-based rank over a contract-small (≤ k-row, post-limit) frame;
    * the empty-partitionBy window is deliberate and safe here — it
    * runs on ≤ 100 rows, never on the corpus.
    */
  private def ranked(df: DataFrame, order: Seq[org.apache.spark.sql.Column]): DataFrame =
    df.withColumn("rank",
      row_number().over(Window.orderBy(order: _*)).cast("long"))

  /** Batch fixture: 6 keyword queries over the documents vocabulary —
    * a 4-term query, a rare+common pair ('dup' df ~5%), a 20-term
    * query (the shape the inline-column path's 16-term precondition
    * rejects), one containing a term absent from every rung's
    * corpus (contributes nothing, must not divide by zero), and two
    * PHRASE queries (r13): a bigram+unigram mix, and a pure-bigram
    * query with one bigram absent from every rung (both its words
    * exist, the adjacency never does — the case unigram matching
    * would get wrong).
    */
  private val BatchFixture: Seq[(Long, String)] =
    Seq(1L -> "hash", 1L -> "join", 1L -> "filter", 1L -> "scan",
      2L -> "dup", 2L -> "merge") ++
      Seq("batch", "small", "scan", "agg", "data", "customer", "big",
        "hash", "slow", "join", "row", "filter", "merge", "table",
        "stream", "sort", "window", "order", "query", "group")
        .map(3L -> _) ++
      Seq(4L -> "vector", 4L -> "spark", 4L -> "key", 4L -> "zzzunseen") ++
      Seq(5L -> "table hash", 5L -> "stream",
        6L -> "merge order", 6L -> "zzzunseen dup") ++
      // r14 (advisor): trigram and 4-gram queries — the kernel accepts
      // grains 1..4 and the oracle now generates the same grain set,
      // so the longer phrases are gate-checked, not just spec-checked.
      // Both phrases occur in the sf0.01 corpus (df 8 / df 4).
      Seq(7L -> "slow hash batch",
        8L -> "value slow hash data", 8L -> "dup")

  val queries: Map[String, Q] = Map(
    // Batch BM25: 6 keyword queries — two of them PHRASE queries
    // (word bigrams, r13) — in ONE corpus pass. Plan shape: the token
    // stream carries unigrams + bigram occurrences (native WordNgrams
    // kernel) and survives only through a broadcast semi-join on the
    // query vocabulary (non-query grams die in the scan stage),
    // integer e6 contributions so the per-(query, doc) sum is
    // merge-order-free, WindowGroupLimit top-10 per query.
    "bm25_batch" -> ((s, d) => {
      import s.implicits._
      Retrieval.bm25BatchTopK(Tables.documents(s, d), "doc_id", "text",
        BatchFixture.toDF("query_id", "term"), k = 10)
        .orderBy(col("query_id"), col("rk"))
    }),

    // BM25 top-20 for a 3-term keyword query. Plan shape: row-local
    // tf/dl projection (no tokenize-explode shuffle), ONE 1-row
    // integer stats aggregate broadcast back, TakeOrdered top-k —
    // the corpus is scanned once and never shuffled.
    "bm25_topk" -> ((s, d) => {
      Retrieval.bm25TopK(Tables.documents(s, d), "doc_id", "text",
        Terms, k = 20)
    }),

    // Per-source distinctive terms (coverage x global idf, top-5 per
    // source) — the "what is each source about" corpus report. One
    // explode reduced map-side to DISTINCT presence pairs (the only
    // corpus-sized exchange); scoring joins run on vocab-bounded
    // frames; integer counts + fixed-association scalar -> exact e6.
    "tfidf_source_terms" -> ((s, d) => {
      Retrieval.distinctiveTerms(Tables.documents(s, d), "source",
        "doc_id", "text", k = 5)
        .orderBy(col("source"), col("rk"))
    }),

    // Lexical + vector hybrid: RRF over the BM25 top-100 and the
    // cosine top-100 (query vec_id=0), the standard two-leg retrieval
    // fusion. doc_id and vec_id share the id space by construction
    // (TESTDATA.md: documents/embeddings are parallel tables). Each
    // leg is corpus-scan + TakeOrdered; the fusion joins two ≤100-row
    // frames — broadcast territory at any corpus size. Full fused
    // set is the gate output (≤ 200 rows), not just the head.
    "hybrid_rank_fusion" -> ((s, d) => {
      val kw = ranked(
        Retrieval.bm25TopK(Tables.documents(s, d), "doc_id", "text",
          Terms, k = 100),
        Seq(col("score_e6").desc, col("doc_id")))
        .select(col("doc_id").as("item_id"), col("rank"))
      val vec = ranked(
        Similarity.bruteForceTopK(
          Tables.embeddings(s, d).filter(col("vec_id") =!= 0),
          Tables.embeddings(s, d).filter(col("vec_id") === 0),
          "vec_id", "embedding", k = 100),
        Seq(col("cos").desc, col("vec_id")))
        .select(col("vec_id").as("item_id"), col("rank"))
      Retrieval.rrfFuse(kw, vec, "item_id")
        .select(col("item_id"), col("rank_a").as("rank_kw"),
          col("rank_b").as("rank_vec"), col("rrf_e6"))
        .orderBy(col("rrf_e6").desc, col("item_id"))
    }),

    // INDEX-BACKED hybrid (r13, the deployment shape of two-leg
    // retrieval at 100 TB): the vector leg probes the STORED
    // list-partitioned IVF index (nprobe/nlist partition pruning on
    // the scan — plan-asserted in RetrievalSpec) instead of brute
    // force. Which neighbors sit in probed lists is k-means state,
    // not SQL-expressible, so the gate output is the established
    // recall-contract shape (ann_ivf/ann_lsh): exact-leg counts plus
    // three booleans — the vector leg's recall floor vs the exact
    // brute-force top-100 computed independently in-engine, and two
    // fusion-algebra invariants (each leg's ranks survive the
    // full-outer fuse as a dense 1..n permutation — a dropped or
    // duplicated row flips them). Neighbor-level fused output stays
    // hash-bound by hybrid_rank_fusion (exact oracle) above.
    "hybrid_rank_fusion_indexed" -> ((s, d) => {
      val kw = ranked(
        Retrieval.bm25TopK(Tables.documents(s, d), "doc_id", "text",
          Terms, k = 100),
        Seq(col("score_e6").desc, col("doc_id")))
        .select(col("doc_id").as("item_id"), col("rank"))
      val vec = ranked(
        graft.operators.Ann.ivfIndexTopK(s,
          SimilarityQueries.ivfIndexDir(s, d),
          SimilarityQueries.queryVec(s, d),
          "vec_id", "embedding", k = 100, nprobe = 4),
        Seq(col("cos").desc, col("vec_id")))
        .select(col("vec_id").as("item_id"), col("rank"))
      val fused = Retrieval.rrfFuse(kw, vec, "item_id")
      val exactVec = Similarity.bruteForceTopK(
        Tables.embeddings(s, d).filter(col("vec_id") =!= 0),
        SimilarityQueries.queryVec(s, d), "vec_id", "embedding", k = 100)
      val hits = vec.select(col("item_id"))
        .join(exactVec.select(col("vec_id").as("item_id")),
          Seq("item_id"), "left_semi")
      // the leg's non-null ranks are exactly the dense set 1..n iff
      // they are distinct, start at 1 and top out at their count
      def ranksIntact(r: org.apache.spark.sql.Column) =
        (countDistinct(r) === count(r)) &&
          (coalesce(max(r), lit(0L)) === count(r)) &&
          (coalesce(min(r), lit(1L)) === lit(1L))
      fused.agg(
          count(col("rank_a")).cast("long").as("n_kw"),
          count(col("rank_b")).cast("long").as("n_vec"),
          ranksIntact(col("rank_a")).as("kw_ranks_intact"),
          ranksIntact(col("rank_b")).as("vec_ranks_intact"))
        .crossJoin(broadcast(hits.agg(count(lit(1)).as("n_hits"))))
        .select(lit(100L).as("k"), col("n_kw"), col("n_vec"),
          col("kw_ranks_intact"), col("vec_ranks_intact"),
          (col("n_hits") * 2 >= 100L).as("vec_recall_ok"))
    })
  )

  /** Shared BM25 scoring CTE: mirrors Retrieval.withTermFrequencies +
    * corpusStats + bm25 operation-for-operation (same literals, same
    * association order; ln on identical rational inputs).
    */
  private def bm25Sql(k: Int): String =
    s"""WITH t AS (
       |  SELECT doc_id,
       |    string_split($normSql, ' ') AS w
       |  FROM documents
       |  WHERE text IS NOT NULL AND length(trim(text)) > 0),
       |f AS (
       |  SELECT doc_id, CAST(len(w) AS BIGINT) AS dl,
       |    CAST(len(list_filter(w, x -> x = 'hash')) AS BIGINT) AS tf_hash,
       |    CAST(len(list_filter(w, x -> x = 'window')) AS BIGINT) AS tf_window,
       |    CAST(len(list_filter(w, x -> x = 'dup')) AS BIGINT) AS tf_dup
       |  FROM t),
       |st AS (
       |  SELECT CAST(count(*) AS BIGINT) AS n_docs,
       |    CAST(sum(dl) AS BIGINT) AS sum_dl,
       |    CAST(sum(CASE WHEN tf_hash > 0 THEN 1 ELSE 0 END) AS BIGINT) AS df_hash,
       |    CAST(sum(CASE WHEN tf_window > 0 THEN 1 ELSE 0 END) AS BIGINT) AS df_window,
       |    CAST(sum(CASE WHEN tf_dup > 0 THEN 1 ELSE 0 END) AS BIGINT) AS df_dup
       |  FROM f),
       |sc AS (
       |  SELECT f.doc_id,
       |    CAST((CASE WHEN tf_hash > 0 THEN 1 ELSE 0 END) +
       |         (CASE WHEN tf_window > 0 THEN 1 ELSE 0 END) +
       |         (CASE WHEN tf_dup > 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_terms,
       |    CAST(floor((
       |      (CASE WHEN tf_hash > 0 THEN
       |        ln(1.0 + (CAST(n_docs AS DOUBLE) - CAST(df_hash AS DOUBLE) + 0.5)
       |                 / (CAST(df_hash AS DOUBLE) + 0.5))
       |        * (CAST(tf_hash AS DOUBLE) * (1.2 + 1.0))
       |        / (CAST(tf_hash AS DOUBLE) + 1.2 * (0.25 +
       |             0.75 * (CAST(dl AS DOUBLE) * CAST(n_docs AS DOUBLE)
       |                     / CAST(sum_dl AS DOUBLE)))) ELSE 0.0 END) +
       |      (CASE WHEN tf_window > 0 THEN
       |        ln(1.0 + (CAST(n_docs AS DOUBLE) - CAST(df_window AS DOUBLE) + 0.5)
       |                 / (CAST(df_window AS DOUBLE) + 0.5))
       |        * (CAST(tf_window AS DOUBLE) * (1.2 + 1.0))
       |        / (CAST(tf_window AS DOUBLE) + 1.2 * (0.25 +
       |             0.75 * (CAST(dl AS DOUBLE) * CAST(n_docs AS DOUBLE)
       |                     / CAST(sum_dl AS DOUBLE)))) ELSE 0.0 END) +
       |      (CASE WHEN tf_dup > 0 THEN
       |        ln(1.0 + (CAST(n_docs AS DOUBLE) - CAST(df_dup AS DOUBLE) + 0.5)
       |                 / (CAST(df_dup AS DOUBLE) + 0.5))
       |        * (CAST(tf_dup AS DOUBLE) * (1.2 + 1.0))
       |        / (CAST(tf_dup AS DOUBLE) + 1.2 * (0.25 +
       |             0.75 * (CAST(dl AS DOUBLE) * CAST(n_docs AS DOUBLE)
       |                     / CAST(sum_dl AS DOUBLE)))) ELSE 0.0 END)
       |    ) * 1000000.0 + 0.5) AS BIGINT) AS score_e6
       |  FROM f CROSS JOIN st),
       |top AS (
       |  SELECT doc_id, n_terms, score_e6 FROM sc WHERE n_terms > 0
       |  ORDER BY score_e6 DESC, doc_id LIMIT $k)""".stripMargin

  private val normSql =
    "lower(trim(regexp_replace(text, '\\s+', ' ', 'g')))"

  private def batchFixtureValues: String =
    BatchFixture.map { case (q, t) => s"($q, '$t')" }.mkString(", ")

  val oracles: Map[String, String] = Map(
    // Operation-for-operation replay of bm25BatchTopK: same integer
    // stats, same fixed-association scalar per (doc, term), e6-LONG
    // contributions summed as integers (merge-order-free both sides).
    "bm25_batch" ->
      s"""WITH q AS (
         |  SELECT CAST(query_id AS BIGINT) AS query_id, term
         |  FROM (VALUES $batchFixtureValues) AS v(query_id, term)),
         |base AS (
         |  SELECT doc_id, string_split($normSql, ' ') AS w
         |  FROM documents
         |  WHERE text IS NOT NULL AND length(trim(text)) > 0),
         |st AS (
         |  SELECT CAST(count(*) AS BIGINT) AS n_docs,
         |    CAST(sum(len(w)) AS BIGINT) AS sum_dl FROM base),
         |ex AS (
         |  SELECT doc_id, CAST(len(w) AS BIGINT) AS dl,
         |    unnest(list_concat(list_concat(w,
         |      list_transform(range(1, len(w)),
         |        i -> w[i] || ' ' || w[i + 1])),
         |      list_concat(
         |        list_transform(range(1, len(w) - 1),
         |          i -> w[i] || ' ' || w[i + 1] || ' ' || w[i + 2]),
         |        list_transform(range(1, len(w) - 2),
         |          i -> w[i] || ' ' || w[i + 1] || ' ' || w[i + 2]
         |               || ' ' || w[i + 3])))) AS word
         |  FROM base),
         |m AS (
         |  SELECT doc_id, word, CAST(count(*) AS BIGINT) AS tf, max(dl) AS dl
         |  FROM ex WHERE word IN (SELECT DISTINCT term FROM q)
         |  GROUP BY doc_id, word),
         |dfs AS (
         |  SELECT word, CAST(count(*) AS BIGINT) AS df_t FROM m GROUP BY word),
         |c AS (
         |  SELECT m.doc_id, m.word,
         |    CAST(floor(
         |      ln(1.0 + (CAST(n_docs AS DOUBLE) - CAST(df_t AS DOUBLE) + 0.5)
         |               / (CAST(df_t AS DOUBLE) + 0.5))
         |      * (CAST(tf AS DOUBLE) * (1.2 + 1.0))
         |      / (CAST(tf AS DOUBLE) + 1.2 * (0.25 +
         |           0.75 * (CAST(dl AS DOUBLE) * CAST(n_docs AS DOUBLE)
         |                   / CAST(sum_dl AS DOUBLE))))
         |      * 1000000.0 + 0.5) AS BIGINT) AS c_e6
         |  FROM m CROSS JOIN st JOIN dfs USING (word)),
         |sc AS (
         |  SELECT q.query_id, c.doc_id,
         |    CAST(sum(c_e6) AS BIGINT) AS score_e6,
         |    CAST(count(*) AS BIGINT) AS n_terms
         |  FROM c JOIN q ON q.term = c.word GROUP BY q.query_id, c.doc_id),
         |r AS (
         |  SELECT *, row_number() OVER (PARTITION BY query_id
         |    ORDER BY score_e6 DESC, doc_id) AS rk FROM sc)
         |SELECT query_id, doc_id, n_terms, score_e6, CAST(rk AS BIGINT) AS rk
         |FROM r WHERE rk <= 10 ORDER BY query_id, rk""".stripMargin,

    "bm25_topk" ->
      s"""${bm25Sql(20)}
         |SELECT doc_id, n_terms, score_e6 FROM top
         |ORDER BY score_e6 DESC, doc_id""".stripMargin,

    "tfidf_source_terms" ->
      s"""WITH base AS (
         |  SELECT source, doc_id, string_split($normSql, ' ') AS w
         |  FROM documents
         |  WHERE text IS NOT NULL AND length(trim(text)) > 0),
         |p AS (
         |  SELECT DISTINCT source, doc_id, word
         |  FROM (SELECT source, doc_id, unnest(w) AS word FROM base)),
         |g AS (
         |  SELECT word, CAST(count(*) AS BIGINT) AS df_w
         |  FROM p GROUP BY word HAVING count(*) >= 2),
         |gs AS (
         |  SELECT source, CAST(count(*) AS BIGINT) AS n_docs_g
         |  FROM base GROUP BY source),
         |n AS (SELECT CAST(count(*) AS BIGINT) AS n_docs FROM base),
         |gw AS (
         |  SELECT source, word, CAST(count(*) AS BIGINT) AS n_docs_gw
         |  FROM p GROUP BY source, word),
         |sc AS (
         |  SELECT gw.source, gw.word, n_docs_gw, df_w,
         |    CAST(floor(
         |      (CAST(n_docs_gw AS DOUBLE) / CAST(n_docs_g AS DOUBLE))
         |      * ln(CAST(n_docs AS DOUBLE) / CAST(df_w AS DOUBLE))
         |      * 1000000.0 + 0.5) AS BIGINT) AS score_e6
         |  FROM gw JOIN g USING (word) JOIN gs USING (source) CROSS JOIN n),
         |r AS (
         |  SELECT *, row_number() OVER (PARTITION BY source
         |    ORDER BY score_e6 DESC, word) AS rk FROM sc)
         |SELECT source, word, n_docs_gw, df_w, score_e6, CAST(rk AS BIGINT) AS rk
         |FROM r WHERE rk <= 5 ORDER BY source, rk""".stripMargin,

    // Recall-contract oracle (the ann_ivf pattern): the exact-leg
    // counts are SQL-derivable (the kw leg is deterministic BM25; the
    // vec leg returns min(k, corpus) because the probed half of the
    // index always holds >= k vectors at every rung); the booleans
    // are the contract literals the Spark side must earn in-engine.
    "hybrid_rank_fusion_indexed" ->
      s"""${bm25Sql(100)}
         |SELECT CAST(100 AS BIGINT) AS k,
         |  (SELECT CAST(count(*) AS BIGINT) FROM top) AS n_kw,
         |  (SELECT CAST(least(100, count(*)) AS BIGINT)
         |   FROM embeddings WHERE vec_id <> 0) AS n_vec,
         |  true AS kw_ranks_intact, true AS vec_ranks_intact,
         |  true AS vec_recall_ok""".stripMargin,

    "hybrid_rank_fusion" ->
      s"""${bm25Sql(100)},
         |kw AS (
         |  SELECT doc_id AS item_id,
         |    row_number() OVER (ORDER BY score_e6 DESC, doc_id) AS rank_kw
         |  FROM top),
         |q AS (SELECT CAST(embedding AS DOUBLE[]) AS e FROM embeddings
         |      WHERE vec_id = 0),
         |vtop AS (
         |  SELECT vec_id,
         |    round(list_cosine_similarity(CAST(embedding AS DOUBLE[]),
         |          (SELECT e FROM q)), 6) AS cos
         |  FROM embeddings WHERE vec_id <> 0
         |  ORDER BY cos DESC, vec_id LIMIT 100),
         |vr AS (
         |  SELECT vec_id AS item_id,
         |    row_number() OVER (ORDER BY cos DESC, vec_id) AS rank_vec
         |  FROM vtop),
         |fused AS (
         |  SELECT coalesce(kw.item_id, vr.item_id) AS item_id,
         |    CAST(kw.rank_kw AS BIGINT) AS rank_kw,
         |    CAST(vr.rank_vec AS BIGINT) AS rank_vec
         |  FROM kw FULL OUTER JOIN vr ON kw.item_id = vr.item_id)
         |SELECT item_id, rank_kw, rank_vec,
         |  CAST(floor((coalesce(1.0 / (CAST(60 AS DOUBLE) + CAST(rank_kw AS DOUBLE)), 0.0)
         |            + coalesce(1.0 / (CAST(60 AS DOUBLE) + CAST(rank_vec AS DOUBLE)), 0.0))
         |       * 1000000.0 + 0.5) AS BIGINT) AS rrf_e6
         |FROM fused ORDER BY rrf_e6 DESC, item_id""".stripMargin
  )
}
