package graft.operators

import graft.functions.TextFunctions
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** N-gram language-model quality scoring: a Laplace-smoothed bigram
  * LM trained on the corpus itself scores every document by mean
  * log-likelihood — the classic cheap fluency/quality signal (the
  * CCNet/KenLM recipe with the corpus as its own reference model):
  * gibberish, boilerplate soup, and wrong-language text all land far
  * below the corpus's natural bigram mass.
  *
  * Per-bigram: ln((c(w1 w2) + 1) / (c(w1) + V)) with V the corpus
  * vocabulary size; per-doc score is the mean over its (order-
  * preserving, non-distinct) bigrams. Tokenization is the library's
  * canonical [[TextFunctions.words]].
  *
  * Scale shape: training is two uniform-key shuffles that each
  * collapse the corpus to (gram, count) — vocabulary-sized output —
  * after which the tables truncate to the top `maxTable` entries
  * (frequency ties break lexicographically, so truncation is
  * deterministic) and broadcast; truncated-away tail grams simply
  * back off to count 0, costing score precision on rare grams, never
  * correctness. Scoring is a zero-shuffle row-local pass with the
  * broadcast tables. A 100 TB corpus trains into the same bounded
  * table; only the two count shuffles see corpus-sized data.
  */
object LmScore {

  final case class Model(unigrams: Map[String, Long],
                         bigrams: Map[String, Long],
                         vocabSize: Long)

  /** Train unigram/bigram tables. `maxTable` bounds EACH table's
    * driver/broadcast footprint; `vocabSize` is the exact distinct
    * word count (computed before truncation, so smoothing mass does
    * not depend on the cap).
    */
  def train(docs: DataFrame, textCol: String, maxTable: Int = 1000000): Model = {
    require(maxTable > 0, "maxTable > 0")
    val base = docs
      .filter(col(textCol).isNotNull && length(trim(col(textCol))) > 0)
      .select(TextFunctions.words(col(textCol)).as("w"))
    val words = base.select(explode(col("w")).as("g"))
      .filter(length(col("g")) > 0)
    val vocabSize = words.agg(countDistinct(col("g"))).head().getLong(0)
    val ug = topCounts(words, maxTable)
    val bigrams = base
      .select(explode(bigramList(col("w"))).as("g"))
    val bg = topCounts(bigrams, maxTable)
    Model(ug, bg, vocabSize)
  }

  /** (gram, count) for the top `maxTable` grams; ties break on the
    * gram so the table is unique for a given corpus.
    */
  private def topCounts(grams: DataFrame, maxTable: Int): Map[String, Long] =
    grams.groupBy(col("g")).agg(count(lit(1)).as("n"))
      .orderBy(col("n").desc, col("g"))
      .limit(maxTable)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap

  /** Order-preserving non-distinct bigram strings of a word-array
    * column (empty for docs under two words). The array column must
    * be materialized (a projected alias), not an inline split — a
    * lambda over an unaliased split re-evaluates it per element.
    */
  private def bigramList(w: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    when(size(w) >= 2,
      transform(sequence(lit(0), size(w) - 2), i =>
        concat(element_at(w, i + 1), lit(" "), element_at(w, i + 2))))
      .otherwise(array().cast("array<string>"))

  /** Add `n_bigrams` and `lm_score` (null when under two words).
    * Row-local: the model rides one broadcast; no shuffle.
    */
  def score(df: DataFrame, textCol: String, model: Model): DataFrame = {
    val spark = df.sparkSession
    val bc = spark.sparkContext.broadcast(model)
    val scoreUdf = udf { ws: Seq[String] =>
      val m = bc.value
      // null text yields a null word array, not an empty one.
      // Materialize to an ARRAY before the indexed loop: the deser-
      // ialized Seq is a List, whose apply/length are O(i)/O(n) — the
      // loop below was O(words²) per doc, a 15-minute single task on
      // a 176 k-word document (found by the r14 adversarial rung; at
      // crawl scale a long doc is a guaranteed straggler, not a rarity)
      val v: Array[String] =
        if (ws == null) Array.empty
        else ws.iterator.filter(_.nonEmpty).toArray
      if (v.length < 2) None
      else {
        var sum = 0.0
        var i = 0
        while (i < v.length - 1) {
          val c = m.bigrams.getOrElse(v(i) + " " + v(i + 1), 0L)
          val u = m.unigrams.getOrElse(v(i), 0L)
          sum += math.log((c + 1.0) / (u + m.vocabSize))
          i += 1
        }
        Some(sum / (v.length - 1))
      }
    }
    val withW = df.withColumn("__w", TextFunctions.words(col(textCol)))
    withW
      .withColumn("n_bigrams",
        greatest(size(filter(col("__w"), w => length(w) > 0)) - 1, lit(0)))
      .withColumn("lm_score", scoreUdf(col("__w")))
      .drop("__w")
  }
}
