package graft.operators

import graft.functions.TextFunctions
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import scala.collection.concurrent.TrieMap

/** Byte-pair-encoding tokenizer: corpus-trained merge rules plus a
  * row-local encoder — the token-counting primitive a training-data
  * pipeline needs when "tokens" must mean the model's tokens, not
  * whitespace splits (the reference counts rows, never tokens; this
  * is part of the LLM-pipeline surface SURVEY §2 adds).
  *
  * Scale shape (the standard two-phase split, Sennrich et al. 2016 —
  * BPE trains on the word-FREQUENCY dictionary, not the corpus):
  *
  *  - [[train]]: ONE shuffle collapses the corpus to (word, count) —
  *    output is vocabulary-sized, not corpus-sized — then a bounded
  *    top-`maxVocabWords` dictionary is collected and the merge loop
  *    runs on the driver over that dictionary (same
  *    bounded-by-construction class as the IVF k-means sample). A
  *    100 TB corpus still collapses to a dictionary of at most
  *    `maxVocabWords` rows; corpus size only affects the one
  *    word-count shuffle.
  *  - [[tokenize]]: the ranked merge table ships in the task closure
  *    (broadcast-equivalent, vocabulary-sized) and every row encodes
  *    locally — zero shuffles, with a per-executor word→tokens cache
  *    so repeated words (Zipf: most of them) skip the merge loop.
  *
  * Word splitting matches the library's canonical normalization
  * ([[TextFunctions.words]]: lowercase, collapsed whitespace), so BPE
  * token counts compose with text_token_count and the quality gates.
  * Within a word the symbol stream is chars + a terminal `</w>`
  * marker; merges never cross word boundaries.
  *
  * Determinism: pair-count ties break on the lexicographically
  * smallest pair, so the same corpus always yields the same merge
  * table — BpeSpec pins the classic low/lower/newest example by hand
  * and the driver entries are rows-only (the iterative merge loop is
  * not SQL-expressible).
  */
object Bpe {

  /** Ranked merge rules; rank i merged before rank i+1.
    * `mergeCounts` (r12): the winning pair's weighted count at each
    * rank — free to record during training, and it turns a merge
    * table into a HASH-BINDABLE artifact (an oracle replaying the
    * count-argmax-rewrite loop must reproduce count AND pair at every
    * rank, not just the final sequence). Empty for loaded/frozen
    * models.
    */
  final case class Model(merges: Vector[(String, String)],
                         mergeCounts: Vector[Long] = Vector.empty) {
    /** rank lookup used by the encoder */
    lazy val ranks: Map[(String, String), Int] = merges.zipWithIndex.toMap
  }

  private val EndMark = "</w>"

  /** Train merge rules from a corpus. `maxVocabWords` bounds the
    * driver-side dictionary (top by frequency, ties by word) — the
    * long tail a cap drops carries negligible pair mass by Zipf, and
    * an unbounded distinct-word dictionary is exactly what must NOT
    * reach one machine at 100 TB.
    */
  def train(docs: DataFrame, textCol: String, numMerges: Int,
            maxVocabWords: Int = 50000): Model = {
    require(numMerges > 0 && maxVocabWords > 0, "numMerges/maxVocabWords > 0")
    val dict: Array[(String, Long)] = docs
      .select(explode(TextFunctions.words(col(textCol))).as("w"))
      .filter(length(col("w")) > 0)
      .groupBy("w").agg(count(lit(1)).as("n"))
      .orderBy(col("n").desc, col("w"))
      .limit(maxVocabWords)
      .collect().map(r => (r.getString(0), r.getLong(1)))

    // driver merge loop over the dictionary: each word is a symbol
    // array; one merge rewrites every adjacent occurrence in place
    var words: Array[(Array[String], Long)] = dict.map { case (w, n) =>
      (initialSymbols(w), n)
    }
    val merges = Vector.newBuilder[(String, String)]
    val mergeCounts = Vector.newBuilder[Long]
    var i = 0
    var done = false
    while (i < numMerges && !done) {
      val counts = new java.util.HashMap[(String, String), Long]()
      words.foreach { case (syms, n) =>
        var j = 0
        while (j < syms.length - 1) {
          counts.merge((syms(j), syms(j + 1)), n, _ + _)
          j += 1
        }
      }
      if (counts.isEmpty) done = true
      else {
        var best: (String, String) = null
        var bestN = -1L
        counts.forEach { (p, n) =>
          if (n > bestN || (n == bestN && pairLt(p, best))) { best = p; bestN = n }
        }
        merges += best
        mergeCounts += bestN
        words = words.map { case (syms, n) => (mergePair(syms, best), n) }
        i += 1
      }
    }
    Model(merges.result(), mergeCounts.result())
  }

  /** Initial symbol stream: CODE POINTS + the terminal marker — not
    * UTF-16 units (r11 review): `word.map(_.toString)` split
    * supplementary-plane characters (emoji etc.) into surrogate
    * halves, which never merge (no trained pair spans them), so a
    * single 😀 cost TWO tokens and broke the conservation bound
    * tokens <= codepoints + 1 that text_bpe_tokenize's oracle (and
    * both engines' length()) count in code points.
    */
  private def initialSymbols(word: String): Array[String] = {
    val out = Array.newBuilder[String]
    var i = 0
    while (i < word.length) {
      val cp = word.codePointAt(i)
      out += new String(Character.toChars(cp))
      i += Character.charCount(cp)
    }
    out += EndMark
    out.result()
  }

  private def pairLt(a: (String, String), b: (String, String)): Boolean =
    a._1 < b._1 || (a._1 == b._1 && a._2 < b._2)

  /** Replace every adjacent (l, r) occurrence with l+r, left to right. */
  private def mergePair(syms: Array[String], p: (String, String)): Array[String] = {
    val out = Array.newBuilder[String]
    var j = 0
    while (j < syms.length) {
      if (j < syms.length - 1 && syms(j) == p._1 && syms(j + 1) == p._2) {
        out += syms(j) + syms(j + 1); j += 2
      } else { out += syms(j); j += 1 }
    }
    out.result()
  }

  /** Encode one word: start from chars + `</w>` and repeatedly apply
    * the present pair with the lowest training rank (all occurrences
    * per step) until no trained pair remains — the exact inference
    * rule matching the training merge order.
    */
  private[operators] def encodeWord(word: String,
                                    ranks: Map[(String, String), Int]): Seq[String] = {
    var syms: Array[String] = initialSymbols(word)
    var continue = syms.length > 1
    while (continue) {
      var bestRank = Int.MaxValue
      var best: (String, String) = null
      var j = 0
      while (j < syms.length - 1) {
        val r = ranks.getOrElse((syms(j), syms(j + 1)), Int.MaxValue)
        if (r < bestRank) { bestRank = r; best = (syms(j), syms(j + 1)) }
        j += 1
      }
      if (best == null) continue = false
      else syms = mergePair(syms, best)
      if (syms.length < 2) continue = false
    }
    syms.toSeq
  }

  /** Persist a trained model next to the data it will tokenize (a
    * tokenizer trained once is an ARTIFACT — retraining on every job
    * both wastes the count shuffle and silently changes token ids
    * when the corpus moved). JSON: `{"merges":[["e","s"],...]}`,
    * rank = position.
    */
  def save(spark: org.apache.spark.sql.SparkSession, model: Model,
           path: String): Unit = {
    val om = new com.fasterxml.jackson.databind.ObjectMapper()
    val arr = model.merges.map(p => Array(p._1, p._2)).toArray
    val p = new org.apache.hadoop.fs.Path(path)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val out = fs.create(p, true)
    try out.write(s"""{"merges":${om.writeValueAsString(arr)}}""".getBytes("UTF-8"))
    finally out.close()
  }

  /** Load a [[save]]d model; fails loudly on anything else. */
  def load(spark: org.apache.spark.sql.SparkSession, path: String): Model = {
    val p = new org.apache.hadoop.fs.Path(path)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    require(fs.exists(p), s"$path does not exist — not a saved BPE model")
    val in = fs.open(p)
    val json = try new String(in.readAllBytes(), "UTF-8") finally in.close()
    val tree = new com.fasterxml.jackson.databind.ObjectMapper().readTree(json)
    val merges = tree.get("merges")
    require(merges != null && merges.isArray,
      s"$path is not a saved BPE model (no merges array)")
    Model(Vector.tabulate(merges.size()) { i =>
      val pr = merges.get(i)
      require(pr.isArray && pr.size() == 2, s"malformed merge at rank $i")
      (pr.get(0).asText(), pr.get(1).asText())
    })
  }

  /** Row-local tokenization: adds `tokens` (array<string>) for the
    * normalized words of `textCol`. The merge table rides the task
    * closure; a bounded per-executor cache short-circuits repeated
    * words (Zipf makes the hit rate high), capped so a pathological
    * unique-word corpus cannot grow executor memory unboundedly.
    */
  def tokenize(df: DataFrame, textCol: String, model: Model): DataFrame = {
    val ranks = model.ranks
    val cache = new TrieMap[String, Seq[String]]()
    val enc = udf { words: Seq[String] =>
      words.flatMap { w =>
        cache.get(w) match {
          case Some(t) => t
          case None =>
            val t = encodeWord(w, ranks)
            if (cache.size < 200000) cache.put(w, t)
            t
        }
      }
    }
    df.withColumn("tokens",
      enc(filter(TextFunctions.words(col(textCol)), w => length(w) > 0)))
  }

}
