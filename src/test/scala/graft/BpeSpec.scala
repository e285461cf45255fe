package graft

import graft.operators.Bpe
import org.apache.spark.sql.functions._

class BpeSpec extends SparkSpec {
  import spark.implicits._

  // Sennrich's worked example corpus: word frequencies
  // low:5 lower:2 newest:6 widest:3, flattened to a document per word
  // occurrence so train() sees a real corpus, not a prepared dict.
  private lazy val corpus = {
    val words = Seq.fill(5)("low") ++ Seq.fill(2)("lower") ++
      Seq.fill(6)("newest") ++ Seq.fill(3)("widest")
    words.zipWithIndex.map { case (w, i) => (i.toLong, w) }.toDF("id", "text")
  }

  test("train reproduces the hand-computed merge sequence") {
    val m = Bpe.train(corpus, "text", numMerges = 5)
    // pair counts round 1: (e,s)=9, (s,t)=9, (t,</w>)=9, (w,e)=8 ...
    // 9-way tie breaks lexicographically: (e,s) < (s,t) < (t,</w>)
    assert(m.merges(0) == ("e", "s"))
    // round 2: (es,t)=9, (t,</w>)=9 -> (es,t)
    assert(m.merges(1) == ("es", "t"))
    // round 3: (est,</w>)=9 alone at the top
    assert(m.merges(2) == ("est", "</w>"))
    // round 4: (l,o)=7, (o,w)=7 -> (l,o)
    assert(m.merges(3) == ("l", "o"))
    // round 5: (lo,w)=7
    assert(m.merges(4) == ("lo", "w"))
  }

  test("tokenize applies merges in rank order; unseen chars stay atomic") {
    val m = Bpe.train(corpus, "text", numMerges = 5)
    val out = Bpe.tokenize(
        Seq((1L, "lowest low"), (2L, "newly")).toDF("id", "text"), "text", m)
      .select(col("id"), col("tokens"))
      .collect().map(r => r.getLong(0) -> r.getSeq[String](1)).toMap
    // lowest = low + est</w>; low = lo,w + bare </w> (no (low,</w>) merge trained)
    assert(out(1L) == Seq("low", "est</w>", "low", "</w>"))
    // newly shares only (e,s)-free prefixes: n,e,w merged? (n,e) never
    // trained; only trained pairs apply
    assert(out(2L) == Seq("n", "e", "w", "l", "y", "</w>"))
  }

  test("supplementary-plane chars are single symbols: tokens <= codepoints + 1 (r11)") {
    // 😀 is one code point in two UTF-16 units; the old unit-level
    // split emitted surrogate halves (2 tokens + marker = 3 > 1+1),
    // breaking the conservation bound the gate oracle counts in
    // code points
    val m = Bpe.Model(Vector.empty)
    val out = Bpe.tokenize(
        Seq((1L, "😀"), (2L, "a😀b")).toDF("id", "text"),
        "text", m)
      .select(col("id"), col("tokens"))
      .collect().map(r => r.getLong(0) -> r.getSeq[String](1)).toMap
    assert(out(1L) == Seq("😀", "</w>"), out(1L).toString)
    assert(out(2L) == Seq("a", "😀", "b", "</w>"), out(2L).toString)
  }

  test("tokenization is lossless: concatenated tokens rebuild the words") {
    val m = Bpe.train(corpus, "text", numMerges = 3)
    val docs = Seq((1L, "The  Newest LOWER widest"), (2L, ""), (3L, "   "))
      .toDF("id", "text")
    val out = Bpe.tokenize(docs, "text", m)
      .select(col("id"),
        regexp_replace(concat_ws("", col("tokens")), "</w>", " ").as("re"))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(out(1L) == "the newest lower widest ")
    assert(out(2L) == "")
    assert(out(3L) == "")
  }

  test("maxVocabWords caps the dictionary the merge loop sees") {
    // cap=1 keeps only 'newest' (freq 6): merges can only come from it.
    // All pairs tie at 6 every round, so lexicographic order drives:
    // (e,s); then in "n e w es t </w>" (e,w) beats (es,t) since e < es
    val m = Bpe.train(corpus, "text", numMerges = 3, maxVocabWords = 1)
    assert(m.merges == Vector(("e", "s"), ("e", "w"), ("es", "t")))
  }

  test("save/load round-trips the model; load fails loudly on junk") {
    val m = Bpe.train(corpus, "text", numMerges = 5)
    val path = java.nio.file.Files.createTempDirectory("graft_bpe").toString +
      "/model.json"
    Bpe.save(spark, m, path)
    val loaded = Bpe.load(spark, path)
    assert(loaded.merges == m.merges)
    // loaded model tokenizes identically
    val docs = Seq((1L, "lowest")).toDF("id", "text")
    val a = Bpe.tokenize(docs, "text", m).select("tokens").head.getSeq[String](0)
    val b = Bpe.tokenize(docs, "text", loaded).select("tokens").head.getSeq[String](0)
    assert(a == b)
    val e = intercept[IllegalArgumentException] {
      Bpe.load(spark, path + ".nope")
    }
    assert(e.getMessage.contains("not a saved BPE model"))
  }

  test("merge loop stops early when no pairs remain") {
    val tiny = Seq((1L, "ab")).toDF("id", "text")
    // a,b,</w> admits only 2 merges before the word is one symbol
    val m = Bpe.train(tiny, "text", numMerges = 100)
    assert(m.merges.length == 2)
  }
}
