package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Text-analysis column functions for the training-data pipeline
  * surface (language id, quality scoring, token counting, content
  * fingerprinting, shingling).
  *
  * Everything here is built from `org.apache.spark.sql.functions`
  * primitives so it stays inside whole-stage codegen — no UDFs. All
  * ops are row-local (no shuffle); semantics are deliberately
  * replicable in ANSI SQL so the DuckDB oracle can verify them.
  */
object TextFunctions {

  /** Collapse whitespace + trim + lowercase — canonical form used by
    * fingerprinting and dedup.
    */
  def normalizeText(c: Column): Column =
    lower(trim(regexp_replace(c, "\\s+", " ")))

  /** Whitespace token count; 0 for empty/whitespace-only text
    * (split of an empty string yields [""], which would otherwise
    * count as one phantom token).
    */
  def tokenCount(c: Column): Column =
    when(length(trim(c)) === 0, lit(0))
      .otherwise(size(split(trim(c), "\\s+")))

  /** Cheap BPE-ish token estimate: chars/4, the standard rule of
    * thumb, as a bigint ceil.
    */
  def tokenEstimate(c: Column): Column =
    ceil(length(c).cast("double") / lit(4.0)).cast("long")

  /** Occurrences of a literal substring, via length arithmetic (keeps
    * the exact same semantics in SQL oracles: replace + length).
    */
  def countOccurrences(c: Column, sub: String): Column =
    ((length(c) - length(replace(c, lit(sub), lit("")))) / lit(sub.length))
      .cast("long")

  /** Tiny per-language stopword marker sets for the heuristic
    * language id (word-anchored membership).
    */
  val langMarkers: Seq[(String, Seq[String])] = Seq(
    "en" -> Seq("the", "and", "of", "a"),
    "es" -> Seq("el", "la", "de", "y"),
    "de" -> Seq("der", "und", "die", "das"),
    "fr" -> Seq("le", "la", "et", "les"))

  /** Stopword-count score for one language over a word array
    * (duplicates count — `filter` keeps multiplicity).
    */
  def langScore(wordsCol: Column, markers: Seq[String]): Column =
    size(filter(wordsCol, w => w.isin(markers: _*))).cast("long")

  /** Heuristic language id: argmax of stopword counts with a fixed
    * precedence order (ties -> earlier language in [[langMarkers]]);
    * "und" when nothing matches. Word-array membership instead of
    * per-marker substring replace: one split + 4 array filters keeps
    * the expression tree small enough for whole-stage codegen (the
    * replace form was 20x slower at sf0.1).
    */
  def langId(c: Column): Column = {
    val w = words(c)
    val scores = langMarkers.map { case (lang, ms) => lang -> langScore(w, ms) }
    val best = scores.map(_._2).reduce((a, b) => when(a >= b, a).otherwise(b))
    scores.foldRight(lit("und")) { case ((lang, s), elseCol) =>
      when(s > 0 && s === best, lit(lang)).otherwise(elseCol)
    }
  }

  /** Quality score in [0,1]: blends length saturation, alpha ratio,
    * digit/punct penalty and mean word length plausibility. Rounded
    * to 4 dp so the oracle can match exactly.
    */
  def qualityScore(c: Column): Column = {
    val t = normalizeText(c)
    val chars = length(t).cast("double")
    val words = size(split(t, " ")).cast("double")
    val alpha = length(regexp_replace(t, "[^a-z]", "")).cast("double")
    val digits = length(regexp_replace(t, "[^0-9]", "")).cast("double")
    val lengthScore = least(chars / lit(500.0), lit(1.0))
    val alphaRatio = alpha / greatest(chars, lit(1.0))
    val digitPenalty = lit(1.0) - least(digits / greatest(chars, lit(1.0)) * 4.0, lit(1.0))
    val meanWordLen = chars / greatest(words, lit(1.0))
    val wordLenScore = when(meanWordLen.between(3.0, 10.0), lit(1.0)).otherwise(lit(0.5))
    val score = lengthScore * 0.3 + alphaRatio * 0.3 + digitPenalty * 0.2 +
      wordLenScore * 0.2
    // floor(x*1e4+0.5)/1e4 instead of round(): both engines run the
    // same IEEE ops, so results are bit-identical even on rounding
    // ties (round() semantics differ between Spark and DuckDB).
    floor(score * 10000.0 + 0.5) / 10000.0
  }

  /** Content fingerprint: md5 of the normalized text — the exact
    * dedup key. Hex string matches DuckDB's md5().
    */
  def fingerprint(c: Column): Column = md5(normalizeText(c).cast("binary"))

  /** PII redaction for training corpora: emails then phone-like
    * +international numbers are replaced with stable tokens. Patterns
    * are deliberately RE2-compatible (no lookarounds/backrefs) so the
    * DuckDB oracle applies the identical regexes; email first, so the
    * phone pattern can't eat an address's digits.
    *
    * Quantifiers are BOUNDED (RFC 5321's 64-char local part / 255-char
    * domain; 20 digits covers every E.164 number): Java's regex is a
    * backtracker, so an UNbounded `[...]+@` against a multi-megabyte
    * token re-consumes the rest of the document from every start
    * offset — O(doc²), a 15-minute single task on a 4 MB no-whitespace
    * doc (r14 adversarial rung). Bounding caps per-offset work at the
    * quantifier ceiling — O(64·doc) — and only excludes strings no
    * mail server would accept anyway. DuckDB's RE2 is a DFA and never
    * backtracks, but it applies the same bounded pattern so the
    * decisions stay byte-identical.
    */
  def redactPii(c: Column): Column = {
    val email = regexp_replace(c,
      "[A-Za-z0-9._%+-]{1,64}@[A-Za-z0-9.-]{1,255}\\.[A-Za-z]{2,24}", "[EMAIL]")
    regexp_replace(email, "\\+\\d[\\d ]{4,20}\\d", "[PHONE]")
  }

  /** HTML/markup strip for crawled corpora: tags are replaced with a
    * space (so `word<br/>word` stays two words), then the common
    * named entities decode, then whitespace collapses. Entities
    * decode AFTER tag removal and `&amp;` decodes LAST — so
    * `&amp;lt;` becomes the literal `&lt;` (single decode, the
    * HTML-correct reading) instead of double-decoding into a `<` that
    * the tag pass is no longer around to interpret. Pattern is
    * RE2-compatible (no lookarounds) and the replace chain is plain
    * literal substitution, so a SQL oracle applies the identical
    * sequence.
    */
  def stripMarkup(c: Column): Column = {
    // tag length bounded for the same backtracker reason as
    // [[redactPii]] (unbounded [^>]* makes a '<'-run document
    // quadratic); 1000 is RE2's repetition ceiling, and no sane
    // markup carries a 1 KB tag
    val noTags = regexp_replace(c, "<[^>]{0,1000}>", " ")
    val decoded = Seq(
      "&lt;" -> "<", "&gt;" -> ">", "&quot;" -> "\"",
      "&apos;" -> "'", "&nbsp;" -> " ", "&amp;" -> "&")
      .foldLeft(noTags) { case (acc, (k, v)) => replace(acc, lit(k), lit(v)) }
    trim(regexp_replace(decoded, "\\s+", " "))
  }

  /** Context-window chunking: split text into `chunkChars`-sized
    * windows overlapping by `overlap` chars (stride = size − overlap);
    * the last window may be shorter. Row-local array expression — the
    * explode happens at the caller, so chunk fan-out parallelizes
    * with the data. Chunk k starts at k·stride+1 (1-based), matching
    * SQL substring semantics exactly for the oracle.
    */
  def chunkText(c: Column, chunkChars: Int, overlap: Int): Column = {
    require(chunkChars > 0 && overlap >= 0 && overlap < chunkChars,
      s"need 0 <= overlap < chunkChars, got chunkChars=$chunkChars overlap=$overlap")
    val stride = chunkChars - overlap
    val n = greatest(lit(1),
      ceil((length(c) - lit(overlap)).cast("double") / lit(stride.toDouble))
        .cast("int"))
    transform(sequence(lit(0), n - 1), i =>
      substr(c, (i * stride + 1).cast("int"), lit(chunkChars)))
  }

  /** Word array of the normalized text. */
  def words(c: Column): Column = split(normalizeText(c), " ")

  /** Distinct word n-gram shingles (as strings joined by spaces).
    * Row-local, via the native [[graft.plans.WordShingles]] expression
    * (requires GraftExtensions registration on the session). The
    * earlier pure-HOF form re-evaluated the full split per shingle —
    * the lambda body embeds the `slice(split(...))` subtree — making
    * shingling O(words²) per doc; the native kernel is one pass.
    */
  def shingles(c: Column, n: Int): Column =
    call_function("graft_word_shingles", words(c), lit(n))

  /** Shingles over an already-materialized word-array column (avoids
    * re-splitting when the caller needs the words too).
    */
  def shinglesOfWords(wordsCol: Column, n: Int): Column =
    call_function("graft_word_shingles", wordsCol, lit(n))

  /** ALL word n-grams with multiplicity over a word-array column —
    * the tf-counting face (BM25 phrase terms): no dedup, and a doc
    * shorter than n words yields an EMPTY array (zero occurrences),
    * unlike the shingle form's whole-text fallback. Native kernel,
    * one pass, codegen'd.
    */
  def ngramsOfWords(wordsCol: Column, n: Int): Column =
    call_function("graft_word_ngrams", wordsCol, lit(n))
}
