package graft

import java.sql.Timestamp

import graft.operators.{AsOfJoin, CleanOps, Dedup}

import scala.util.Random

/** Randomized (seeded, deterministic) validation of operators whose
  * semantics have a simple in-memory reference model.
  */
class PropertySpec extends SparkSpec {
  import spark.implicits._

  test("chunkText windows cover the text exactly with the declared overlap") {
    import spark.implicits._
    import graft.functions.TextFunctions.chunkText
    import org.apache.spark.sql.functions.col
    val texts = Seq("", "short", "a" * 200, ("abcdefghij" * 60).take(575))
    val out = texts.toDF("t")
      .select(col("t"), chunkText(col("t"), 200, 20).as("chunks"))
      .collect()
      .map(r => r.getString(0) -> r.getSeq[String](1))
    out.foreach { case (t, chunks) =>
      assert(chunks.nonEmpty)
      assert(chunks.forall(_.length <= 200))
      // stride coverage: chunk k starts at k*180; stitching the first
      // 180 chars of every chunk plus the last chunk's tail rebuilds t
      val rebuilt = chunks.init.map(_.take(180)).mkString + chunks.last
      assert(rebuilt == t, s"coverage broken for len ${t.length}: got ${rebuilt.length}")
      // every boundary overlaps by 20 chars
      chunks.sliding(2).foreach {
        case Seq(a, b) if a.length == 200 =>
          assert(a.takeRight(20) == b.take(20), "overlap mismatch")
        case _ =>
      }
    }
  }

  test("deterministic sampling: reproducible, partition-invariant, rate-accurate") {
    import spark.implicits._
    import graft.operators.Sampling
    val df = (1L to 4000L).map(i => (i, s"s${i % 3}")).toDF("id", "src")
    val kept1 = Sampling.deterministic(df, "id", 0.5).select("id")
      .collect().map(_.getLong(0)).toSet
    val kept2 = Sampling.deterministic(df.repartition(13), "id", 0.5).select("id")
      .collect().map(_.getLong(0)).toSet
    assert(kept1 == kept2, "keep decisions must not depend on layout")
    assert(math.abs(kept1.size - 2000) < 150, s"rate off: ${kept1.size}/4000")
    // stratified: rates apply per stratum; a row's decision at equal
    // rate matches the uniform sample (same hash, same threshold)
    val strat = Sampling.stratified(df, "src", "id",
      Map("s0" -> 0.0, "s1" -> 1.0), defaultRate = 0.5)
      .collect().map(r => (r.getLong(0), r.getString(1)))
    assert(!strat.exists(_._2 == "s0"), "rate 0 stratum must be empty")
    assert(strat.count(_._2 == "s1") == df.filter($"src" === "s1").count())
    val s2kept = strat.filter(_._2 == "s2").map(_._1).toSet
    assert(s2kept == kept1.filter(i => i % 3 == 2), "equal-rate decisions must agree")
  }

  test("graft_term_counts matches the HOF model on random strings (r12)") {
    import spark.implicits._
    import org.apache.spark.sql.functions.{col, filter, length, lit, size, trim}
    graft.plans.GraftExtensions.ensureRegistered(spark)
    // seeded generator over an alphabet that stresses every kernel
    // branch: all five Java \s whitespace chars, ASCII letters with
    // mixed case, multi-byte unicode, token-substring traps
    val rnd = new scala.util.Random(42)
    val alphabet = "aA bB\tcC\ncat\rCAT\fß年 dog dup"
    val docs = (1L to 500L).map { i =>
      val len = rnd.nextInt(60)
      (i, (0 until len).map(_ => alphabet(rnd.nextInt(alphabet.length))).mkString)
    }.toDF("id", "text")
    val terms = Seq("cat", "dog", "a", "ß", "年")
    val kernel = graft.operators.Retrieval
      .withTermFrequencies(docs, "text", terms)
      .select((col("id") +: col("dl") +: terms.map(t => col(s"`tf_$t`"))): _*)
      .collect().map(_.toSeq).toSet
    val w = graft.functions.TextFunctions.words(col("text"))
    val hofCols = Seq(col("id"), size(w).cast("long").as("dl")) ++
      terms.map(t => size(filter(w, x => x === lit(t))).cast("long").as(s"tf_$t"))
    val hof = docs
      .filter(col("text").isNotNull && length(trim(col("text"))) > 0)
      .select(hofCols: _*)
      .collect().map(_.toSeq).toSet
    assert(kernel == hof,
      s"kernel vs HOF diverged on random strings:\n${kernel -- hof}\n${hof -- kernel}")
  }

  test("reservoirByGroup: equals the full-window rank, layout-invariant, guards loud (r12)") {
    import spark.implicits._
    import graft.operators.Sampling
    import org.apache.spark.sql.expressions.Window
    import org.apache.spark.sql.functions.{concat, lit, md5, row_number, substring}
    val df = (1L to 3000L).map(i => (i, s"g${i % 5}")).toDF("id", "grp")
    val out = Sampling.reservoirByGroup(df, "grp", "id", k = 10)
      .select("grp", "id", "rk")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet
    // the prefiltered plan must equal the semantic contract: a full
    // within-group row_number over the same (hash, key) order
    val full = df
      .withColumn("rk", row_number().over(Window.partitionBy($"grp")
        .orderBy(substring(md5(concat(lit("graft-rsv"), $"id".cast("string"))), 1, 8),
          $"id")).cast("long"))
      .filter($"rk" <= 10)
      .select("grp", "id", "rk")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet
    assert(out == full, "prefiltered reservoir must equal the global window rank")
    assert(out.groupBy(_._1).forall(_._2.size == 10), "exactly k per group")
    // layout invariance
    val again = Sampling.reservoirByGroup(df.repartition(17), "grp", "id", k = 10)
      .select("grp", "id", "rk")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet
    assert(again == out)
    // small groups keep ALL their rows ranked (min(k, n_g))
    val tiny = Seq((1L, "a"), (2L, "a"), (3L, "b")).toDF("id", "grp")
    val tout = Sampling.reservoirByGroup(tiny, "grp", "id", k = 10)
    assert(tout.count() == 3)
    // cardinality precondition is loud
    val e = intercept[IllegalArgumentException] {
      Sampling.reservoirByGroup(
        df.withColumn("grp", concat(lit("g"), $"id")), "grp", "id",
        k = 1, maxGroups = 100)
    }
    assert(e.getMessage.contains("100"))
  }

  test("weightedTopK: equals the unfiltered E-S rank, weight-biased, guards loud (r12)") {
    import spark.implicits._
    import graft.operators.Sampling
    import org.apache.spark.sql.expressions.Window
    import org.apache.spark.sql.functions.{array_min, concat, lit, md5,
      row_number, sequence, substring, transform}
    val df = (1L to 4000L).map(i => (i, 1L + i % 4)).toDF("id", "w")
    val out = Sampling.weightedTopK(df, "id", "w", k = 200)
      .select("id", "w", "rk")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    // semantic contract: full (unfiltered) min-of-w-hashes ranking
    val keyExpr = array_min(transform(
      sequence(lit(1), $"w".cast("int")),
      i => substring(md5(concat(lit("graft-wrs"), $"id".cast("string"),
        lit("#"), i.cast("string"))), 1, 8)))
    val full = df.withColumn("__key", keyExpr)
      .withColumn("rk", row_number().over(
        Window.orderBy($"__key", $"id")).cast("long"))
      .filter($"rk" <= 200).select("id", "w", "rk")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(out == full, "prefiltered E-S sample must equal the global ranking")
    // weight-proportionality shows as selection bias: population mean
    // weight is 2.5; the weighted sample's mean must sit clearly above
    val meanW = out.toSeq.map(_._2).sum.toDouble / out.size
    // E-S theory: selected-mean approaches sum(w^2)/sum(w) = 3.0 for
    // this tier mix; one fixed-salt draw at k=200 lands near it
    assert(meanW > 2.7, s"weighted sample mean weight $meanW not biased above 2.5")
    // layout invariance
    val again = Sampling.weightedTopK(df.repartition(17), "id", "w", 200)
      .select("id", "w", "rk")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(again == out)
    // loud guards: out-of-range weights and k > n
    val bad = intercept[IllegalArgumentException] {
      Sampling.weightedTopK(df.withColumn("w", lit(0L)), "id", "w", 10)
    }
    assert(bad.getMessage.contains("[1, 16]"))
    val small = intercept[IllegalArgumentException] {
      Sampling.weightedTopK(df.limit(5), "id", "w", 10)
    }
    assert(small.getMessage.contains("< k"))
  }

  test("repeatFactor upsampling: copy counts, determinism, zero-factor drop (r11)") {
    import spark.implicits._
    import graft.operators.Sampling
    val df = (1L to 3000L).map(i => (i, s"s${i % 3}")).toDF("id", "src")
    val out = Sampling.repeatFactor(df, "src", "id",
        Map("s0" -> 2.5, "s1" -> 0.0, "s2" -> 1.0))
      .collect().map(r => (r.getAs[Long]("id"), r.getAs[Long]("copy_idx")))
    val perId = out.groupBy(_._1).view.mapValues(_.map(_._2).sorted.toSeq).toMap
    // s1 (factor 0) vanishes entirely
    assert(!perId.keys.exists(_ % 3 == 1), "factor-0 source must drop")
    // s2 (factor 1) and unmapped behave identically: exactly one copy
    assert(perId.collect { case (id, c) if id % 3 == 2 => c }
      .forall(_ == Seq(0L)))
    // s0: every doc 2 or 3 copies, contiguous 0-based, ~half get 3
    val s0 = perId.collect { case (id, c) if id % 3 == 0 => c }.toSeq
    assert(s0.forall(c => c == Seq(0L, 1L) || c == Seq(0L, 1L, 2L)))
    val n3 = s0.count(_.size == 3)
    assert(math.abs(n3 - 500) < 120, s"frac(2.5) coin off: $n3/1000")
    // layout invariance
    val out2 = Sampling.repeatFactor(df.repartition(17), "src", "id",
        Map("s0" -> 2.5, "s1" -> 0.0, "s2" -> 1.0))
      .collect().map(r => (r.getAs[Long]("id"), r.getAs[Long]("copy_idx")))
    assert(out.sorted.toSeq == out2.sorted.toSeq)
  }

  test("hashSplit: content-keyed, dup-coherent, salt-independent, layout-invariant") {
    import spark.implicits._
    import graft.operators.Sampling
    val df = (1L to 2000L).map(i => (i, s"document body number ${i % 500}"))
      .toDF("doc_id", "text") // every text appears 4x under different ids
    val out = Sampling.hashSplit(df, "text", 0.2)
      .select("doc_id", "split").collect()
      .map(r => (r.getLong(0), r.getString(1)))
    // duplicate texts always co-locate: ids congruent mod 500 share text
    val bySplitKey = out.groupBy(_._1 % 500).values
    assert(bySplitKey.forall(g => g.map(_._2).distinct.length == 1),
      "exact duplicates must land in the same split")
    val holdout = out.count(_._2 == "holdout")
    assert(math.abs(holdout - 400) < 160, s"rate off: $holdout/2000")
    // layout-invariant
    val again = Sampling.hashSplit(df.repartition(17), "text", 0.2)
      .select("doc_id", "split").collect()
      .map(r => (r.getLong(0), r.getString(1))).toSet
    assert(again == out.toSet, "assignment must not depend on layout")
    // a different salt reshuffles some assignments
    val salted = Sampling.hashSplit(df, "text", 0.2, salt = "exp2")
      .select("doc_id", "split").collect()
      .map(r => (r.getLong(0), r.getString(1))).toSet
    assert(salted != out.toSet, "distinct salts must give independent splits")
    // null text excluded
    val withNull = df.union(Seq((9999L, null.asInstanceOf[String]))
      .toDF("doc_id", "text"))
    assert(Sampling.hashSplit(withNull, "text", 0.2).count() == 2000)
  }

  test("redactPii strips emails and international numbers, leaves clean text alone") {
    import spark.implicits._
    import graft.functions.TextFunctions.redactPii
    val rows = Seq(
      "reach me at jane.doe+spam@sub.example.co.uk today",
      "call +44 20 7946 0958 or +1 555 0100 now",
      "mixed: bob@x.io and +33 1 2345 6789",
      "no pii here, just 12345 and an @ sign alone").toDF("t")
    val out = rows.select(redactPii(org.apache.spark.sql.functions.col("t")))
      .collect().map(_.getString(0)).toSeq
    assert(out(0) == "reach me at [EMAIL] today")
    assert(out(1) == "call [PHONE] or [PHONE] now")
    assert(out(2) == "mixed: [EMAIL] and [PHONE]")
    assert(out(3) == "no pii here, just 12345 and an @ sign alone")
  }

  test("cleanName is idempotent and produces postgres-safe names") {
    val rnd = new Random(42)
    (1 to 200).foreach { _ =>
      val s = rnd.alphanumeric.take(rnd.nextInt(12)).mkString("", " !($-", "")
      val once = CleanOps.cleanName(s)
      assert(CleanOps.cleanName(once) == once, s"not idempotent for '$s'")
      assert(once.matches("[a-z0-9_]*"), s"unsafe name '$once'")
      assert(!once.startsWith("_") && !once.endsWith("_"))
    }
  }

  test("asof join matches the in-memory reference model on random data") {
    val rnd = new Random(7)
    (1 to 8).foreach { _ =>
      val leftRows = Seq.fill(1 + rnd.nextInt(25))((1L + rnd.nextInt(4), rnd.nextInt(100).toLong))
      val rightRows = Seq.fill(1 + rnd.nextInt(25))((1L + rnd.nextInt(4), rnd.nextInt(100).toLong))
      val left = leftRows.zipWithIndex
        .map { case ((k, t), i) => (k, new Timestamp(t * 1000), i.toLong) }
        .toDF("k", "t", "lid")
      val right = rightRows.zipWithIndex
        .map { case ((k, t), i) => (k, new Timestamp(t * 1000), i.toLong) }
        .toDF("k", "rt", "rid")
      val got = AsOfJoin.asof(left, right, "k", "t", "rt", Seq("rid"), "rid")
        .collect()
        .map(r => r.getLong(2) -> Option(r.get(3)).map(_.asInstanceOf[Long]))
        .toMap
      val expected = leftRows.zipWithIndex.map { case ((k, t), i) =>
        val candidates = rightRows.zipWithIndex
          .filter { case ((rk, rt), _) => rk == k && rt <= t }
        i.toLong -> (if (candidates.isEmpty) None
                     else Some(candidates.maxBy { case ((_, rt), ri) => (rt, ri) }._2.toLong))
      }.toMap
      assert(got == expected,
        s"asof mismatch\n left=$leftRows\n right=$rightRows\n got=$got\n exp=$expected")
    }
  }

  test("packWindows conserves documents and tokens; offsets rebuild the stream") {
    import graft.operators.Packing
    import org.apache.spark.sql.functions._
    val rnd = new Random(7)
    val docs = (1L to 500L).map(i =>
      (s"s${i % 4}", i, rnd.nextInt(400).toLong)).toDF("src", "id", "toks")
    val packed = Packing.packWindows(docs, "toks", "id", windowTokens = 1000,
      groupCols = Seq("src"))
    // partition property: every doc appears exactly once
    assert(packed.count() == 500)
    // per stream: offsets are the exclusive prefix sums in id order,
    // i.e. sorting by id and re-summing reproduces them
    packed.select("src", "id", "toks", "stream_offset", "window_id")
      .collect()
      .groupBy(_.getString(0))
      .foreach { case (_, rows) =>
        val sorted = rows.sortBy(_.getLong(1))
        var acc = 0L
        sorted.foreach { r =>
          assert(r.getLong(3) == acc, s"offset mismatch at id ${r.getLong(1)}")
          assert(r.getLong(4) == acc / 1000, "window_id != offset/budget")
          acc += r.getLong(2)
        }
      }
    // summary conserves tokens
    val total = Packing.windowSummary(packed, "toks", "id", Seq("src"))
      .agg(sum(col("n_tokens"))).head().getLong(0)
    val expected = docs.agg(sum(col("toks"))).head().getLong(0)
    assert(total == expected)
  }

  test("scd2 invariants: one open version per key, intervals chain without overlap") {
    import graft.operators.Scd
    import org.apache.spark.sql.functions._
    val rnd = new Random(23)
    def t(day: Int) = Timestamp.valueOf(f"2024-01-$day%02d 00:00:00")
    val current = (1L to 60L).map(k =>
      (k, s"n$k", rnd.nextInt(5).toDouble, t(1), None: Option[Timestamp]))
      .toDF("k", "name", "bal", "valid_from", "valid_to")
    val updates = (1L to 80L).filter(_ => rnd.nextBoolean()).map(k =>
      (k, s"n$k", rnd.nextInt(5).toDouble, t(10 + rnd.nextInt(5))))
      .toDF("k", "name", "bal", "ts")
    val out = Scd.scd2Merge(current, updates, Seq("k"), Seq("name", "bal"), "ts")
      .collect().map(r => (r.getLong(0), r.getTimestamp(3), Option(r.getTimestamp(4))))
    out.groupBy(_._1).foreach { case (k, versions) =>
      val open = versions.filter(_._3.isEmpty)
      assert(open.size == 1, s"key $k has ${open.size} open versions")
      // closed intervals chain: each valid_to equals the next valid_from
      val sorted = versions.sortBy(_._2)
      sorted.sliding(2).foreach {
        case Array((_, _, Some(end)), (_, from, _)) =>
          assert(end == from, s"key $k: gap/overlap between $end and $from")
        case _ =>
      }
    }
  }

  test("decontaminate: kept ∪ removed partitions the corpus; kept set is leak-free (random corpora)") {
    import graft.operators.TextFilters
    import org.apache.spark.sql.functions.col
    val rnd = new Random(23)
    val vocab = (1 to 60).map(i => s"w$i")
    def doc() = Seq.fill(8 + rnd.nextInt(20))(vocab(rnd.nextInt(vocab.size))).mkString(" ")
    (1 to 3).foreach { _ =>
      val benchDocs = Seq.fill(3)(doc())
      val corpusDocs = (1L to 40L).map(i => (i, doc())) ++
        benchDocs.zipWithIndex.map { case (t, i) => (100L + i, t) } // planted leaks
      val corpus = corpusDocs.toDF("doc_id", "text")
      val bench = benchDocs.zipWithIndex.map { case (t, i) => (i.toLong, t) }
        .toDF("doc_id", "text")
      val kept = TextFilters.decontaminate(corpus, bench, "doc_id", "text", n = 5)
        .select("doc_id").as[Long].collect().toSet
      // reference model: a doc is clean iff it shares no 5-gram
      def grams(t: String): Set[String] = {
        val w = t.split(" ")
        if (w.length < 5) Set(t) else w.sliding(5).map(_.mkString(" ")).toSet
      }
      val benchGrams = benchDocs.flatMap(grams).toSet
      val expected = corpusDocs
        .filter { case (_, t) => grams(t).intersect(benchGrams).isEmpty }
        .map(_._1).toSet
      assert(kept == expected, s"kept ${kept.size} expected ${expected.size}")
      assert(!(100L to 102L).exists(kept), "planted leaks survived")
    }
  }

  test("repetition stats match an in-memory reference model on random docs") {
    import graft.operators.TextFilters
    val rnd = new Random(37)
    val vocab = Seq("aa", "bb", "cc", "dd")
    def doc() = Seq.fill(1 + rnd.nextInt(25))(vocab(rnd.nextInt(vocab.size))).mkString(" ")
    val docs = (1L to 30L).map(i => (i, doc()))
    val out = TextFilters.repetitionStats(docs.toDF("doc_id", "text"), "doc_id", "text")
      .collect().map(r => r.getAs[Long]("doc_id") ->
        (r.getAs[Long]("n_words"), r.getAs[Long]("top_word_n"),
          r.getAs[Double]("dup_2gram_frac"))).toMap
    docs.foreach { case (id, t) =>
      val w = t.split(" ").toSeq
      val (n, top, dup) = out(id)
      assert(n == w.length)
      assert(top == w.groupBy(identity).values.map(_.size).max)
      val total2 = math.max(w.length - 1, 1)
      val d2 = if (w.length < 2) 0 else w.sliding(2).map(_.mkString(" ")).toSet.size
      val expectedDup = math.floor((1.0 - d2.toDouble / total2) * 10000.0 + 0.5) / 10000.0
      assert(dup == expectedDup, s"doc $id: $dup vs $expectedDup")
    }
  }

  test("incremental partials fold randomly-sized batches to the full recompute") {
    import graft.operators.Incremental
    val rnd = new Random(41)
    val keys = Seq("k")
    val all = (1 to 500).map(_ =>
      (s"g${rnd.nextInt(5)}", math.floor(rnd.nextDouble() * 1000) / 10))
    // random cut points -> 4 batches of random sizes (some possibly empty)
    val cuts = Seq.fill(3)(rnd.nextInt(all.size + 1)).sorted
    val batches = (0 +: cuts :+ all.size).sliding(2).map {
      case Seq(a, b) => all.slice(a, b)
    }.toSeq
    val folded = batches.map(b =>
        Incremental.partials(b.toDF("k", "v"), keys, "v"))
      .reduce((s, d) => Incremental.merge(s, d, keys))
    val full = Incremental.partials(all.toDF("k", "v"), keys, "v")
    def m(df: org.apache.spark.sql.DataFrame) =
      Incremental.finalizeAgg(df, keys).collect()
        .map(r => r.getString(0) -> (r.getLong(1), r.getDouble(2),
          r.getDouble(4), r.getDouble(5))).toMap
    assert(m(folded) == m(full))
  }

  test("minhash estimate tracks exact jaccard on random docs") {
    val rnd = new Random(11)
    val vocab = ('a' to 'z').map(_.toString)
    def doc() = Seq.fill(20 + rnd.nextInt(40))(vocab(rnd.nextInt(vocab.size))).mkString(" ")
    (1 to 6).foreach { _ =>
      val (a, b) = (doc(), doc())
      val df = Seq((1L, a), (2L, b)).toDF("id", "text")
      val sigs = Dedup.minhashSignatures(df, "id", "text", perms = 64, shingleSize = 3)
        .collect().map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
      val est = sigs(1L).zip(sigs(2L)).count { case (x, y) => x == y } / 64.0
      def sh(t: String) = t.split(" ").sliding(3).map(_.mkString(" ")).toSet
      val (sa, sb) = (sh(a), sh(b))
      val exact = sa.intersect(sb).size.toDouble / sa.union(sb).size
      assert(math.abs(est - exact) < 0.35,
        s"minhash estimate $est too far from exact $exact")
    }
  }
}
