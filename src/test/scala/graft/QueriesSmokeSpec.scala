package graft

/** Driver-shaped smoke: every SparkEntry query runs at sf0.001 and
  * returns a sane frame (the t1 analogue, against the whole
  * inventory). Catches regressions in any operator without waiting
  * for the full sf0.01 oracle gate.
  */
class QueriesSmokeSpec extends SparkSpec {

  test("entry returns rows") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  test("oracleSql only names registered queries") {
    val unknown = SparkEntry.oracleSql.keySet -- SparkEntry.queries.keySet
    assert(unknown.isEmpty, s"oracles without queries: $unknown")
  }

  SparkEntry.queries.toSeq.sortBy(_._1).foreach { case (name, fn) =>
    test(s"query $name runs at sf0.001 and is non-empty") {
      val df = fn(spark, sf0001)
      assert(df.columns.nonEmpty)
      // > 0, not >= 0: an empty result "passes" any oracle without
      // observing the operator's semantics at all
      assert(df.count() > 0, s"$name returned an empty frame at sf0.001")
    }
  }

  test("no query's internal persist survives the per-query clearCache") {
    // the Bench/Verify cache lifecycle (r7 ask #8): every internally-
    // persisted frame must be reachable by catalog.clearCache — an
    // RDD-level persist would leak executor memory across the 115-
    // query bench loop unnoticed, because only Dataset caches are
    // tracked by the catalog
    spark.catalog.clearCache()
    // localCheckpoint frames (the fixpoint/delete queries) persist at
    // the RDD level and are released by the ContextCleaner once
    // UNREFERENCED — drive a GC cycle so the assertion distinguishes
    // a real leak (still-referenced frame, survives any GC) from
    // cleaner lag (r11: queries now use localCheckpoint by design)
    // 100 tries / ~30 s ceiling for the general case; the ceiling
    // grew 10 -> 30 -> 100 across rounds as the shared-JVM suite
    // grew (the cleaner's ONE thread drains shuffle/broadcast
    // cleanups for every query the JVM has run before it reaches
    // these RDDs), and at 505 specs a full-suite run outlasted even
    // 300 tries with exactly two IterCheckpoint localCheckpoint RDDs
    // left — DETERMINISTICALLY the same two. Probed in isolation
    // (r14): the fixpoint/excerpt loop queries' last frames sit in a
    // BOUNDED O(1) retention slot somewhere in Spark's scheduler/
    // execution bookkeeping — repeated runs keep the leftover count
    // at 1-3, never growing, and the next query's activity releases
    // the previous run's frames. Bounded-and-released is lifecycle,
    // not leak. r15 (advisor ask): the whitelist keys on the
    // EXPLICIT creation-site tag IterCheckpoint stamps on every RDD
    // it manages (a file rename can't silently blank the match), and
    // "bounded" is asserted directly — re-running the loop queries a
    // second time must not GROW the lagged set — instead of trusting
    // a fixed numeric bound to encode it. ANY other creation site
    // still fails immediately: the r7 target class — a hidden
    // .persist a query never releases — has a different call site
    // and survives regardless of patience.
    def settle(): Map[Int, org.apache.spark.rdd.RDD[_]] = {
      var leaked = spark.sparkContext.getPersistentRDDs
      var tries = 0
      def unmanaged = leaked.values.filterNot(
        _.toString.contains(graft.operators.IterCheckpoint.CallSiteTag))
      while (unmanaged.nonEmpty && tries < 100) {
        System.gc()
        Thread.sleep(300)
        leaked = spark.sparkContext.getPersistentRDDs
        tries += 1
      }
      assert(unmanaged.isEmpty,
        s"persisted RDDs outlive clearCache + GC: ${unmanaged.map(_.toString)}")
      leaked.toMap
    }
    val first = settle()
    if (first.nonEmpty)
      info(s"cleaner-lagged IterCheckpoint RDDs tolerated: " +
        first.values.map(_.toString).mkString("; "))
    // the retention slot is O(1): a SECOND pass over the loop-running
    // queries must land at or below the first pass's lagged count —
    // a genuine slow leak from the managed call sites grows instead
    val loopQueries = Seq("text_substring_dedup_fixpoint",
      "pipeline_excerpt_dedup", "dedup_components", "dedup_resolve")
    loopQueries.foreach(q => SparkEntry.queries(q)(spark, sf0001).count())
    spark.catalog.clearCache()
    var second = settle()
    var drains = 0
    while (second.size > math.max(first.size, 3) && drains < 30) {
      System.gc(); Thread.sleep(300)
      second = settle(); drains += 1
    }
    assert(second.size <= math.max(first.size, 3),
      s"lagged checkpoint RDDs GREW across roster passes " +
        s"(${first.size} -> ${second.size}) — that is a leak, not " +
        s"cleaner lag: ${second.values.map(_.toString)}")
  }
}
