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
    // 300 tries / ~90 s ceiling: on a noisy host the ContextCleaner's
    // reference-queue drain can lag several GC cycles (one full-suite
    // run flaked at 10 tries, r13 another at 30, r14 another at 100
    // once ConcurrencySpec added ~60 more query executions to the
    // shared JVM — the cleaner's ONE thread drains shuffle/broadcast
    // cleanups for every query the JVM has run before it reaches
    // these RDDs, so the ceiling scales with suite size); a REAL leak
    // — a still-referenced frame — survives any number of tries, so
    // patience costs nothing in detection power and only the flake
    // pays the wait (isolated probes of the concurrency load drain
    // at tries=0)
    var leaked = spark.sparkContext.getPersistentRDDs
    var tries = 0
    while (leaked.nonEmpty && tries < 300) {
      System.gc()
      Thread.sleep(300)
      leaked = spark.sparkContext.getPersistentRDDs
      tries += 1
    }
    assert(leaked.isEmpty,
      s"persisted RDDs outlive clearCache + GC: ${leaked.values.map(_.name)}")
  }
}
