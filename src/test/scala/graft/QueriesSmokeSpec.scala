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
}
