package graft

import graft.operators.FuzzyMatch

class FuzzyMatchSpec extends SparkSpec {
  import spark.implicits._

  private def fixture = Seq(
    (1L, "Acme Corp"),          // norm "acme corp"
    (2L, "acme  CORP."),        // identical normalized -> distance 0
    (3L, "Acme Cor"),           // 1 edit away
    (4L, "Beta LLC"),
    (5L, "Beta LC"),            // 1 edit away
    (6L, "Gamma Industries"),   // unique
    (7L, "delta co"),
    (8L, "Delta Co.")           // identical normalized to 7
  ).toDF("id", "name")

  test("pairs: blocked Levenshtein finds typo variants, never cross-block") {
    val got = FuzzyMatch.pairs(fixture, "id", "name", maxDistance = 1)
      .select("id_a", "id_b", "distance")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    assert(got == Set((1L, 2L, 0), (1L, 3L, 1), (2L, 3L, 1),
      (4L, 5L, 1), (7L, 8L, 0)))
  }

  test("canonicalize maps every variant to the lowest id in its match group") {
    val got = FuzzyMatch.canonicalize(fixture, "id", "name", maxDistance = 1)
      .select("id", "canonical_id")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got == Set((1L, 1L), (2L, 1L), (3L, 1L), (4L, 4L), (5L, 4L),
      (6L, 6L), (7L, 7L), (8L, 7L)))
  }

  test("over-full blocks are excluded from pairing and surfaced by droppedBlocks") {
    // maxBlock=2: the 3-value 'acm' block is dropped; others survive
    val pairs = FuzzyMatch.pairs(fixture, "id", "name",
      maxDistance = 1, maxBlock = 2)
      .select("id_a", "id_b")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs == Set((4L, 5L), (7L, 8L)), s"acme pairs must be gone: $pairs")
    val dropped = FuzzyMatch.droppedBlocks(fixture, "id", "name", maxBlock = 2)
      .collect().map(r => (r.getString(0), r.getString(1), r.getString(2), r.getLong(3)))
      .toSeq
    assert(dropped == Seq(("warning", "fuzzy_block_dropped", "acm", 3L)))
    // nothing over the default cap: audit is empty, pairing unaffected
    assert(FuzzyMatch.droppedBlocks(fixture, "id", "name").isEmpty)
  }
}
