package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Fuzzy entity matching for dirty dimension values — the warehouse
  * problem the reference's blind dimension appends create
  * (dataframe_tasks.py:78: every load appends, so "Acme Corp" /
  * "acme  corp." / "Acme Cor" accumulate as distinct rows). Near-
  * identical strings pair via blocked Levenshtein: candidates must
  * share a cheap BLOCK key (normalized prefix), then the edit
  * distance verifies only within blocks.
  *
  * Scale shape (the record-linkage standard): blocking turns the
  * O(n²) all-pairs comparison into per-block work — ONE shuffle on
  * the block key, pair enumeration only inside blocks (bounded by
  * the block-size cap below), and `levenshtein` is Spark's builtin
  * codegen'd expression. Prefix blocking misses pairs whose FIRST
  * `blockLen` chars differ (a typo in char 1 lands in another
  * block) — the recall/cost trade every blocking scheme makes;
  * compose with [[Dedup.minhashPairs]] when first-char typos matter.
  *
  * Giant blocks (e.g. every value starting "the ") would still pair
  * quadratically, so blocks above `maxBlock` values are excluded
  * from pairing rather than exploding — a prefix that common is a
  * stopword problem, not a typo problem. [[pairs]] itself stays a
  * pure pair stream; audit what was dropped with [[droppedBlocks]]
  * (one row per hot block with its occupancy) so exclusion is never
  * silent.
  */
object FuzzyMatch {

  /** Canonical form compared/blocked on: lowercase, punctuation
    * stripped, whitespace collapsed.
    */
  private def norm(c: org.apache.spark.sql.Column) =
    trim(regexp_replace(regexp_replace(lower(c), "[^a-z0-9 ]", ""), "\\s+", " "))

  /** Near-match pairs (id_a < id_b) among values whose normalized
    * forms share a `blockLen`-char prefix and sit within
    * `maxDistance` edits. Identical normalized forms pair at
    * distance 0 (use [[Dedup.exact]] first if exact dups dominate).
    */
  def pairs(df: DataFrame, idCol: String, valueCol: String,
            maxDistance: Int = 2, blockLen: Int = 3,
            maxBlock: Int = 1000): DataFrame = {
    require(maxDistance >= 0 && blockLen > 0 && maxBlock > 1,
      "maxDistance >= 0, blockLen > 0, maxBlock > 1")
    val base = df.filter(col(valueCol).isNotNull)
      .select(col(idCol).cast("long").as(idCol),
        norm(col(valueCol)).as("__v"))
      .filter(length(col("__v")) > 0)
      .withColumn("__block", substring(col("__v"), 1, blockLen))
    // block occupancy gate: drop hot blocks loudly, never pair them
    val blocked = base.join(
      base.groupBy(col("__block")).agg(count(lit(1)).as("__bn"))
        .filter(col("__bn") <= maxBlock)
        .select(col("__block")),
      Seq("__block"), "left_semi")
    val a = blocked.select(col("__block"), col(idCol).as("id_a"),
      col("__v").as("v_a"))
    val b = blocked.select(col("__block"), col(idCol).as("id_b"),
      col("__v").as("v_b"))
    a.join(b, Seq("__block"))
      .filter(col("id_a") < col("id_b"))
      // length pre-filter: |len(a) − len(b)| > d implies distance > d,
      // and it's a codegen'd integer compare before the DP kernel
      .filter(abs(length(col("v_a")) - length(col("v_b"))) <= maxDistance)
      .withColumn("distance", levenshtein(col("v_a"), col("v_b")))
      .filter(col("distance") <= maxDistance)
      .select(col("id_a"), col("id_b"), col("v_a"), col("v_b"), col("distance"))
  }

  /** Audit of the blocks [[pairs]] drops for exceeding `maxBlock`:
    * one row per over-full block (block key, occupancy), computed
    * with the same normalization so the two can't drift. Failure-log
    * shaped (status='warning') so it unions straight into a
    * pipeline's audit trail. Costs one aggregation over the
    * normalized values — run it when block drops matter, not on
    * every match.
    */
  def droppedBlocks(df: DataFrame, idCol: String, valueCol: String,
                    blockLen: Int = 3, maxBlock: Int = 1000): DataFrame =
    df.filter(col(valueCol).isNotNull)
      .select(norm(col(valueCol)).as("__v"))
      .filter(length(col("__v")) > 0)
      .select(substring(col("__v"), 1, blockLen).as("block"))
      .groupBy(col("block")).agg(count(lit(1)).as("n_values"))
      .filter(col("n_values") > maxBlock)
      .select(lit("warning").as("status"),
        lit("fuzzy_block_dropped").as("error_message"),
        col("block"), col("n_values"))

  /** Pairs → canonical mapping: each id maps to the lowest id in its
    * connected match group ([[Dedup.components]] propagation), with
    * unmatched ids passing through as their own canonical — the
    * replace-table a warehouse applies to collapse the accumulated
    * variants.
    */
  def canonicalize(df: DataFrame, idCol: String, valueCol: String,
                   maxDistance: Int = 2, blockLen: Int = 3,
                   maxBlock: Int = 1000): DataFrame = {
    val p = pairs(df, idCol, valueCol, maxDistance, blockLen, maxBlock)
      .select(col("id_a"), col("id_b"))
    val comp = Dedup.components(p)
    df.filter(col(valueCol).isNotNull)
      .select(col(idCol).cast("long").as(idCol), col(valueCol))
      .join(comp.select(col("id").as(idCol),
        col("label").as("canonical_id")), Seq(idCol), "left")
      .withColumn("canonical_id",
        coalesce(col("canonical_id"), col(idCol)))
  }
}
