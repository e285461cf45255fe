package graft

import graft.operators.Incremental
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

class IncrementalSpec extends SparkSpec {
  import spark.implicits._

  private def batch(rows: (String, Double)*): DataFrame =
    rows.toDF("k", "v")

  private def snap(df: DataFrame): Map[String, (Long, Double, Double, Double)] =
    df.collect().map(r => r.getString(0) ->
      (r.getLong(1), r.getDouble(2), r.getDouble(3), r.getDouble(4))).toMap

  private val keys = Seq("k")

  test("folding deltas equals the full recompute, in any order") {
    val b1 = batch("a" -> 1.0, "a" -> 2.0, "b" -> 10.0)
    val b2 = batch("a" -> 3.0, "c" -> 7.0)
    val b3 = batch("b" -> -5.0, "c" -> 7.5)
    val all = b1.union(b2).union(b3)
    val p = Seq(b1, b2, b3).map(Incremental.partials(_, keys, "v"))
    val forward = Incremental.merge(Incremental.merge(p(0), p(1), keys), p(2), keys)
    val reverse = Incremental.merge(Incremental.merge(p(2), p(1), keys), p(0), keys)
    val full = Incremental.partials(all, keys, "v")
    val expected = snap(Incremental.finalizeAgg(full, keys))
    assert(snap(Incremental.finalizeAgg(forward, keys)) == expected)
    assert(snap(Incremental.finalizeAgg(reverse, keys)) == expected)
  }

  test("top-k counts: folded state ranks identically to full recompute, any fold order") {
    val b1 = Seq(("p1", 7L), ("p1", 7L), ("p1", 8L), ("p2", 1L)).toDF("k", "item")
    val b2 = Seq(("p1", 8L), ("p1", 9L), ("p2", 1L), ("p2", 2L)).toDF("k", "item")
    val b3 = Seq(("p1", 8L), ("p1", 7L)).toDF("k", "item")
    def tops(state: DataFrame) =
      Incremental.topK(state, Seq("k"), "item", 2)
        .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getInt(3))).toSet
    val p = Seq(b1, b2, b3).map(Incremental.countPartials(_, Seq("k"), "item"))
    val forward = Incremental.mergeCounts(
      Incremental.mergeCounts(p(0), p(1), Seq("k"), "item"), p(2), Seq("k"), "item")
    val reverse = Incremental.mergeCounts(
      Incremental.mergeCounts(p(2), p(0), Seq("k"), "item"), p(1), Seq("k"), "item")
    val full = Incremental.countPartials(b1.union(b2).union(b3), Seq("k"), "item")
    val expected = tops(full)
    // item 7 and 8 tie at 3 in p1 -> tie-break on item keeps output stable
    assert(expected == Set(("p1", 7L, 3L, 1), ("p1", 8L, 3L, 2), ("p2", 1L, 2L, 1), ("p2", 2L, 1L, 2)))
    assert(tops(forward) == expected)
    assert(tops(reverse) == expected)
  }

  test("empty delta is a no-op; new group passes through") {
    val state = Incremental.partials(batch("a" -> 1.0), keys, "v")
    val empty = Incremental.partials(batch("a" -> 1.0).limit(0), keys, "v")
    assert(snap(Incremental.finalizeAgg(
      Incremental.merge(state, empty, keys), keys)) ==
      snap(Incremental.finalizeAgg(state, keys)))
    val withNew = Incremental.merge(state,
      Incremental.partials(batch("z" -> 4.0), keys, "v"), keys)
    val m = snap(Incremental.finalizeAgg(withNew, keys))
    assert(m.keySet == Set("a", "z"))
    assert(m("z") == ((1L, 4.0, 4.0, 4.0)))
  }

  test("distinct sketches: coupon-mode merge estimates EXACTLY like a full-data sketch") {
    val b1 = batch("a" -> 1.0, "a" -> 2.0, "b" -> 10.0)
    val b2 = batch("a" -> 2.0, "a" -> 3.0, "b" -> 10.0)
    val merged = Incremental.mergeDistinct(
      Incremental.distinctPartials(b1, keys, "v"),
      Incremental.distinctPartials(b2, keys, "v"), keys)
    val full = Incremental.distinctPartials(b1.union(b2), keys, "v")
    def est(df: DataFrame) = Incremental.finalizeDistinct(df, keys)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val m = est(merged)
    // while the sketch is in coupon (exact) mode, union IS the
    // sketch of the union — identical estimate, not merely "close"
    assert(m == est(full), s"merged $m vs full ${est(full)}")
    // and at this cardinality the estimate is exact
    assert(m == Map("a" -> 3L, "b" -> 1L))
  }

  test("distinct sketches: HLL-mode merged estimate agrees with full-data within 2%") {
    // past coupon mode the direct build reads out via HIP while a
    // union reads out via the composite estimator, so EXACT equality
    // no longer holds (the incr_distinct gate divergence at sf0.1) —
    // but both estimate the identical register state, so the gap is
    // bounded well inside the sketch's own RSE. 5k distinct forces
    // HLL mode at lgK=12.
    val all = spark.range(5000).selectExpr("'g' AS k", "CAST(id AS DOUBLE) AS v")
    val h = all.filter("id % 10 != 0"); val dl = all.filter("id % 10 = 0")
    val merged = Incremental.mergeDistinct(
      Incremental.distinctPartials(h, keys, "v"),
      Incremental.distinctPartials(dl, keys, "v"), keys)
    def est(df: DataFrame) = Incremental.finalizeDistinct(df, keys)
      .collect().head.getLong(1)
    val m = est(merged)
    val f = est(Incremental.distinctPartials(all, keys, "v"))
    assert(m != 0 && math.abs(m - f).toDouble / f <= 0.02,
      s"merged $m vs full $f diverge beyond 2%")
  }

  test("distinct sketch estimate tracks exact count within HLL tolerance at 10k") {
    val big = spark.range(10000).selectExpr("'g' AS k", "CAST(id % 7919 AS DOUBLE) AS v")
    val st = Incremental.distinctPartials(big, keys, "v")
    val e = Incremental.finalizeDistinct(st, keys).collect().head.getLong(1)
    assert(math.abs(e - 7919.0) / 7919.0 < 0.05, s"estimate $e vs 7919")
  }

  test("merge refuses a frame that is not a partials frame") {
    val state = Incremental.partials(batch("a" -> 1.0), keys, "v")
    val e = intercept[IllegalArgumentException] {
      Incremental.merge(state, batch("a" -> 1.0), keys)
    }
    assert(e.getMessage.contains("partials"))
  }

  test("delta merge does not rescan history: state side is a leaf, one exchange for the union-fold") {
    val state = Incremental.partials(
      batch("a" -> 1.0, "b" -> 2.0), keys, "v")
      .localCheckpoint(true) // stands in for the stored state table
    val delta = Incremental.partials(batch("a" -> 9.0), keys, "v")
    val plan = Incremental.merge(state, delta, keys)
      .queryExecution.optimizedPlan.toString
    // the fold reads the materialized state (a scan leaf), not the
    // state's aggregation lineage: exactly one Aggregate pair (the
    // delta's partials + the fold) sits above the union
    assert(plan.contains("LogicalRDD"), plan)
  }

  test("quantile sketch: merged state is BIT-identical to the full-data sketch, any fold order") {
    import spark.implicits._
    val vals = (1 to 500).map(i => ("g" + (i % 2), (i * 7 % 997) * 1.5))
    val df = vals.toDF("k", "v")
    val (a, b, c) = (df.filter($"v" < 300), df.filter($"v" >= 300 && $"v" < 900),
      df.filter($"v" >= 900))
    val keys = Seq("k")
    def parts(x: org.apache.spark.sql.DataFrame) =
      Incremental.quantilePartials(x, keys, "v", 50.0)
    val abc = Incremental.mergeQuantile(
      Incremental.mergeQuantile(parts(a), parts(b), keys), parts(c), keys)
    val cba = Incremental.mergeQuantile(
      Incremental.mergeQuantile(parts(c), parts(b), keys), parts(a), keys)
    val full = parts(df)
    def rows(x: org.apache.spark.sql.DataFrame) =
      x.orderBy("k", "agg_bucket").collect().toSeq
    assert(rows(abc) == rows(full), "merge must be lossless")
    assert(rows(cba) == rows(full), "merge must be fold-order-independent")
  }

  test("quantile estimates sit within one bucket width above the true quantile") {
    import spark.implicits._
    val df = (1 to 1000).map(i => ("g", i.toDouble)).toDF("k", "v")
    val est = Incremental.finalizeQuantile(
      Incremental.quantilePartials(df, Seq("k"), "v", 25.0), Seq("k"), 25.0)
      .collect().head
    // true p50 = 500, p95 = 950, p99 = 990; estimate = bucket upper edge
    val (p50, p95, p99) = (est.getAs[Double]("p50_est"),
      est.getAs[Double]("p95_est"), est.getAs[Double]("p99_est"))
    // upper-edge estimate: est - true lies in (0, width] — exactly
    // width when the true quantile is its bucket's first value
    assert(p50 > 500.0 && p50 <= 525.0, s"p50=$p50")
    assert(p95 > 950.0 && p95 <= 975.0, s"p95=$p95")
    assert(p99 > 990.0 && p99 <= 1015.0, s"p99=$p99")
    assert(est.getAs[Long]("n_rows") == 1000L)
  }

  test("mergeQuantile refuses a frame that is not a quantile-partials frame") {
    import spark.implicits._
    val df = Seq(("g", 1.0)).toDF("k", "v")
    val good = Incremental.quantilePartials(df, Seq("k"), "v", 10.0)
    val ex = intercept[IllegalArgumentException] {
      Incremental.mergeQuantile(good, df, Seq("k"))
    }
    assert(ex.getMessage.contains("quantilePartials"))
  }
}
