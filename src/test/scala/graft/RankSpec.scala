package graft

import graft.operators.Rank
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Rank.keyedRank / Rank.ntileBy vs the window functions they
  * replace for low-cardinality keys — exact equality on randomized
  * multi-partition data with skewed keys, plus edge shapes (groups
  * smaller than the tile count, single-row groups).
  */
class RankSpec extends SparkSpec {
  import spark.implicits._

  // Deterministic pseudo-random frame: 3 skewed keys (one holds ~80%
  // of rows), values with ties, unique id tie-break.
  private def fixture(n: Int) = {
    val rnd = new scala.util.Random(42)
    (1 to n).map { i =>
      val key = rnd.nextInt(10) match {
        case 0 => "B"
        case 1 => "C"
        case _ => "A"
      }
      (key, rnd.nextInt(50).toDouble, i.toLong)
    }.toDF("k", "v", "id").repartition(7) // scatter across partitions
  }

  test("keyedRank equals row_number over Window.partitionBy(key)") {
    val df = fixture(5000)
    val w = Window.partitionBy(col("k")).orderBy(col("v"), col("id"))
    val expected = df
      .withColumn("rank", row_number().over(w).cast("long"))
      .withColumn("key_n", count(lit(1)).over(Window.partitionBy(col("k"))))
    val got = Rank.keyedRank(df, "k", Seq(col("v"), col("id")))
    assert(got.select("k", "v", "id", "rank", "key_n").except(
      expected.select("k", "v", "id", "rank", "key_n")).isEmpty)
    assert(got.count() === 5000)
  }

  test("ntileBy equals ntile window function, tiles > and < group size") {
    val df = fixture(2000)
    for (tiles <- Seq(1, 4, 10)) {
      val w = Window.partitionBy(col("k")).orderBy(col("v"), col("id"))
      val expected = df.withColumn("tile", ntile(tiles).over(w))
      val got = Rank.ntileBy(df, "k", Seq(col("v"), col("id")), tiles)
      assert(got.select("k", "v", "id", "tile").except(
        expected.select("k", "v", "id", "tile")).isEmpty, s"tiles=$tiles")
    }
    // single-row groups + groups smaller than the tile count
    val tiny = Seq(("X", 1.0, 1L), ("Y", 2.0, 2L), ("Y", 1.0, 3L))
      .toDF("k", "v", "id")
    val w = Window.partitionBy(col("k")).orderBy(col("v"), col("id"))
    val expected = tiny.withColumn("tile", ntile(10).over(w))
    val got = Rank.ntileBy(tiny, "k", Seq(col("v"), col("id")), 10)
    assert(got.select("k", "v", "id", "tile").except(
      expected.select("k", "v", "id", "tile")).isEmpty)
  }

  test("keyedPrefixSum equals the exclusive running-sum window, multi-key") {
    val rnd = new scala.util.Random(7)
    val df = (1 to 3000).map { i =>
      (s"s${rnd.nextInt(3)}", s"t${rnd.nextInt(2)}",
        i.toLong, rnd.nextInt(100).toLong)
    }.toDF("k1", "k2", "id", "v").repartition(5)
    val w = Window.partitionBy(col("k1"), col("k2")).orderBy(col("id"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val expected = df.withColumn("ps",
      coalesce(sum(col("v")).over(w), lit(0L)).cast("long"))
    val got = Rank.keyedPrefixSum(df, Seq("k1", "k2"), Seq(col("id")), "v",
      sumCol = "ps")
    assert(got.select("k1", "k2", "id", "v", "ps").except(
      expected.select("k1", "k2", "id", "v", "ps")).isEmpty)
    assert(got.count() === 3000)
  }

  test("high-cardinality key fails loudly naming the window alternative") {
    // a per-row key is exactly the misuse the gate exists for: the
    // metadata collect would be numPartitions x n rows
    val df = (1 to 500).map(i => (s"user_$i", i.toDouble, i.toLong))
      .toDF("k", "v", "id")
    val exRank = intercept[IllegalArgumentException] {
      Rank.keyedRank(df, "k", Seq(col("v"), col("id")), maxMetaRows = 100)
    }
    assert(exRank.getMessage.contains("Window.partitionBy"))
    assert(exRank.getMessage.contains("maxMetaRows"))
    val exSum = intercept[IllegalArgumentException] {
      Rank.keyedPrefixSum(df, Seq("k"), Seq(col("id")), "v",
        maxMetaRows = 100)
    }
    assert(exSum.getMessage.contains("Window.partitionBy"))
    // the same data under the default cap still works (sanity: the
    // gate bounds the driver, it does not change results)
    assert(Rank.keyedRank(df, "k", Seq(col("v"), col("id"))).count() === 500)
  }

  test("keyedRank treats NULL keys as one group, matching the window form " +
      "(r15 adversarial-relational rung: window_ntile crashed on null " +
      "o_orderstatus)") {
    // SQL GROUP BY / PARTITION BY both treat NULLs as a single group;
    // the distributed kernel must too — its offset-attach join is
    // null-safe (<=>) so null-key rows actually receive their offsets
    val rnd = new scala.util.Random(11)
    val withNull = (1 to 500).map { i =>
      val k = rnd.nextInt(4) match {
        case 0 => null.asInstanceOf[String]
        case 1 => "B"
        case _ => "A"
      }
      (k, rnd.nextInt(40).toDouble, i.toLong)
    }.toDF("k", "v", "id").repartition(5)
    val got = Rank.keyedRank(withNull, "k", Seq(col("v"), col("id")))
      .select(col("id"), col("rank"), col("key_n"))
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    val w = Window.partitionBy(col("k")).orderBy(col("v"), col("id"))
    val want = withNull
      .withColumn("rank", row_number().over(w).cast("long"))
      .withColumn("key_n",
        count(lit(1)).over(Window.partitionBy(col("k"))))
      .select(col("id"), col("rank"), col("key_n"))
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(got == want)
  }

  test("keyedPrefixSum treats NULL keys as one group, matching the window " +
      "form") {
    val rnd = new scala.util.Random(12)
    val withNull = (1 to 400).map { i =>
      val k = if (rnd.nextInt(3) == 0) null.asInstanceOf[String] else "A"
      (k, (rnd.nextInt(9) + 1).toLong, i.toLong)
    }.toDF("k", "n", "id").repartition(5)
    val got = Rank.keyedPrefixSum(withNull, Seq("k"), Seq(col("id")), "n")
      .select(col("id"), col("prefix_sum"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val w = Window.partitionBy(col("k")).orderBy(col("id"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val want = withNull
      .withColumn("prefix_sum", coalesce(sum(col("n")).over(w), lit(0L)))
      .select(col("id"), col("prefix_sum"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == want)
  }
}
