package graft

import graft.operators.Sharding
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

class ShardingSpec extends SparkSpec {

  private def docs = Tables.documents(spark, sf0001)

  private def collectTriples(df: org.apache.spark.sql.DataFrame) =
    df.select(col("doc_id").cast("long"), col("shard").cast("int"),
        col("pos").cast("long"))
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2)))
      .sortBy(_._1).toSeq

  test("two-pass offset kernel equals the per-shard row_number window") {
    val got = collectTriples(Sharding.deterministicShards(docs, "doc_id"))
    val keyed = docs.select(
      col("doc_id").cast("long").as("doc_id"),
      expr("cast(instr('0123456789abcdef', substring(" +
        "md5(cast(concat('graft-shard', cast(doc_id as string)) as binary))" +
        ", 1, 1)) - 1 as int)").as("shard"),
      md5(concat(lit("graft-order"), col("doc_id").cast("string"))
        .cast("binary")).as("k"))
    val window = keyed.withColumn("pos",
      row_number().over(Window.partitionBy(col("shard"))
        .orderBy(col("k"), col("doc_id"))).cast("long"))
    assert(got == collectTriples(window),
      "kernel diverged from the window contract")
  }

  test("positions are contiguous 1..n per shard; stable under repartitioning") {
    val base = collectTriples(Sharding.deterministicShards(docs, "doc_id"))
    // contiguity: each shard's positions are exactly 1..count
    base.groupBy(_._2).foreach { case (sh, rows) =>
      val ps = rows.map(_._3).sorted
      assert(ps == (1L to ps.length.toLong), s"shard $sh positions: $ps")
    }
    // all 16 shards populated on the fixture corpus
    assert(base.map(_._2).distinct.sorted == (0 until 16), "shard fan-out")
    // layout-independence: a hostile input partitioning yields the
    // byte-identical assignment (the epoch-reproducibility property)
    val reshuffled = collectTriples(
      Sharding.deterministicShards(docs.repartition(7, col("source")), "doc_id"))
    assert(reshuffled == base, "assignment must not depend on input layout")
  }

  test("globalRank equals the global row_number window; stages balance and reshuffle-invariant") {
    import spark.implicits._
    import org.apache.spark.sql.expressions.Window
    // scores with heavy ties so the id tie-break is actually exercised
    val docs = (0L until 103L).map(i => (i, (i % 7) * 100L)).toDF("id", "s")
    val kernel = Sharding.curriculumStages(docs, "id", "s", stages = 4)
      .select("id", "score", "rank", "stage")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getInt(3)))
      .sortBy(_._1).toSeq
    val w = Window.orderBy(col("s"), col("id"))
    val window = docs.select(col("id"), col("s").as("score"),
        row_number().over(w).cast("long").as("rank"))
      .select(col("id"), col("score"), col("rank"),
        expr("CAST(((rank - 1) * 4) div 103 AS INT)").as("stage"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getInt(3)))
      .sortBy(_._1).toSeq
    assert(kernel == window)
    // 103 over 4 stages: sizes 26/26/26/25 in rank order
    val sizes = kernel.groupBy(_._4).view.mapValues(_.size).toMap
    assert(sizes == Map(0 -> 26, 1 -> 26, 2 -> 26, 3 -> 25), sizes.toString)
    // layout-independence
    val reshuffled = Sharding.curriculumStages(
        docs.repartition(7, col("s")), "id", "s", stages = 4)
      .select("id", "score", "rank", "stage")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getInt(3)))
      .sortBy(_._1).toSeq
    assert(reshuffled == kernel, "rank must not depend on input layout")
  }

  test("globalRank fails fast on non-integral score or id columns (r11 advice)") {
    import spark.implicits._
    val doubleScore = Seq((1L, 1.7), (2L, -0.4)).toDF("id", "s")
    val e1 = intercept[IllegalArgumentException] {
      Sharding.globalRank(doubleScore, "id", "s")
    }
    assert(e1.getMessage.contains("integral"), e1.getMessage)
    val stringId = Seq(("a", 1L), ("b", 2L)).toDF("id", "s")
    val e2 = intercept[IllegalArgumentException] {
      Sharding.globalRank(stringId, "id", "s")
    }
    assert(e2.getMessage.contains("integral"), e2.getMessage)
  }
}
