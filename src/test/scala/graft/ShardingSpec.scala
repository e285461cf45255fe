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
}
