package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Deterministic corpus SHARD-SHUFFLE — the materialization step
  * between mixing and packing in a training-data pipeline: every
  * document gets a stable (shard, position) so S writer jobs can
  * emit S shard files whose internal order is a seeded global
  * shuffle, reproducible from the ids alone (re-running on the same
  * corpus, any partitioning, any cluster size, yields byte-identical
  * shards — the property epoch reproducibility rests on). The
  * reference has no analogue (its loader appends in arrival order,
  * tasks_postgres.py:69); this extends the engine toward the
  * LLM-pipeline north star.
  *
  * Derivations are content-free and engine-portable (the
  * split_holdout discipline): shard = first md5 hex nibble of
  * "graft-shard"+id (16-way, uniform); order key = md5 of
  * "graft-order"+id — both reproducible in ANY engine with md5,
  * which is what lets the full (id, shard, pos) table hash-verify
  * against DuckDB's row_number replay.
  *
  * Scale shape: positions are CONTIGUOUS PER SHARD (row_number
  * semantics) but NOT computed with a per-shard window — a window
  * partitioned 16 ways funnels each shard through one reducer, the
  * classic single-task sort cliff. Instead the classic two-pass
  * offset kernel: ONE range repartition on (shard, key) with an
  * intra-partition sort (so the global (shard, key, id) order is
  * laid out across many tasks), a per-(partition, shard) count
  * collected to the driver (bounded: at most partitions + shards
  * rows), and a row-local second pass that numbers each row from its
  * partition's broadcast base offset. Every stage is
  * partition-parallel; nothing is proportional to shard size on any
  * single task.
  */
object Sharding {

  /** (idCol, shard, pos): 16 shards, pos 1-based and contiguous
    * within its shard in the seeded shuffle order. Equivalent to
    * `row_number() OVER (PARTITION BY shard ORDER BY md5key, id)` —
    * spec-pinned against that window form, computed scalably.
    */
  def deterministicShards(docs: DataFrame, idCol: String): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    val keyed = docs.select(
      col(idCol).cast("long").as("id"),
      // first md5 hex nibble -> 0..15 via position in the alphabet
      // (string-only math: both engines agree without any hex parse)
      expr("cast(instr('0123456789abcdef', substring(" +
          s"md5(cast(concat('graft-shard', cast(`$idCol` as string)) as binary))" +
          ", 1, 1)) - 1 as int)").as("shard"),
      md5(concat(lit("graft-order"), col(idCol).cast("string"))
        .cast("binary")).as("__k"))
    val parts = math.max(keyed.rdd.getNumPartitions,
      spark.sparkContext.defaultParallelism)
    val laid = keyed
      .repartitionByRange(parts, col("shard"), col("__k"), col("id"))
      .sortWithinPartitions(col("shard"), col("__k"), col("id"))
      .as[(Long, Int, String)]
      .persist()
    // pass 1: per-(partition, shard) row counts — tiny, driver-bounded
    val counts = laid.rdd.mapPartitionsWithIndex { (pid, it) =>
      val m = scala.collection.mutable.LinkedHashMap.empty[Int, Long]
      it.foreach { case (_, sh, _) => m.update(sh, m.getOrElse(sh, 0L) + 1L) }
      m.iterator.map { case (sh, n) => (pid, sh, n) }
    }.collect()
    // base offset of (partition, shard) = rows of that shard in all
    // EARLIER partitions (range layout puts earlier keys in earlier
    // partitions, so this is exactly the preceding-row count)
    val base: Map[(Int, Int), Long] = {
      val perShardRunning = scala.collection.mutable.Map.empty[Int, Long]
      counts.sortBy(_._1).map { case (pid, sh, n) =>
        val b = perShardRunning.getOrElse(sh, 0L)
        perShardRunning.update(sh, b + n)
        (pid, sh) -> b
      }.toMap
    }
    val bcBase = spark.sparkContext.broadcast(base)
    laid.rdd.mapPartitionsWithIndex { (pid, it) =>
      val running = scala.collection.mutable.Map.empty[Int, Long]
      it.map { case (id, sh, _) =>
        val p = running.getOrElse(sh, bcBase.value.getOrElse((pid, sh), 0L)) + 1L
        running.update(sh, p)
        (id, sh, p)
      }
    }.toDF("id", "shard", "pos")
      .withColumnRenamed("id", idCol)
  }
}
