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

  /** Exact GLOBAL RANK over (scoreCol, idCol) — `row_number() OVER
    * (ORDER BY score, id)` semantics without the single-reducer
    * funnel an unpartitioned window forces: the same two-pass offset
    * kernel as [[deterministicShards]], degenerated to one logical
    * "shard" (one range exchange laying the global order across many
    * tasks, a driver-bounded per-partition count, a row-local
    * broadcast-offset numbering pass). scoreCol must be integral
    * (quantize floats first — e4 units keep rank ties deterministic
    * AND engine-portable); id breaks ties totally, so the rank is a
    * pure function of the data.
    *
    * Output: (idCol, score, rank) with rank 1-based and contiguous.
    */
  def globalRank(docs: DataFrame, idCol: String, scoreCol: String): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    // fail fast instead of coercing (r11 advice): a silent cast("long")
    // truncated double scores toward zero (collapsing ties and breaking
    // the documented "quantize first" contract) and turned non-numeric
    // ids into nulls that only surfaced later as an opaque encoder error
    def requireIntegral(c: String): Unit = {
      val dt = docs.schema(c).dataType
      require(Seq(org.apache.spark.sql.types.ByteType,
          org.apache.spark.sql.types.ShortType,
          org.apache.spark.sql.types.IntegerType,
          org.apache.spark.sql.types.LongType).contains(dt),
        s"globalRank needs an integral $c column (quantize floats to " +
          s"integer units first); got ${dt.simpleString}")
    }
    requireIntegral(idCol)
    requireIntegral(scoreCol)
    val keyed = docs.select(col(idCol).cast("long").as("id"),
      col(scoreCol).cast("long").as("score"))
    val parts = math.max(keyed.rdd.getNumPartitions,
      spark.sparkContext.defaultParallelism)
    val laid = keyed
      .repartitionByRange(parts, col("score"), col("id"))
      .sortWithinPartitions(col("score"), col("id"))
      .as[(Long, Long)]
      .persist()
    // every partition reports, including empty ones — a missing pid
    // would silently shift every later partition's offset
    val counts = laid.rdd.mapPartitionsWithIndex { (pid, it) =>
      Iterator((pid, it.size.toLong))
    }.collect().sortBy(_._1)
    val offsets = {
      var acc = 0L
      counts.map { case (pid, n) => val b = acc; acc += n; pid -> b }.toMap
    }
    val bcOff = spark.sparkContext.broadcast(offsets)
    laid.rdd.mapPartitionsWithIndex { (pid, it) =>
      var r = bcOff.value(pid)
      it.map { case (id, score) => r += 1; (id, score, r) }
    }.toDF("id", "score", "rank")
      .withColumnRenamed("id", idCol)
  }

  /** CURRICULUM staging: partition the corpus into `stages` equal
    * contiguous ranks of an integral difficulty score (easy -> hard),
    * the ordered-training-mix primitive (curriculum learning orders
    * epochs easy-first; anti-curriculum reverses the stage index).
    * stage k holds ranks (k*n/stages, (k+1)*n/stages] — sizes differ
    * by at most 1, every assignment a pure function of (score, id).
    * One [[globalRank]] pass + a row-local integer formula; the
    * whole table replays as a row_number window in SQL.
    */
  def curriculumStages(docs: DataFrame, idCol: String, scoreCol: String,
      stages: Int): DataFrame = {
    require(stages > 0, s"stages must be > 0: $stages")
    val ranked = globalRank(docs, idCol, scoreCol)
    // n from the ranked frame's own max — no second scan of the input
    val maxRow = ranked.agg(max(col("rank"))).head()
    val n = if (maxRow.isNullAt(0)) 1L else math.max(1L, maxRow.getLong(0))
    // `div`, not `/`: Spark's `/` is always double division, and a
    // double round-trip loses exactness once rank * stages passes 2^53
    ranked.select(col(idCol), col("score"), col("rank"),
      expr(s"CAST(((rank - 1) * $stages) div $n AS INT)").as("stage"))
  }
}
