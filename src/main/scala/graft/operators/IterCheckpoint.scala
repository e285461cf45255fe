package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.storage.StorageLevel

/** Per-round plan-truncation policy for the iterative operators
  * ([[Dedup.components]]' star loop, [[TextFilters]]' fixpoint span
  * remover). Both loops NEED truncation — round-over-round lineage
  * nesting blows the driver heap (measured, components round 1 notes)
  * — and offer two forms of it:
  *
  *  - `dir = None` (default): `localCheckpoint` — blocks live in
  *    executor storage (memory, disk-spillable). Fastest, zero extra
  *    I/O, but the blocks DIE WITH THEIR EXECUTOR: on a cluster with
  *    executor loss or dynamic allocation, a multi-round run fails
  *    unrecoverably mid-iteration (the lineage the recovery would
  *    need is exactly what truncation discarded).
  *  - `dir = Some(path)`: RELIABLE checkpoint — each marked round's
  *    frame is written to `path` (HDFS/shared fs on a cluster; any
  *    local dir under local masters). An executor killed mid-loop
  *    costs one stage retry that recomputes from the files, not a
  *    failed run. Proven by ClusterFaultSpec: an executor JVM is
  *    killed between rounds under local-cluster and the loop
  *    converges to the identical label table.
  *
  * `interval` amortizes the truncation cost the same way Spark's own
  * MLlib does for its iterative algorithms (PeriodicRDDCheckpointer,
  * default every 10 iterations): only every `interval`-th round is
  * checkpointed; the rounds between are persisted MEMORY_AND_DISK and
  * re-rooted at a `LogicalRDD` (`createDataFrame(cached.rdd, schema)`).
  * That split matters: the LOGICAL plan must be truncated EVERY round
  * regardless of the interval — the loops reference the previous
  * round's frame ~12 times (self-unions + star joins), so an
  * un-truncated logical tree grows ~12x per round and Catalyst's
  * analyzer, which walks shared subtrees once per reference, goes
  * exponential after a handful of rounds — while the RDD lineage
  * beneath the LogicalRDD keeps chaining (a DAG the scheduler walks
  * once per shuffle stage, never exponentially) back to the last
  * reliable checkpoint's FILES. An executor loss between marks
  * therefore recomputes through at most `interval - 1` rounds of
  * shuffle lineage from the files instead of failing; each marked
  * round's reliable checkpoint also truncates the RDD DAG, so
  * executor-side shuffle state is freed once per interval. The first
  * frame is ALWAYS checkpointed (the loops read it back at
  * label-extraction time and must not re-run the pair pipeline).
  * Priced in SCALING.md ("reliable vs local"): the every-round file
  * write is the dominant reliable-mode tax, so interval > 1 recovers
  * most of it at the price of the bounded replay window.
  *
  * Reliable-mode cost model: a marked round's frame is persisted
  * MEMORY_AND_DISK before the checkpoint mark so the post-action
  * checkpoint WRITE re-reads the cache instead of recomputing the
  * round (Spark materializes reliable checkpoints in a separate pass
  * after the first action). [[roundDone]] — called once per round,
  * after the round's single action — frees dead caches: after a
  * MARKED round's action, every cache up to and including the mark is
  * on disk (later rounds read the FILES), so all are unpersisted;
  * after an unmarked round, only caches older than the just-
  * materialized frame are freed (the newest one feeds the next
  * round; recompute after a loss walks unpersisted lineage back to
  * the files). Files accumulate one rdd-dir per marked round under
  * `path` (O(|E|) ids each); the CALLER owns the directory lifecycle
  * and deletes it once the loop's output has been consumed.
  * `setCheckpointDir` is context-global: concurrent reliable loops on
  * one session share the last dir set (each still gets distinct
  * rdd-subdirs, so they don't collide — they just co-locate).
  */
private[graft] final class IterCheckpoint(spark: SparkSession,
                                          dir: Option[String],
                                          interval: Int = 1) {
  require(interval >= 1, s"checkpoint interval must be >= 1: $interval")
  dir.foreach(spark.sparkContext.setCheckpointDir)
  private val live = scala.collection.mutable.Buffer.empty[DataFrame]
  private var calls = 0
  private var lastMarked = false

  /** Lazily checkpoint `df` (materialized by the caller's next
    * action) when this round is on the interval — local blocks by
    * default, reliable files when a dir was given — or persist it
    * un-truncated between marks.
    */
  def apply(df: DataFrame): DataFrame = {
    lastMarked = calls % interval == 0
    calls += 1
    if (!lastMarked) {
      val cached = df.persist(StorageLevel.MEMORY_AND_DISK)
      live += cached
      // truncate the LOGICAL plan only: the LogicalRDD leaf keeps the
      // analyzer linear while the RDD beneath retains full lineage to
      // the last checkpoint files (see class doc). Reads hit `cached`'s
      // in-memory blocks; a loss recomputes through the RDD DAG.
      spark.createDataFrame(cached.rdd, cached.schema)
    } else dir match {
      case None => df.localCheckpoint(false)
      case Some(_) =>
        val cached = df.persist(StorageLevel.MEMORY_AND_DISK)
        live += cached
        cached.checkpoint(false)
    }
  }

  /** Call after each round's action. After a marked round everything
    * buffered is dead (the files are on disk — Spark writes reliable
    * checkpoints at the end of the job that first computes them);
    * after an unmarked round the just-materialized cache stays (the
    * next round reads it), older ones are freed.
    */
  def roundDone(): Unit = {
    val keep = if (lastMarked) 0 else 1
    if (live.length > keep) {
      live.dropRight(keep).foreach(_.unpersist(false))
      live.remove(0, live.length - keep)
    }
  }
}
