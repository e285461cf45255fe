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
  *  - `dir = Some(path)`: RELIABLE checkpoint — each round's frame is
  *    written to `path` (HDFS/shared fs on a cluster; any local dir
  *    under local masters). An executor killed mid-loop costs one
  *    stage retry that recomputes from the files, not a failed run.
  *    Proven by ClusterFaultSpec: an executor JVM is killed between
  *    rounds under local-cluster and the loop converges to the
  *    identical label table.
  *
  * Reliable-mode cost model (priced in SCALING.md): the round frame
  * is persisted MEMORY_AND_DISK before the checkpoint mark so the
  * post-action checkpoint WRITE re-reads the cache instead of
  * recomputing the round (Spark materializes reliable checkpoints in
  * a separate pass after the first action). [[roundDone]] — called
  * once per round, after the round's single action — unpersists every
  * cache marked so far: by then all marked checkpoints are on disk
  * and later rounds read the FILES, so the caches are dead weight.
  * Files accumulate one rdd-dir per round under `path` (O(|E|) ids
  * each); the CALLER owns the directory lifecycle and deletes it once
  * the loop's output has been consumed. `setCheckpointDir` is
  * context-global: concurrent reliable loops on one session share the
  * last dir set (each still gets distinct rdd-subdirs, so they don't
  * collide — they just co-locate).
  */
private[graft] final class IterCheckpoint(spark: SparkSession,
                                          dir: Option[String]) {
  dir.foreach(spark.sparkContext.setCheckpointDir)
  private val live = scala.collection.mutable.Buffer.empty[DataFrame]

  /** Lazily checkpoint `df` (materialized by the caller's next
    * action): local blocks by default, reliable files when a dir was
    * given.
    */
  def apply(df: DataFrame): DataFrame = dir match {
    case None => df.localCheckpoint(false)
    case Some(_) =>
      val cached = df.persist(StorageLevel.MEMORY_AND_DISK)
      live += cached
      cached.checkpoint(false)
  }

  /** Call after each round's action: every checkpoint marked so far
    * is on disk (Spark writes reliable checkpoints at the end of the
    * job that first computes them), so the backing caches are dead.
    * No-op in local mode.
    */
  def roundDone(): Unit = {
    live.foreach(_.unpersist(false))
    live.clear()
  }
}
