package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.storage.StorageLevel

private[graft] object IterCheckpoint {
  /** Stable creation-site tag for every RDD this class persists or
    * checkpoints. The leak gate (QueriesSmokeSpec) whitelists lagged
    * checkpoint RDDs by THIS constant instead of a source-file-name
    * substring — renaming the file or inlining a call site can't
    * silently turn the whitelist into match-nothing.
    */
  val CallSiteTag = "graft.IterCheckpoint managed"

  /** Serializes reliable-checkpoint WRITES across all loops in the
    * JVM: `SparkContext.setCheckpointDir` is context-global, so the
    * dir a materializing RDD resolves is whatever was set last. Each
    * loop sets its own subdir and materializes eagerly INSIDE this
    * lock, so files always land under the owning loop's subdir —
    * concurrent reliable loops serialize their (I/O-bound) checkpoint
    * writes but never co-locate or cross-write. Compute between
    * marks is unaffected (the lock is held only for the marked
    * round's materialization).
    */
  private[operators] val reliableWriteLock = new Object
}

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
  *    frame is written under `path/loop_<uuid>` (HDFS/shared fs on a
  *    cluster; any local dir under local masters), EAGERLY and under
  *    a JVM-global write lock (see [[IterCheckpoint.reliableWriteLock]]),
  *    so concurrent reliable loops on one session each keep their
  *    files in their own per-loop subdir. An executor killed mid-loop
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
  * Priced in SCALING.md ("reliable vs local"): the per-mark file
  * write is the dominant reliable-mode tax, so interval > 1 recovers
  * most of it at the price of the bounded replay window.
  *
  * Reliable-mode cost model: a marked round's frame is persisted
  * MEMORY_AND_DISK, then `checkpoint(eager = true)` materializes the
  * cache and writes the files in one pass inside [[apply]] (under the
  * write lock); the cache — and every older one buffered between
  * marks — is unpersisted immediately after, because later rounds and
  * recovery both read the FILES. The caller's per-round action then
  * reads those files (a cheap scan — the round's compute was already
  * paid at the mark). After an UNMARKED round's action, [[roundDone]]
  * frees caches older than the just-materialized frame (the newest
  * one feeds the next round; recompute after a loss walks unpersisted
  * lineage back to the files). Files accumulate one rdd-dir per
  * marked round under the per-loop subdir (O(|E|) ids each); the
  * CALLER owns the `path` lifecycle and deletes it once the loop's
  * output has been consumed.
  *
  * A loop that ends on an UNMARKED round (interval > 1) would leave
  * its final cache pinned until the ContextCleaner collects the
  * unreachable RDD — unbounded GC-dependent time on a long-lived
  * shared session. [[seal]] closes that hole: the loops call it on
  * the converged frame before label extraction, which force-marks the
  * final frame (one extra checkpoint, paid only when the end was
  * unmarked) and releases every residual cache deterministically.
  */
private[graft] final class IterCheckpoint(spark: SparkSession,
                                          dir: Option[String],
                                          interval: Int = 1) {
  require(interval >= 1, s"checkpoint interval must be >= 1: $interval")
  // per-loop subdir: two concurrent reliable loops never share a
  // directory, so "caller deletes its dir after consuming the output"
  // can't destroy another loop's files
  private val loopDir = dir.map(d =>
    s"$d/loop_${java.util.UUID.randomUUID().toString.take(8)}")
  private val live = scala.collection.mutable.Buffer.empty[DataFrame]
  private var calls = 0
  private var lastMarked = false

  /** Run `f` with the stable [[IterCheckpoint.CallSiteTag]] creation
    * site, so every RDD constructed inside carries it in toString —
    * the leak gate's whitelist key.
    */
  private def tagged[T](f: => T): T = {
    val sc = spark.sparkContext
    sc.setCallSite(IterCheckpoint.CallSiteTag)
    try f finally sc.clearCallSite()
  }

  /** Eager reliable checkpoint of an already-persisted frame: set
    * THIS loop's subdir and materialize while holding the JVM-global
    * write lock, then drop every buffered cache (the files now carry
    * the state).
    */
  private def reliableMark(cached: DataFrame, d: String): DataFrame = {
    // heavy compute OUTSIDE the lock: fill the cache first, so the
    // locked section is only a cache scan + the file write (I/O),
    // never another loop's round compute
    cached.count()
    val out = IterCheckpoint.reliableWriteLock.synchronized {
      spark.sparkContext.setCheckpointDir(d)
      tagged(cached.checkpoint(eager = true))
    }
    live.foreach(_.unpersist(false))
    live.clear()
    out
  }

  /** Truncate `df`'s plan for this round: checkpoint it when the
    * round is on the interval — local blocks by default (lazy,
    * materialized by the caller's action), reliable files when a dir
    * was given (eager, see class doc) — or persist it un-truncated
    * between marks.
    */
  def apply(df: DataFrame): DataFrame = {
    lastMarked = calls % interval == 0
    calls += 1
    if (!lastMarked) {
      val cached = tagged(df.persist(StorageLevel.MEMORY_AND_DISK))
      live += cached
      // truncate the LOGICAL plan only: the LogicalRDD leaf keeps the
      // analyzer linear while the RDD beneath retains full lineage to
      // the last checkpoint files (see class doc). Reads hit `cached`'s
      // in-memory blocks; a loss recomputes through the RDD DAG.
      spark.createDataFrame(cached.rdd, cached.schema)
    } else loopDir match {
      case None => tagged(df.localCheckpoint(false))
      case Some(d) =>
        val cached = tagged(df.persist(StorageLevel.MEMORY_AND_DISK))
        live += cached
        reliableMark(cached, d)
    }
  }

  /** Call after each round's action. After a marked round everything
    * buffered is dead (reliable marks already released it in
    * [[apply]]; local marks never buffer); after an unmarked round
    * the just-materialized cache stays (the next round reads it),
    * older ones are freed.
    */
  def roundDone(): Unit = {
    val keep = if (lastMarked) 0 else 1
    if (live.length > keep) {
      live.dropRight(keep).foreach(_.unpersist(false))
      live.remove(0, live.length - keep)
    }
  }

  /** Deterministic end-of-loop release: when the loop ended on an
    * unmarked round, force-mark `df` (its cache was just materialized
    * by the loop's final action, so the extra checkpoint re-reads the
    * cache, not the lineage) and unpersist every residual cache.
    * No-op when nothing is buffered — a loop that ended exactly on a
    * mark pays nothing. Returns the frame the caller should build its
    * output on.
    */
  def seal(df: DataFrame): DataFrame =
    if (live.isEmpty) df
    else loopDir match {
      case None =>
        val out = tagged(df.localCheckpoint(true))
        live.foreach(_.unpersist(false))
        live.clear()
        out
      case Some(d) =>
        val cached = tagged(df.persist(StorageLevel.MEMORY_AND_DISK))
        live += cached
        reliableMark(cached, d)
    }
}
