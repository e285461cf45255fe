package graft.operators

import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.catalog.ExternalCatalogUtils
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import scala.collection.mutable.ListBuffer

/** Change-data-capture application and keyed copy-on-write upsert.
  *
  * The reference only ever appends to its warehouse tables
  * (dataframe_tasks.py:78 `if_exists='append'`; tasks_postgres.py
  * loads every cleaned frame the same way), so replayed or corrected
  * source drops accumulate as duplicate rows. The warehouse-correct
  * primitives are: collapse an ordered I/U/D change log to the
  * current snapshot ([[applyLog]]), merge a change batch into an
  * existing keyed table ([[upsert]]), and do that merge against a
  * partitioned parquet table touching ONLY the partitions the batch
  * hits ([[upsertPartitioned]] — the copy-on-write mechanics every
  * table format (Delta/Iceberg/Hudi) builds on, expressed directly
  * over parquet + rename).
  *
  * Scale shape: [[applyLog]] is one window shuffle on the key.
  * [[upsert]] is one anti join, broadcast when the batch is small
  * (the normal CDC case). [[upsertPartitioned]] prunes the target
  * scan to the touched partitions (partition filter from a bounded
  * distinct-collect of the batch's partition values — the same
  * bounded-by-construction class as the IVF centroid collect) and
  * rewrites only those directories; a 100 TB table with a
  * 10-partition batch reads and writes 10 partitions, not the table.
  */
object Cdc {

  /** Collapse an I/U/D change log to the live snapshot: the latest
    * change per key wins (ties on the timestamp resolve by op then
    * payload, so replays are deterministic), and keys whose latest
    * change is a delete disappear. One window shuffle on the key.
    *
    * `opCol` values: 'I' (insert), 'U' (update), 'D' (delete) —
    * anything non-'D' carries a full payload row.
    */
  def applyLog(changes: DataFrame, keyCols: Seq[String], opCol: String,
               tsCol: String): DataFrame =
    collapseLog(changes, keyCols, opCol, tsCol)
      .filter(!col("__del")).drop("__del")

  /** Latest change per key with the delete carried as a `__del` flag
    * instead of dropped — the form the merge sinks consume (a merge
    * must SEE deletes; [[applyLog]] is this minus the deleted keys).
    */
  def collapseLog(changes: DataFrame, keyCols: Seq[String], opCol: String,
                  tsCol: String): DataFrame = {
    require(keyCols.nonEmpty, "keyCols required")
    val payload = changes.columns.filterNot(c =>
      keyCols.contains(c) || c == opCol || c == tsCol)
    val w = Window.partitionBy(keyCols.map(col): _*)
      .orderBy(col(tsCol).desc, col(opCol).desc,
        struct(payload.map(col).toSeq: _*).desc)
    changes.withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1)
      .withColumn("__del", col(opCol) === "D")
      .drop("__rn", opCol, tsCol)
  }

  /** Merge a keyed change batch into a target frame: rows in
    * `changes` replace target rows with the same key, unmatched
    * change rows insert, and (when `deleteCol` is given) change rows
    * flagged true delete their key instead. Exactly the semantics of
    * SQL MERGE with matched-update + not-matched-insert (+ matched-
    * delete). The batch must carry at most one row per key — feed a
    * raw log through [[applyLog]] first.
    *
    * One anti join on the key; Spark broadcasts the batch side when
    * it is small, which is the normal CDC shape.
    */
  def upsert(target: DataFrame, changes: DataFrame, keyCols: Seq[String],
             deleteCol: Option[String] = None): DataFrame = {
    require(keyCols.nonEmpty, "keyCols required")
    val keep = target.join(
      changes.select(keyCols.map(col): _*), keyCols, "left_anti")
    val applied = deleteCol match {
      case Some(dc) => changes.filter(!coalesce(col(dc), lit(false))).drop(dc)
      case None => changes
    }
    keep.unionByName(applied.select(target.columns.map(col).toSeq: _*))
  }

  /** Copy-on-write upsert into a parquet table partitioned by
    * `partCol`: only the partitions present in the change batch are
    * read, merged, rewritten to a staging directory, and swapped into
    * place by rename; every other partition's files are untouched
    * (CdcSpec asserts this at the file level). New partition values
    * in the batch create new directories. Returns the touched
    * partition values.
    *
    * This is the table-format COW loop without the table format:
    * stage-then-rename keeps readers of untouched partitions
    * consistent, and a crash before the swap leaves the table intact
    * (staging is simply re-created on retry). Cross-partition key
    * moves are out of contract — a key's partition value must be
    * stable (the universal restriction for partition-pruned merges).
    *
    * The swap never holds a partition's ONLY copy in a deletable
    * place: each live dir is renamed to a backup, the staged dir
    * renamed into place, and the backup deleted only after every
    * swap succeeded. A failure mid-loop rolls back — staged copies
    * already swapped in are renamed BACK into staging (never
    * deleted) and every backup is renamed back — so the table is
    * byte-identical to its pre-call state; if even the rollback
    * fails, the backups stay on disk under `_backup_<uuid>/`
    * (underscore-prefixed, invisible to readers) for manual
    * recovery, never deleted. Once every swap has landed the merge
    * is COMMITTED: the trailing backup/staging deletes are pure
    * cleanup, so a failure there is logged and left on disk — it
    * must never trigger the rollback (rolling back a committed swap
    * would delete the only live copy).
    *
    * Rename atomicity: this loop is correct on HDFS-like stores
    * where directory rename is a single atomic metadata operation.
    * On S3-class object stores rename is copy+delete and NON-atomic
    * — a reader can observe a partition mid-copy and a crash can
    * leave a half-copied dir. Plug a store-native commit (manifest
    * or multi-object atomic commit) via [[SwapCommitter]] instead of
    * pointing this at an object-store path.
    *
    * Partition directory names are built with the same Hive escaping
    * Spark uses when writing (`ExternalCatalogUtils`), so values with
    * '%', ':', '=', '/', and null/empty values (the
    * `__HIVE_DEFAULT_PARTITION__` dir) swap correctly instead of
    * missing the dir Spark actually wrote.
    */
  def upsertPartitioned(spark: SparkSession, tablePath: String,
                        changes: DataFrame, keyCols: Seq[String],
                        partCol: String,
                        deleteCol: Option[String] = None,
                        committer: SwapCommitter = SwapCommitter.hadoop): Seq[String] =
    upsertPartitioned(spark, tablePath, changes, keyCols, partCol, deleteCol,
      SwapHooks.none, committer)

  /** Test seam: `hooks` fires inside the swap loop so a spec can
    * inject a fault at an exact point and assert full rollback.
    */
  private[graft] def upsertPartitioned(spark: SparkSession, tablePath: String,
                                       changes: DataFrame, keyCols: Seq[String],
                                       partCol: String,
                                       deleteCol: Option[String],
                                       hooks: SwapHooks,
                                       committer: SwapCommitter): Seq[String] = {
    require(keyCols.nonEmpty, "keyCols required")
    require(!keyCols.contains(partCol), "partCol cannot be a key column")
    // bounded by the table's partition count (dates/tenants/buckets),
    // not by data size — same collect class as the IVF centroids
    val touched = changes.select(col(partCol).cast("string")).distinct()
      .collect().map(_.getString(0)).toSeq.sortBy(Option(_))
    if (touched.isEmpty) return touched

    val fs = new Path(tablePath).getFileSystem(spark.sparkContext.hadoopConfiguration)
    // writer lock around the WHOLE read-merge-swap: a second
    // concurrent upsert into this table fails loudly instead of
    // losing the other's update or nesting a live dir inside its
    // swap (PathLock doc; ConcurrencySpec pins both the failure and
    // that retry-after-completion lands both batches)
    PathLock.withLock(fs, new Path(tablePath), "upsertPartitioned") {
    // null and "" both land in __HIVE_DEFAULT_PARTITION__ and read
    // back as null — the scan filter must ask for null, not ""
    val nonDefault = touched.filter(v => v != null && v.nonEmpty)
    val scanFilter = {
      val base = col(partCol).cast("string").isin(nonDefault: _*)
      if (nonDefault.size < touched.size) base || col(partCol).isNull else base
    }
    // first contact creates the table: an empty target with the
    // change schema (minus the delete flag) makes the merge below a
    // pure insert — the streaming CDC sink relies on this. "Has
    // data", not "exists": the lock file's mkdirs means the dir
    // exists from the first acquire, and a second first-contact
    // writer serialized behind the lock must SEE the first one's
    // partitions (underscore entries are lock/staging/backup)
    val tableHasData = fs.listStatus(new Path(tablePath))
      .exists(st => !st.getPath.getName.startsWith("_"))
    val target =
      if (tableHasData)
        spark.read.parquet(tablePath).filter(scanFilter)
      else
        deleteCol.fold(changes)(dc => changes.drop(dc)).filter(lit(false))
    val merged = upsert(target, changes, keyCols, deleteCol)

    val swapId = java.util.UUID.randomUUID.toString
    val staging = new Path(tablePath, s"_staging_$swapId")
    merged.write.mode("overwrite").partitionBy(partCol).parquet(staging.toString)

    // escaped dir names, deduped (null and "" collapse to one dir)
    val dirNames = touched
      .map(v => ExternalCatalogUtils.getPartitionPathString(partCol, v)).distinct
    val backupRoot = new Path(tablePath, s"_backup_$swapId")
    fs.mkdirs(backupRoot)
    val backedUp = ListBuffer.empty[String]  // live -> backup done
    val swappedIn = ListBuffer.empty[String] // staged -> live done
    // the try covers ONLY the swap loop: once it exits, the merge is
    // committed and the trailing deletes are cleanup that must never
    // trigger the rollback (it would delete the only live copies)
    try {
      dirNames.foreach { d =>
        val live = new Path(tablePath, d)
        val staged = new Path(staging, d)
        hooks.beforeSwap(d)
        if (fs.exists(live)) {
          committer.rename(fs, live, new Path(backupRoot, d))
          backedUp += d
        }
        hooks.afterBackup(d)
        // a partition can vanish entirely (every row deleted): the
        // staged dir is then absent and the live dir stays backed up
        if (fs.exists(staged)) {
          committer.rename(fs, staged, live)
          swappedIn += d
        }
      }
    } catch {
      case e: Throwable =>
        try {
          // undo renames in reverse, deleting NOTHING until every
          // backup is restored: swapped-in staged dirs go back into
          // staging (not deleted — a delete here plus a failed
          // restore below would leave no copy at all), then every
          // backup returns to its live path
          swappedIn.foreach(d =>
            committer.rename(fs, new Path(tablePath, d), new Path(staging, d)))
          backedUp.foreach(d =>
            committer.rename(fs, new Path(backupRoot, d), new Path(tablePath, d)))
          // all copies are back in place — residue is safe to drop
          committer.delete(fs, backupRoot)
          committer.delete(fs, staging)
        } catch {
          // rollback itself failed: leave backups + staging on disk
          // for manual recovery rather than deleting anything
          case r: Throwable => e.addSuppressed(r)
        }
        throw e
    }
    // committed: every swap landed. Cleanup is best-effort — a
    // failure here leaves _backup_/_staging_ residue (underscore
    // dirs, invisible to readers) but the merge stands.
    try {
      committer.delete(fs, backupRoot)
      committer.delete(fs, staging)
    } catch {
      case c: Throwable =>
        System.err.println(
          s"[cdc] post-commit cleanup failed (merge is committed; " +
          s"stale $backupRoot / $staging left for manual removal): ${c.getMessage}")
    }
    touched
    }
  }

  /** Swap residue under `tablePath`: the `_backup_<uuid>/` and
    * `_staging_<uuid>/` directories a failed rollback or failed
    * post-commit cleanup leaves behind. Underscore-prefixed, so
    * readers never see them — but the BYTES are still on disk, which
    * for a delete-upsert (takedown, right-to-erasure) is a compliance
    * problem, not a cosmetic one. This is the audit surface; feed it
    * to [[vacuum]] or alerting.
    */
  def swapResidue(spark: SparkSession, tablePath: String): Seq[String] = {
    val root = new Path(tablePath)
    val fs = root.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(root)) return Seq.empty
    fs.listStatus(root).toSeq
      .filter(s => s.isDirectory && {
        val n = s.getPath.getName
        n.startsWith("_backup_") || n.startsWith("_staging_")
      })
      .map(_.getPath.toString).sorted
  }

  /** Remove aged swap residue (see [[swapResidue]]): every
    * `_backup_*`/`_staging_*` directory whose modification time is
    * older than `olderThanMs` is deleted; younger dirs are left alone
    * because they may belong to an IN-FLIGHT swap (a concurrent
    * upsert's staging write or a just-failed swap an operator is
    * still recovering by hand). Live partition directories are never
    * candidates. Returns the removed paths.
    *
    * Run it the way table formats run VACUUM: periodically, with a
    * retention window comfortably longer than any swap could run
    * (default 24 h). After a MANUAL recovery from a failed rollback,
    * run it with the retention you can attest to — the takedown is
    * not complete until this has removed the backup bytes.
    */
  def vacuum(spark: SparkSession, tablePath: String,
             olderThanMs: Long = 24L * 3600 * 1000,
             committer: SwapCommitter = SwapCommitter.hadoop): Seq[String] = {
    require(olderThanMs >= 0, s"olderThanMs must be >= 0: $olderThanMs")
    val root = new Path(tablePath)
    val fs = root.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val cutoff = System.currentTimeMillis() - olderThanMs
    swapResidue(spark, tablePath)
      .map(new Path(_))
      .filter(p => fs.getFileStatus(p).getModificationTime <= cutoff)
      .map { p => committer.delete(fs, p); p.toString }
  }
}

/** The filesystem commit primitives [[Cdc.upsertPartitioned]] swaps
  * with. The default delegates to Hadoop `rename`/`delete`, which is
  * a single atomic metadata operation on HDFS-like stores. On
  * S3-class object stores rename is copy+delete and NON-atomic:
  * implement this seam with the store's native commit mechanism
  * (a manifest commit, S3 multi-object atomic ops, a table-format
  * committer) — the merge logic above never needs to change.
  */
trait SwapCommitter {
  /** Move `src` to `dst`; must throw if the move did not happen. */
  def rename(fs: FileSystem, src: Path, dst: Path): Unit
  /** Recursively remove `path`; must throw on failure. */
  def delete(fs: FileSystem, path: Path): Unit
}

object SwapCommitter {
  /** Plain Hadoop FileSystem ops — atomic rename on HDFS-like stores. */
  val hadoop: SwapCommitter = new SwapCommitter {
    def rename(fs: FileSystem, src: Path, dst: Path): Unit =
      if (!fs.rename(src, dst))
        throw new java.io.IOException(s"rename failed: $src -> $dst")
    def delete(fs: FileSystem, path: Path): Unit =
      if (!fs.delete(path, true) && fs.exists(path))
        throw new java.io.IOException(s"delete failed: $path")
  }
}

/** Fault-injection points inside [[Cdc.upsertPartitioned]]'s swap
  * loop; production passes [[SwapHooks.none]].
  */
private[graft] trait SwapHooks {
  def beforeSwap(dirName: String): Unit = ()
  def afterBackup(dirName: String): Unit = ()
}

private[graft] object SwapHooks {
  val none: SwapHooks = new SwapHooks {}
}
