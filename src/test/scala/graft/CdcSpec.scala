package graft

import java.nio.file.{Files, Paths}

import graft.operators.Cdc
import org.apache.spark.sql.functions._

import scala.jdk.CollectionConverters._

class CdcSpec extends SparkSpec {
  import spark.implicits._

  private val log = Seq(
    // key 1: I then U — update wins
    (1L, "I", 10L, "a", 1.0),
    (1L, "U", 20L, "a", 2.0),
    // key 2: I then D — gone
    (2L, "I", 10L, "b", 1.0),
    (2L, "D", 30L, null.asInstanceOf[String], 0.0),
    // key 3: plain insert
    (3L, "I", 10L, "c", 3.0),
    // key 4: deleted then re-inserted later — alive
    (4L, "I", 10L, "d", 4.0),
    (4L, "D", 20L, null.asInstanceOf[String], 0.0),
    (4L, "I", 30L, "d2", 4.5),
    // key 5: same-ts tie between U and D — op desc makes U win
    (5L, "I", 10L, "e", 5.0),
    (5L, "D", 20L, null.asInstanceOf[String], 0.0),
    (5L, "U", 20L, "e2", 5.5))
    .toDF("k", "op", "ts", "name", "v")

  test("applyLog: latest change wins, deletes drop, re-insert revives, ties deterministic") {
    val out = Cdc.applyLog(log, Seq("k"), "op", "ts")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getDouble(2))).toSet
    assert(out == Set(
      (1L, "a", 2.0),
      (3L, "c", 3.0),
      (4L, "d2", 4.5),
      (5L, "e2", 5.5)))
  }

  test("upsert: matched rows replaced, unmatched insert, delete flag removes") {
    val target = Seq((1L, "a", 1.0), (2L, "b", 2.0), (3L, "c", 3.0))
      .toDF("k", "name", "v")
    val changes = Seq(
      (2L, "b2", 20.0, false),  // update
      (4L, "d", 4.0, false),    // insert
      (3L, null.asInstanceOf[String], 0.0, true)) // delete
      .toDF("k", "name", "v", "del")
    val out = Cdc.upsert(target, changes, Seq("k"), Some("del"))
      .collect().map(r => (r.getLong(0), r.getString(1), r.getDouble(2))).toSet
    assert(out == Set((1L, "a", 1.0), (2L, "b2", 20.0), (4L, "d", 4.0)))
  }

  test("upsert without delete column keeps pure replace semantics") {
    val target = Seq((1L, 1.0), (2L, 2.0)).toDF("k", "v")
    val changes = Seq((2L, 20.0), (3L, 3.0)).toDF("k", "v")
    val out = Cdc.upsert(target, changes, Seq("k"))
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toSet
    assert(out == Set((1L, 1.0), (2L, 20.0), (3L, 3.0)))
  }

  test("upsertPartitioned rewrites only touched partitions at the file level") {
    val dir = Files.createTempDirectory("graft_cow").toString
    val target = Seq(
      (1L, "p0", 1.0), (2L, "p0", 2.0),
      (3L, "p1", 3.0),
      (4L, "p2", 4.0), (5L, "p2", 5.0))
      .toDF("k", "part", "v")
    target.write.mode("overwrite").partitionBy("part").parquet(dir)

    def partFiles(p: String): Map[String, Long] = {
      val d = Paths.get(dir, s"part=$p")
      if (!Files.exists(d)) Map.empty
      else Files.list(d).iterator().asScala
        .filter(f => f.getFileName.toString.endsWith(".parquet"))
        .map(f => f.toString -> Files.getLastModifiedTime(f).toMillis).toMap
    }
    val p1Before = partFiles("p1")
    assert(p1Before.nonEmpty)

    val changes = Seq(
      (2L, "p0", 20.0, false),  // update in p0
      (6L, "p3", 6.0, false),   // insert into NEW partition p3
      (4L, "p2", 0.0, true),    // delete from p2
      (5L, "p2", 0.0, true))    // delete the REST of p2 -> partition vanishes
      .toDF("k", "part", "v", "del")
    val touched = Cdc.upsertPartitioned(spark, dir, changes, Seq("k"), "part", Some("del"))
    assert(touched == Seq("p0", "p2", "p3"))

    // untouched partition: identical files, same mtimes
    assert(partFiles("p1") == p1Before)
    // fully-deleted partition directory is gone
    assert(partFiles("p2").isEmpty)
    // no staging residue
    assert(!Files.list(Paths.get(dir)).iterator().asScala
      .exists(_.getFileName.toString.startsWith("_staging_")))

    val out = spark.read.parquet(dir)
      .select(col("k"), col("part").cast("string"), col("v"))
      .collect().map(r => (r.getLong(0), r.getString(1), r.getDouble(2))).toSet
    assert(out == Set(
      (1L, "p0", 1.0), (2L, "p0", 20.0),
      (3L, "p1", 3.0),
      (6L, "p3", 6.0)))
  }

  test("cdcMergeSink maintains a partitioned lake table across micro-batches") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val dir = Files.createTempDirectory("graft_cdc_stream").toString + "/table"
    val ckpt = Files.createTempDirectory("graft_cdc_ckpt").toString
    val in = MemoryStream[(Long, String, Double, String, Long)]
    val stream = in.toDF().toDF("k", "part", "v", "op", "ts")
    def drain(): Unit = {
      val q = graft.streaming.StreamIngest.cdcMergeSink(
        stream, dir, Seq("k"), "part", "op", "ts", ckpt).start()
      q.awaitTermination()
    }
    // batch 1: inserts across two partitions (first batch CREATES the
    // table); key 1 gets an insert+update in the same batch — the
    // collapse must keep only the update
    in.addData((1L, "p0", 1.0, "I", 10L), (1L, "p0", 1.5, "U", 20L),
      (2L, "p1", 2.0, "I", 10L))
    drain()
    def snapshot(): Set[(Long, String, Double)] =
      spark.read.parquet(dir)
        .select(col("k"), col("part").cast("string"), col("v"))
        .collect().map(r => (r.getLong(0), r.getString(1), r.getDouble(2))).toSet
    assert(snapshot() == Set((1L, "p0", 1.5), (2L, "p1", 2.0)))
    val p1Files = Files.list(Paths.get(dir, "part=p1")).iterator().asScala
      .filter(_.getFileName.toString.endsWith(".parquet"))
      .map(f => f.toString -> Files.getLastModifiedTime(f).toMillis).toMap
    // batch 2: touches only p0 (update key 1, delete nothing, insert 3)
    in.addData((1L, "p0", 9.0, "U", 30L), (3L, "p0", 3.0, "I", 30L))
    drain()
    assert(snapshot() == Set((1L, "p0", 9.0), (2L, "p1", 2.0), (3L, "p0", 3.0)))
    // p1 was untouched at the file level by batch 2
    val p1After = Files.list(Paths.get(dir, "part=p1")).iterator().asScala
      .filter(_.getFileName.toString.endsWith(".parquet"))
      .map(f => f.toString -> Files.getLastModifiedTime(f).toMillis).toMap
    assert(p1After == p1Files)
    // batch 3: delete key 2 -> partition p1 vanishes entirely
    in.addData((2L, "p1", 0.0, "D", 40L))
    drain()
    assert(snapshot() == Set((1L, "p0", 9.0), (3L, "p0", 3.0)))
    assert(!Files.exists(Paths.get(dir, "part=p1")))
  }

  test("upsertPartitioned rolls back completely when a rename fails mid-swap") {
    val dir = Files.createTempDirectory("graft_cow_fault").toString
    val target = Seq(
      (1L, "p0", 1.0), (2L, "p1", 2.0), (3L, "p2", 3.0))
      .toDF("k", "part", "v")
    target.write.mode("overwrite").partitionBy("part").parquet(dir)

    def allFiles(): Map[String, Long] =
      Files.walk(Paths.get(dir)).iterator().asScala
        .filter(f => Files.isRegularFile(f) && f.toString.endsWith(".parquet"))
        .map(f => f.toString -> Files.getLastModifiedTime(f).toMillis).toMap
    val before = allFiles()
    val snapBefore = spark.read.parquet(dir)
      .select(col("k"), col("part").cast("string"), col("v"))
      .collect().map(r => (r.getLong(0), r.getString(1), r.getDouble(2))).toSet

    val changes = Seq(
      (1L, "p0", 10.0, false), (2L, "p1", 20.0, false), (3L, "p2", 30.0, false))
      .toDF("k", "part", "v", "del")

    // fault AFTER the first partition fully swapped (its old copy is
    // only in the backup dir) and the second is backed up but not yet
    // swapped — the two states the old delete-first loop destroyed
    val faults = Seq(
      new graft.operators.SwapHooks {
        private var n = 0
        override def beforeSwap(d: String): Unit = {
          n += 1; if (n == 2) throw new java.io.IOException("injected beforeSwap")
        }
      },
      new graft.operators.SwapHooks {
        private var n = 0
        override def afterBackup(d: String): Unit = {
          n += 1; if (n == 2) throw new java.io.IOException("injected afterBackup")
        }
      })
    for (hooks <- faults) {
      val e = intercept[java.io.IOException] {
        Cdc.upsertPartitioned(spark, dir, changes, Seq("k"), "part", Some("del"),
          hooks, graft.operators.SwapCommitter.hadoop)
      }
      assert(e.getMessage.startsWith("injected"))
      // byte-identical pre-call state: same files, same mtimes, no residue
      assert(allFiles() == before)
      assert(!Files.list(Paths.get(dir)).iterator().asScala.exists { f =>
        val n = f.getFileName.toString
        n.startsWith("_staging_") || n.startsWith("_backup_")
      })
      val snapAfter = spark.read.parquet(dir)
        .select(col("k"), col("part").cast("string"), col("v"))
        .collect().map(r => (r.getLong(0), r.getString(1), r.getDouble(2))).toSet
      assert(snapAfter == snapBefore)
    }
    // and a clean retry after the fault succeeds
    val touched = Cdc.upsertPartitioned(spark, dir, changes, Seq("k"), "part", Some("del"))
    assert(touched == Seq("p0", "p1", "p2"))
    val out = spark.read.parquet(dir)
      .select(col("k"), col("v"))
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toSet
    assert(out == Set((1L, 10.0), (2L, 20.0), (3L, 30.0)))
  }

  test("post-commit cleanup failure never rolls back a committed swap") {
    val dir = Files.createTempDirectory("graft_cow_cleanup").toString
    Seq((1L, "p0", 1.0), (2L, "p1", 2.0)).toDF("k", "part", "v")
      .write.mode("overwrite").partitionBy("part").parquet(dir)
    val changes = Seq((1L, "p0", 10.0, false), (2L, "p1", 20.0, false))
      .toDF("k", "part", "v", "del")

    // committer whose deletes always fail: the swap loop itself
    // succeeds, so the merge must stand (cleanup is best-effort) —
    // the old code routed this failure into the rollback, which
    // deleted every swapped-in live dir and then died on the
    // already-half-gone backups
    val noDelete = new graft.operators.SwapCommitter {
      def rename(fs: org.apache.hadoop.fs.FileSystem,
                 src: org.apache.hadoop.fs.Path,
                 dst: org.apache.hadoop.fs.Path): Unit =
        graft.operators.SwapCommitter.hadoop.rename(fs, src, dst)
      def delete(fs: org.apache.hadoop.fs.FileSystem,
                 path: org.apache.hadoop.fs.Path): Unit =
        throw new java.io.IOException(s"injected delete failure: $path")
    }
    val touched = Cdc.upsertPartitioned(spark, dir, changes, Seq("k"), "part",
      Some("del"), graft.operators.SwapHooks.none, noDelete)
    assert(touched == Seq("p0", "p1"))

    // merged data is live — underscore residue is invisible to readers
    val out = spark.read.parquet(dir)
      .select(col("k"), col("v"))
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toSet
    assert(out == Set((1L, 10.0), (2L, 20.0)))
    // cleanup residue stays on disk (deletes failed), never the only copy
    assert(Files.list(Paths.get(dir)).iterator().asScala
      .exists(_.getFileName.toString.startsWith("_backup_")))

    // a later merge with a working committer still lands cleanly
    val more = Seq((3L, "p0", 3.0, false)).toDF("k", "part", "v", "del")
    Cdc.upsertPartitioned(spark, dir, more, Seq("k"), "part", Some("del"))
    val out2 = spark.read.parquet(dir)
      .select(col("k"), col("v"))
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toSet
    assert(out2 == Set((1L, 10.0), (2L, 20.0), (3L, 3.0)))
  }

  test("upsertPartitioned handles hive-escaped and null partition values") {
    val dir = Files.createTempDirectory("graft_cow_esc").toString
    val target = Seq(
      (1L, "a:b", 1.0), (2L, "x=y", 2.0), (3L, "p%1", 3.0),
      (4L, null.asInstanceOf[String], 4.0), (5L, "plain", 5.0))
      .toDF("k", "part", "v")
    target.write.mode("overwrite").partitionBy("part").parquet(dir)

    val plainBefore = Files.list(Paths.get(dir, "part=plain")).iterator().asScala
      .filter(_.getFileName.toString.endsWith(".parquet"))
      .map(f => f.toString -> Files.getLastModifiedTime(f).toMillis).toMap

    val changes = Seq(
      (1L, "a:b", 10.0, false),                      // update escaped ':'
      (2L, "x=y", 0.0, true),                        // delete whole '=' partition
      (6L, "p%1", 6.0, false),                       // insert into escaped '%'
      (4L, null.asInstanceOf[String], 40.0, false))  // update null partition
      .toDF("k", "part", "v", "del")
    val touched = Cdc.upsertPartitioned(spark, dir, changes, Seq("k"), "part", Some("del"))
    assert(touched == Seq(null, "a:b", "p%1", "x=y"))

    // untouched partition untouched at the file level
    val plainAfter = Files.list(Paths.get(dir, "part=plain")).iterator().asScala
      .filter(_.getFileName.toString.endsWith(".parquet"))
      .map(f => f.toString -> Files.getLastModifiedTime(f).toMillis).toMap
    assert(plainAfter == plainBefore)
    // fully-deleted escaped partition dir is gone (Spark writes 'x=y'
    // as part=x%3Dy)
    assert(!Files.exists(Paths.get(dir, "part=x%3Dy")))
    assert(!Files.list(Paths.get(dir)).iterator().asScala.exists { f =>
      val n = f.getFileName.toString
      n.startsWith("_staging_") || n.startsWith("_backup_")
    })

    val out = spark.read.parquet(dir)
      .select(col("k"), col("part").cast("string"), col("v"))
      .collect().map(r => (r.getLong(0), r.getString(1), r.getDouble(2))).toSet
    assert(out == Set(
      (1L, "a:b", 10.0), (3L, "p%1", 3.0), (6L, "p%1", 6.0),
      (4L, null, 40.0), (5L, "plain", 5.0)))
  }

  test("upsertPartitioned with an empty batch is a no-op") {
    val dir = Files.createTempDirectory("graft_cow_empty").toString
    Seq((1L, "p0", 1.0)).toDF("k", "part", "v")
      .write.mode("overwrite").partitionBy("part").parquet(dir)
    val empty = Seq.empty[(Long, String, Double, Boolean)]
      .toDF("k", "part", "v", "del")
    assert(Cdc.upsertPartitioned(spark, dir, empty, Seq("k"), "part", Some("del")).isEmpty)
    assert(spark.read.parquet(dir).count() == 1)
  }

  test("takedown hygiene: a delete-upsert leaves no superseded bytes; vacuum reaps aged residue only") {
    val dir = Files.createTempDirectory("graft_vacuum").toString
    Seq((1L, "p0", "keepme"), (2L, "p0", "ERASE-ME"), (3L, "p1", "other"))
      .toDF("k", "part", "v")
      .write.mode("overwrite").partitionBy("part").parquet(dir)
    def allFiles(): Set[String] =
      Files.walk(Paths.get(dir)).iterator().asScala
        .filter(Files.isRegularFile(_)).map(_.toString).toSet
    val before = allFiles()
    val oldP0 = before.filter(_.contains("part=p0"))
    assert(oldP0.nonEmpty)

    // right-to-erasure: delete key 2
    Cdc.upsertPartitioned(spark, dir,
      Seq((2L, "p0", "", true)).toDF("k", "part", "v", "del"),
      Seq("k"), "part", Some("del"))

    // the files that HELD the erased row are gone from disk — not just
    // hidden from readers — and no swap residue remains anywhere
    val after = allFiles()
    assert(oldP0.forall(f => !after.contains(f)),
      "superseded p0 files must be physically removed")
    assert(Cdc.swapResidue(spark, dir).isEmpty)
    assert(spark.read.parquet(dir).filter(col("k") === 2L).count() == 0)

    // plant residue (the failed-rollback / failed-cleanup leftovers)
    val b = Paths.get(dir, "_backup_old", "part=p0")
    val s = Paths.get(dir, "_staging_old")
    Files.createDirectories(b)
    Files.createDirectories(s)
    Files.write(b.resolve("f.parquet"), Array[Byte](1, 2, 3))
    val residue = Cdc.swapResidue(spark, dir)
    assert(residue.size == 2)
    assert(residue.forall(p => p.contains("_backup_old") || p.contains("_staging_old")))

    // a retention window longer than the dirs' age reaps nothing (an
    // in-flight swap's staging dir must survive a concurrent vacuum)
    assert(Cdc.vacuum(spark, dir, olderThanMs = 3600L * 1000).isEmpty)
    assert(Cdc.swapResidue(spark, dir).size == 2)

    // aged out: vacuum removes exactly the residue, never live dirs
    val removed = Cdc.vacuum(spark, dir, olderThanMs = 0)
    assert(removed.size == 2)
    assert(Cdc.swapResidue(spark, dir).isEmpty)
    assert(!Files.exists(b) && !Files.exists(s))
    assert(spark.read.parquet(dir).count() == 2)

    // vacuum on a path with no residue (or no table at all) is a no-op
    assert(Cdc.vacuum(spark, dir, olderThanMs = 0).isEmpty)
    assert(Cdc.vacuum(spark, dir + "/nope", olderThanMs = 0).isEmpty)
  }
}
