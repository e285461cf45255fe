package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.operators.Dedup

/** Prices the reliable-checkpoint option of the iterative operators
  * (r13 judge ask #1, the SCALING "pricing" half): the SAME
  * components run — the persisted embedding pair-edge frame the
  * dedup_components/dedup_resolve gate queries consume — executed
  * under both truncation policies ([[graft.operators.IterCheckpoint]]):
  *
  *   - local  — `localCheckpoint` round frames (executor-bound blocks;
  *              the default, fastest, dies with its executor)
  *   - reliable — `checkpoint(dir)` round frames on shared storage
  *              (the fault-tolerant mode ClusterFaultSpec proves; each
  *              round pays a persist + a file write + file reads)
  *
  * The two label tables are asserted IDENTICAL before any timing is
  * reported — the price is for the same answer. Median of `iters`
  * steady passes after one warm-up per mode, [[StarAb]] discipline.
  *
  * `runMain graft.R14CkptAb <sfDir> [iters]` on an idle machine.
  * Output: one JSON line (also to SPARK_GRAFT_AB_OUT if set).
  *
  * Dev tool for scaling experiments — not part of the library surface.
  */
object R14CkptAb {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val iters = if (args.length > 1) args(1).toInt else 3
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.skewJoin.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    // the gate queries' deployment shape: pair kernel once, parquet
    // edges consumed by every downstream resolve — so the A/B times
    // the star loop alone, not the kernel
    val edgeDir = java.nio.file.Files
      .createTempDirectory("graft_ckpt_ab_edges").toString
    Dedup.embeddingPairs(Tables.embeddings(spark, sfDir),
        "vec_id", "embedding", minCosine = 0.4)
      .write.mode("overwrite").parquet(edgeDir)
    val edges = spark.read.parquet(edgeDir)
    val nEdges = edges.count()

    def labelsChecksum(ckDir: Option[String],
        interval: Int = 1): (Long, Long, Long) = {
      // strategy=loop: this probe prices the STAR LOOP's truncation
      // policies; the auto path would take the driver union-find at
      // these edge counts (priced separately in R14StratAb)
      val lab = Dedup.components(edges, checkpointDir = ckDir,
        checkpointInterval = interval, strategy = "loop")
      // order-free fingerprint of the full (id, label) table
      val row = lab.agg(count(lit(1)), sum(col("id") * 31 + col("label")),
        sum(col("label"))).collect()(0)
      (row.getLong(0), row.getAs[Number](1).longValue(),
        row.getAs[Number](2).longValue())
    }

    def timedMode(ckDir: Option[String],
        interval: Int = 1): (Double, Seq[Double]) = {
      labelsChecksum(ckDir, interval) // warm-up
      val samples = (1 to iters).map { _ =>
        val t0 = System.nanoTime()
        labelsChecksum(ckDir, interval)
        (System.nanoTime() - t0) / 1e9
      }
      (samples.sorted.apply(samples.length / 2), samples)
    }

    val ckRoot = java.nio.file.Files
      .createTempDirectory("graft_ckpt_ab_reliable").toString

    // equal answers first — the price below is for the same labels
    val base = labelsChecksum(None)
    val rel = labelsChecksum(Some(ckRoot))
    val relI4 = labelsChecksum(Some(ckRoot), interval = 4)
    require(base == rel,
      s"label tables diverge between checkpoint modes: $base vs $rel")
    require(base == relI4,
      s"label tables diverge at interval 4: $base vs $relI4")

    val (localSec, localAll) = timedMode(None)
    val (relSec, relAll) = timedMode(Some(ckRoot))
    // the amortization knob (MLlib PeriodicRDDCheckpointer discipline):
    // checkpoint every 4th round, persist-only between — recovery
    // replays <= 3 rounds from the last files instead of failing
    val (relI4Sec, relI4All) = timedMode(Some(ckRoot), interval = 4)
    // local-mode interval: localCheckpoint marks, wrap+persist between
    // — prices the wrap against the per-round block write the default
    // mode pays (relevant to the gate queries, which run local mode)
    val (locI4Sec, locI4All) = timedMode(None, interval = 4)

    // bytes the reliable mode parked on shared storage (all rounds of
    // the LAST run — earlier runs' rdd dirs accumulate under the same
    // root; caller-owned cleanup, as documented on IterCheckpoint)
    def dirBytes(p: java.nio.file.Path): Long = {
      val s = java.nio.file.Files.walk(p)
      try s.filter(java.nio.file.Files.isRegularFile(_))
        .mapToLong(java.nio.file.Files.size(_)).sum()
      finally s.close()
    }
    val ckBytes = dirBytes(java.nio.file.Paths.get(ckRoot))

    val line = ("{" +
      s""""probe":"ckpt_ab","sf":"$sfDir","edges":$nEdges,""" +
      s""""labels":${base._1},"iters":$iters,""" +
      s""""local_sec":${f"$localSec%.3f"},""" +
      s""""reliable_sec":${f"$relSec%.3f"},""" +
      s""""ratio":${f"${relSec / localSec}%.3f"},""" +
      s""""reliable_i4_sec":${f"$relI4Sec%.3f"},""" +
      s""""ratio_i4":${f"${relI4Sec / localSec}%.3f"},""" +
      s""""local_i4_sec":${f"$locI4Sec%.3f"},""" +
      s""""ratio_local_i4":${f"${locI4Sec / localSec}%.3f"},""" +
      s""""local_i4_all":[${locI4All.map(v => f"$v%.3f").mkString(",")}],""" +
      s""""local_all":[${localAll.map(v => f"$v%.3f").mkString(",")}],""" +
      s""""reliable_all":[${relAll.map(v => f"$v%.3f").mkString(",")}],""" +
      s""""reliable_i4_all":[${relI4All.map(v => f"$v%.3f").mkString(",")}],""" +
      s""""reliable_dir_bytes":$ckBytes}""")
    println(line)
    sys.env.get("SPARK_GRAFT_AB_OUT").foreach { p =>
      java.nio.file.Files.writeString(java.nio.file.Paths.get(p), line + "\n")
    }
    spark.stop()
  }
}
