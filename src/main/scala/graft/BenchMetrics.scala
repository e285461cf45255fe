package graft

import java.util.concurrent.atomic.AtomicLong

import org.apache.spark.scheduler.{SparkListener, SparkListenerJobStart, SparkListenerTaskEnd}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.execution.SparkPlan
import org.apache.spark.sql.execution.exchange.{BroadcastExchangeLike, ShuffleExchangeLike}

/** Per-query execution accounting for Bench (r12 judge ask #1).
  *
  * The 100 TB argument was fitted on local[32] WALL TIME, which
  * conflates data movement with single-JVM effects (GC, JIT, page
  * cache). The numbers a real cluster obeys are the ones that cross
  * the network and the spill disk: shuffle bytes read/written, spill
  * bytes, peak per-task execution memory. This listener sums task
  * metrics between explicit markers so Bench can publish a per-query
  * delta for every rung and SCALING can fit decade exponents on
  * BYTES MOVED, not just seconds.
  *
  * Delivery barrier: listener events are asynchronous, so a snapshot
  * taken right after an action could miss in-flight TaskEnds. The
  * bus delivers events to one listener in post order, and a job's
  * TaskEnds are posted before its JobEnd — so after a query's action
  * returns, running one tiny MARKER job and waiting until this
  * listener has seen the marker's JobStart guarantees every earlier
  * TaskEnd was delivered (no private listener-bus API needed).
  */
final class BenchMetricsListener extends SparkListener {
  val shuffleRead = new AtomicLong(0L)
  val shuffleWrite = new AtomicLong(0L)
  val memSpill = new AtomicLong(0L)
  val diskSpill = new AtomicLong(0L)
  val peakTaskMem = new AtomicLong(0L)
  @volatile var lastMarker: String = ""

  override def onTaskEnd(te: SparkListenerTaskEnd): Unit = {
    val m = te.taskMetrics
    if (m != null) {
      shuffleRead.addAndGet(m.shuffleReadMetrics.totalBytesRead)
      shuffleWrite.addAndGet(m.shuffleWriteMetrics.bytesWritten)
      memSpill.addAndGet(m.memoryBytesSpilled)
      diskSpill.addAndGet(m.diskBytesSpilled)
      peakTaskMem.getAndAccumulate(m.peakExecutionMemory, math.max(_, _))
    }
  }

  override def onJobStart(js: SparkListenerJobStart): Unit = {
    val p = js.properties
    if (p != null) {
      val m = p.getProperty(BenchMetricsListener.MarkerKey)
      if (m != null) lastMarker = m
    }
  }
}

object BenchMetricsListener {
  private val MarkerKey = "graft.bench.metrics.marker"

  final case class Snapshot(shuffleRead: Long, shuffleWrite: Long,
                            memSpill: Long, diskSpill: Long,
                            peakTaskMem: Long) {
    def minus(prev: Snapshot): Snapshot = Snapshot(
      shuffleRead - prev.shuffleRead, shuffleWrite - prev.shuffleWrite,
      memSpill - prev.memSpill, diskSpill - prev.diskSpill,
      // peak is a high-water mark, not a counter: the per-window value
      // is the absolute mark observed so far (reset is not possible
      // without racing in-flight tasks); callers treat it as "peak so
      // far", which upper-bounds the window's own peak
      peakTaskMem)
  }

  /** Run the marker job and block until this listener saw it — every
    * TaskEnd posted before the call is then reflected in the counters.
    */
  def barrier(spark: SparkSession, l: BenchMetricsListener): Unit = {
    val id = java.util.UUID.randomUUID().toString
    spark.sparkContext.setLocalProperty(MarkerKey, id)
    try spark.range(1).count()
    finally spark.sparkContext.setLocalProperty(MarkerKey, null)
    val deadline = System.nanoTime() + 10L * 1000 * 1000 * 1000
    while (l.lastMarker != id && System.nanoTime() < deadline)
      Thread.sleep(1)
    require(l.lastMarker == id,
      "bench metrics barrier timed out — listener bus backed up?")
  }

  def snapshot(l: BenchMetricsListener): Snapshot = Snapshot(
    l.shuffleRead.get(), l.shuffleWrite.get(),
    l.memSpill.get(), l.diskSpill.get(), l.peakTaskMem.get())
}

/** Normalized physical-plan fingerprint (r12 judge ask #2).
  *
  * The r11 round caught two plan regressions (softWeights' leftover
  * pre-AQE exchange, vacuous q15/q16/q22 canaries) by HAND probes;
  * this automates the class. The fingerprint hashes the
  * pre-adaptive physical plan (`queryExecution.sparkPlan`) — the
  * static plan Catalyst committed to, where the R11Probe3 bug class
  * (an ENSURE_REQUIREMENTS exchange surviving next to a broadcast
  * conversion) is visible — normalized so it is stable across rungs
  * and session configs:
  *
  *  - node identity = nodeName with digits stripped (codegen stage
  *    ids, plan ids);
  *  - exchanges additionally record their partitioning CLASS (hash vs
  *    single vs range vs broadcast) — the shape property the canaries
  *    exist to pin — but not partition COUNTS (config-dependent);
  *  - tree structure via preorder + depth.
  *
  * Runtime-only AQE outcomes (coalesced partition counts, skew
  * splits) are deliberately excluded: they vary with data volume and
  * are not plan regressions. A changed fingerprint means the STATIC
  * plan changed — fail loudly, update the committed baseline only
  * with a PLANS.md touch (tools/planhash_diff.py).
  */
object PlanHash {

  /** The fully-prepared NON-adaptive physical plan: what the static
    * planner commits to, including the EnsureRequirements exchanges
    * (absent from `queryExecution.sparkPlan`, which is pre-prep, and
    * obscured inside the AQE wrapper in `executedPlan`). This is the
    * surface the R11Probe3 bug class lives on: an ENSURE_REQUIREMENTS
    * exchange here is a shuffle stage AQE will MATERIALIZE before it
    * can re-plan the join above it. Re-planned from the analyzed plan
    * in a fresh AQE-off session — planning only, nothing executes.
    */
  def nonAdaptivePlan(df: DataFrame): SparkPlan = {
    val s2 = df.sparkSession.newSession()
    // newSession starts from SparkConf defaults — carry over the
    // parent's RUNTIME conf (broadcast thresholds, shuffle partitions)
    // so the re-plan answers "this session's static plan", then flip
    // only the adaptive switch
    df.sparkSession.conf.getAll.foreach { case (k, v) =>
      try s2.conf.set(k, v) catch { case _: Throwable => /* static conf */ }
    }
    s2.conf.set("spark.sql.adaptive.enabled", "false")
    graft.plans.GraftExtensions.ensureRegistered(s2)
    new org.apache.spark.sql.execution.QueryExecution(
      s2.asInstanceOf[org.apache.spark.sql.classic.SparkSession],
      df.queryExecution.analyzed).executedPlan
  }

  def fingerprint(df: DataFrame): String = {
    val sb = new StringBuilder
    def walk(p: SparkPlan, depth: Int): Unit = {
      sb.append(depth).append(':')
        .append(p.nodeName.replaceAll("[0-9]+", "#"))
      p match {
        case e: ShuffleExchangeLike =>
          sb.append('[').append(e.outputPartitioning.getClass.getSimpleName)
            .append(']')
        case _: BroadcastExchangeLike =>
          sb.append("[broadcast]")
        case _ =>
      }
      sb.append('\n')
      p.children.foreach(walk(_, depth + 1))
    }
    walk(nonAdaptivePlan(df), 0)
    val md = java.security.MessageDigest.getInstance("MD5")
    md.digest(sb.toString.getBytes("UTF-8"))
      .take(8).map("%02x".format(_)).mkString
  }
}
