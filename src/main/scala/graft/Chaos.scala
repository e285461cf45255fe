package graft

import java.util.concurrent.atomic.AtomicLong

import org.apache.spark.{SparkContext, TaskContext, TaskKilled}
import org.apache.spark.scheduler.{SparkListener, SparkListenerTaskEnd, SparkListenerTaskStart}
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Fault injection for the redundant-execution determinism contract
  * (R14Determinism / DeterminismSpec): at 1000-executor scale a task
  * that runs TWICE — retried after a fetch failure, or raced by a
  * speculative copy — is routine, and any operator whose output
  * depends on which attempt "won" silently corrupts results. These
  * injectors force re-execution on demand so the invariance is a
  * tested contract instead of an assumption.
  *
  * Dev/measurement tooling — not part of the library surface.
  */
object Chaos {
  /** Reason string carried by listener-injected kills, so the
    * TaskEnd accounting only counts OUR kills (not job cancellation). */
  val Marker = "graft-chaos: injected task kill (re-execution drill)"

  /** Fails the FIRST attempt of every `everyK`-th input partition,
    * then lets the retry through — the deterministic injection for
    * operator-level specs. Requires a master with task retries
    * (e.g. `local[4,4]`; plain `local[4]` has maxFailures=1, so the
    * first injected failure would abort the job).
    *
    * The round-trip through `df.rdd` deliberately severs codegen so
    * the throw sits in its own narrow stage directly on top of the
    * scan chain: a retry re-executes the whole upstream read, which
    * is exactly the lost-shuffle-block recompute path a real cluster
    * takes. Note `attemptNumber` resets per job, so a multi-job
    * operator pays the injection once per job over this frame —
    * strictly MORE chaos, which is the point.
    */
  def flakyOnce(df: DataFrame, everyK: Int = 1): DataFrame = {
    require(everyK >= 1, s"everyK must be >= 1, got $everyK")
    val spark = df.sparkSession
    val schema = df.schema
    val flaky = df.rdd.mapPartitions { it =>
      val tc = TaskContext.get()
      if (tc != null && tc.attemptNumber() == 0 &&
          tc.partitionId() % everyK == 0)
        throw new RuntimeException(
          s"$Marker [flakyOnce partition=${tc.partitionId()}]")
      it
    }
    spark.createDataFrame(flaky, schema)
  }

  /** Listener that kill-and-reschedules the first attempt of every
    * `everyK`-th task of every stage, via the public
    * `SparkContext.killTaskAttempt` (TaskKilled does not count toward
    * `spark.task.maxFailures`, so this works under any master). The
    * listener bus is asynchronous, so kills on very short tasks can
    * arrive after completion and miss — `landed` counts the kills the
    * scheduler actually confirmed (TaskEnd with our reason), which is
    * the number callers should assert on.
    */
  final class KillListener(sc: SparkContext, everyK: Int)
      extends SparkListener {
    require(everyK >= 1, s"everyK must be >= 1, got $everyK")
    val requested = new AtomicLong(0)
    val landed = new AtomicLong(0)

    override def onTaskStart(e: SparkListenerTaskStart): Unit = {
      val info = e.taskInfo
      if (info.attemptNumber == 0 && (e.stageId + info.index) % everyK == 0) {
        requested.incrementAndGet()
        // best-effort: the task may already be gone; never let an
        // injector exception take down the listener bus
        try sc.killTaskAttempt(info.taskId, interruptThread = false,
          reason = Marker)
        catch { case _: Throwable => () }
      }
    }

    override def onTaskEnd(e: SparkListenerTaskEnd): Unit = e.reason match {
      case k: TaskKilled if k.reason == Marker => landed.incrementAndGet()
      case _ => ()
    }
  }

  /** Install a [[KillListener]] for the duration of `body`, then
    * detach it and report (requested, landed). */
  def withTaskKills[A](spark: SparkSession, everyK: Int)(
      body: => A): (A, Long, Long) = {
    val l = new KillListener(spark.sparkContext, everyK)
    spark.sparkContext.addSparkListener(l)
    try {
      val a = body
      // the listener bus is async and exposes no public drain — poll
      // until the counters stop moving so `landed` reflects every
      // kill the scheduler confirmed for work submitted inside `body`
      var last = -1L
      val deadline = System.nanoTime() + 30L * 1000 * 1000 * 1000
      while (last != l.requested.get() + l.landed.get() &&
             System.nanoTime() < deadline) {
        last = l.requested.get() + l.landed.get()
        Thread.sleep(300)
      }
      (a, l.requested.get(), l.landed.get())
    } finally spark.sparkContext.removeSparkListener(l)
  }
}
